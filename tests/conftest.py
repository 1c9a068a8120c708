"""Shared fixtures: one local SparkSession per test session, the fixture
manifest index, and small synthetic frames.

Fixture project summary (tests/fixtures/manifest.json, authored in
make_manifest.py): 5 models (3 staging / 2 marts), 3 sources, 5 tests,
1 macro, 1 exposure; DAG source.raw.*→stg_*→fct_orders→dim_customers
→orders_dashboard.
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURES = os.path.join(REPO, "tests", "fixtures")
MANIFEST = os.path.join(FIXTURES, "manifest.json")
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from ariadne_dbt_spark.session import get_spark

    spark = get_spark("ariadne-tests")
    yield spark


@pytest.fixture(scope="session")
def index(spark):
    from ariadne_dbt_spark.ingest.indexer import AriadneIndex

    return AriadneIndex.build(spark, MANIFEST)
