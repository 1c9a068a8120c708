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


def settle_persistent(spark, bound, timeout=25.0):
    """Poll getPersistentRDDs until it drops to ``bound``, actively
    nudging collection: localCheckpoint'd RDDs are NOT released by
    DataFrame.unpersist() — they go away when the Python proxy is
    collected (py4j detach), the JVM object becomes unreachable, and
    the ContextCleaner's weak-ref queue drains. A REAL leak (a live
    reference) never drops, so the bounded GC-nudged poll separates
    lag from leak deterministically."""
    import gc
    import time

    jsc = spark.sparkContext._jsc.sc()
    deadline = time.monotonic() + timeout
    while True:
        n = jsc.getPersistentRDDs().size()
        if n <= bound or time.monotonic() > deadline:
            return n
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (round 11): the driver's verify budget could no
    longer complete the full run (640+ tests, ~53 min quiet), so tests
    measured above 5 s are marked ``slow`` from the committed manifest
    (tests/slow_tests.txt — regeneration recipe inside) and the default
    ``addopts = -m "not slow"`` (pytest.ini) keeps the fast tier under
    ~15 min while every module retains at least its fastest test as a
    sentinel. The full tier remains one flag away."""
    import os

    manifest = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
    if not os.path.exists(manifest):
        return
    with open(manifest) as fh:
        slow_ids = {
            ln.strip() for ln in fh if ln.strip() and not ln.startswith("#")
        }
    if not slow_ids:
        return
    marker = pytest.mark.slow
    for item in items:
        # nodeid is rootdir-relative (tests/...::name); parametrized ids
        # match on the base nodeid so one manifest line covers all params
        nid = item.nodeid
        base = nid.split("[", 1)[0]
        if nid in slow_ids or base in slow_ids:
            item.add_marker(marker)
