"""URL normalization / domain ops: tricky-case table, blocklist plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ariadne_dbt_spark.operators.urls import (
    filter_blocked_domains,
    normalize_url,
    registered_domain,
    url_host,
)


CASES = [
    # (raw, normalized)
    ("HTTPS://WWW.Ex.COM:443/Path/1?utm_source=x&q=1#f", "https://www.ex.com/Path/1?q=1"),
    ("http://ex.com:80/a", "http://ex.com/a"),
    ("http://ex.com:8080/a", "http://ex.com:8080/a"),  # non-default port kept
    ("https://ex.com/a/?utm_a=1&utm_b=2", "https://ex.com/a"),  # consecutive utm + trailing slash
    ("https://ex.com/a?q=1&utm_mid=z&r=2", "https://ex.com/a?q=1&r=2"),  # middle utm
    ("https://ex.com/a?q=1&utm_last=z", "https://ex.com/a?q=1"),  # last utm
    ("https://user:pw@ex.com/a#frag", "https://user:pw@ex.com/a"),  # userinfo kept in url
    ("https://ex.com/", "https://ex.com"),  # trailing slash stripped, root included
]


def test_normalize_cases(spark):
    df = spark.createDataFrame([(i, raw) for i, (raw, _) in enumerate(CASES)], "i long, url string")
    got = {r.i: r.n for r in df.select("i", normalize_url("url").alias("n")).collect()}
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_host_and_registered_domain(spark):
    rows = [
        (1, "https://a.b.Example.COM:443/x", "a.b.example.com", "example.com"),
        (2, "http://user@localhost/x", "localhost", "localhost"),
        (3, "ftp://two.labels/x", "two.labels", "two.labels"),
        (4, "not a url", "", ""),
    ]
    df = spark.createDataFrame([(i, u) for i, u, *_ in rows], "i long, url string")
    got = {
        r.i: (r.h, r.d)
        for r in df.select(
            "i", url_host("url").alias("h"), registered_domain("url").alias("d")
        ).collect()
    }
    for i, _, h, d in rows:
        assert got[i] == (h, d)


def test_blocklist_is_broadcast_anti_join(spark):
    df = spark.createDataFrame(
        [(i, f"https://site{i % 3}.com/p/{i}") for i in range(30)], "i long, url string"
    )
    out = filter_blocked_domains(df, "url", ["site0.com"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert out.count() == 20
    assert out.where(F.col("url").contains("site0")).count() == 0
