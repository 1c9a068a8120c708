"""Benchmark harness: runs the headline workloads at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <sf>}

Per-query time = build the DataFrame + execute to completion (count()),
cold plans, shared SparkSession (session startup excluded — the
reference's latency targets also exclude process startup; BASELINE.md).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: headline set: one per operator family (SURVEY §2 + scale extensions)
HEADLINE = [
    "pricing_summary",
    "topk_customers_by_revenue",
    "revenue_by_region",
    "customer_lifetime_value",
    "budget_fill_orders",
    "bm25_search",
    "term_frequency_topk",
    "bfs_downstream",
    "impact_by_kind",
    "daily_event_stats",
    "user_sessions",
    "exact_dedup_groups",
    "ngram_jaccard_near_dups",
    "minhash_lsh_candidates",
    "simhash_fingerprints",
    "ann_brute_force_topk",
    "doc_quality_scores",
    "lang_detect_confusion",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from ariadne_dbt_spark.session import get_spark
    from ariadne_dbt_spark.workloads import load_all

    registry = load_all()
    spark = get_spark("ariadne-bench")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    # warm the JVM + parquet footers once with the cheapest query so the
    # first measured number isn't dominated by one-time session costs
    registry["point_lookup_and_like"].fn(spark, sf_dir).count()

    times: dict[str, float] = {}
    for name in HEADLINE:
        spec = registry[name]
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.count()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
