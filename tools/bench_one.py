"""Measure one workload in isolation (guide §1): noop-sink timing +
explain("formatted") capture.

    python tools/bench_one.py <name> [--sf SF_DIR] [--runs N] [--plan OUT]

Times fn(spark, sf_dir) executed via the noop sink (computes every
column, discards output) — isolates computation from the bench's
count() action when needed; prints per-run seconds.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan", default=None, help="dir to write <name>.txt explain output")
    ap.add_argument("--action", choices=["noop", "count"], default="count",
                    help="count = bench.py's timed action; noop computes every column")
    args = ap.parse_args()

    from ariadne_dbt_spark.session import get_spark
    from ariadne_dbt_spark.workloads import load_all

    registry = load_all()
    spark = get_spark("bench-one")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # same warmup as bench.py
    registry["point_lookup_and_like"].fn(spark, args.sf).count()

    for name in args.names:
        spec = registry[name]
        if args.plan:
            os.makedirs(args.plan, exist_ok=True)
            df = spec.fn(spark, args.sf)
            with open(os.path.join(args.plan, f"{name}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
        per = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            df = spec.fn(spark, args.sf)
            if args.action == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            per.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: runs={per} warm_min={min(per[1:]) if len(per) > 1 else per[0]}")


if __name__ == "__main__":
    main()
