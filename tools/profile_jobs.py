"""Count Spark jobs/stages/tasks per workload (guide §1: find where the
time structurally goes — fixed per-job/stage overheads dominate at bench
scale, and job count is immune to host-load noise).

    python tools/profile_jobs.py <name> [name ...] [--sf SF_DIR] [--runs N]

Prints per-run wall seconds plus jobs/stages/tasks counted via the
status tracker (job-group scoped).
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
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from ariadne_dbt_spark.session import get_spark
    from ariadne_dbt_spark.workloads import load_all

    registry = load_all()
    spark = get_spark("profile-jobs")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    registry["point_lookup_and_like"].fn(spark, args.sf).count()

    sc = spark.sparkContext
    st = sc.statusTracker()

    for name in args.names:
        spec = registry[name]
        for i in range(args.runs):
            group = f"prof-{name}-{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = spec.fn(spark, args.sf)
            t_build = time.perf_counter() - t0
            df.count()
            wall = time.perf_counter() - t0
            jids = st.getJobIdsForGroup(group) or []
            n_stages = 0
            n_tasks = 0
            for j in jids:
                ji = st.getJobInfo(j)
                if ji is None:
                    continue
                for s in ji.stageIds:
                    si = st.getStageInfo(s)
                    if si is not None:
                        n_stages += 1
                        n_tasks += si.numTasks
            print(
                f"{name} run{i}: wall={wall:.3f}s build={t_build:.3f}s "
                f"jobs={len(jids)} stages={n_stages} tasks={n_tasks}",
                flush=True,
            )
        sc.setJobGroup(None, None)


if __name__ == "__main__":
    main()
