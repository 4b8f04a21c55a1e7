"""Per-query Spark job/task census (r15 measurement harness, guide §1).

For each named catalog query: run once to warm memos/codegen, then run
again under a dedicated job group with the noop sink and report how many
Spark JOBS the query launched, how many stages/tasks those jobs held,
and the wall time. In local mode the driver-coordinated-loop floor is
``jobs x per-job latency``, so job count is the contention-immune proxy
for the iterative-loop overhead that wall times blur.

Usage::

    python scripts/profile_jobs.py q1 q2 ...            # timed + counted
    python scripts/profile_jobs.py --no-warm q1 ...     # skip warm pass
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataflow_flex_pyarrow_to_gds_spark import get_spark
from dataflow_flex_pyarrow_to_gds_spark import queries as catalog


def census(spark, name, fn, sf_dir, warm=True):
    if warm:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    sc = spark.sparkContext
    group = f"prof:{name}"
    sc.setJobGroup(group, name)
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    sc.setJobGroup(None, None)
    tracker = sc.statusTracker()
    jobs = tracker.getJobIdsForGroup(group)
    n_stages = 0
    n_tasks = 0
    for j in jobs:
        info = tracker.getJobInfo(j)
        if info is None:
            continue
        for sid in info.stageIds:
            sinfo = tracker.getStageInfo(sid)
            if sinfo is not None:
                n_stages += 1
                n_tasks += sinfo.numTasks
    return {
        "query": name,
        "wall_s": round(wall, 3),
        "jobs": len(jobs),
        "stages": n_stages,
        "tasks": n_tasks,
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    warm = "--no-warm" not in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile_jobs")
    qs = dict(catalog.queries())
    print(f"{'query':38s} {'wall_s':>8s} {'jobs':>5s} {'stages':>7s} {'tasks':>6s}")
    for name in args:
        r = census(spark, name, qs[name], sf_dir, warm=warm)
        print(
            f"{r['query']:38s} {r['wall_s']:8.3f} {r['jobs']:5d} "
            f"{r['stages']:7d} {r['tasks']:6d}"
        )


if __name__ == "__main__":
    main()
