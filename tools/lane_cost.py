"""Deterministic lane cost audit: jobs / stages / tasks per lane run.

Timing on a shared host is noisy; the scheduler-work triple is not. Runs
each named lane once (warm) against the noop sink and prints the number of
Spark jobs, stages and tasks the invocation submitted, plus wall seconds
(informational only).

    python tools/lane_cost.py [sf_dir] lane [lane ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    lanes = args

    from kinesiscat_spark.registry import all_queries
    from kinesiscat_spark.session import get_spark

    spark = get_spark("kc-lane-cost")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = all_queries()

    tracker = sc.statusTracker()

    def audit(fn):
        jids0 = set(tracker.getJobIdsForGroup(None))
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        new = [j for j in tracker.getJobIdsForGroup(None) if j not in jids0]
        stages, tasks = set(), 0
        for j in new:
            info = tracker.getJobInfo(j)
            if info is None:
                continue
            for s in info.stageIds:
                if s in stages:
                    continue
                stages.add(s)
                si = tracker.getStageInfo(s)
                if si is not None:
                    tasks += si.numTasks
        return len(new), len(stages), tasks, dt

    for lane in lanes:
        fn = qs[lane]
        # warm pass: builds memoized artifacts / fixture caches
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        j, s, t, dt = audit(fn)
        print(
            f"{lane:32s} jobs={j:4d} stages={s:4d} tasks={t:6d} "
            f"wall={dt:7.3f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
