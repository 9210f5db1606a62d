"""Per-query job/stage census — finds fixed-latency-bound queries.

For each query: runs construct + noop sink once (after a warm run of the
whole session), and records how many Spark jobs, stages and tasks ran in
the construct phase vs the sink phase, plus wall times. Queries whose
time is dominated by many small jobs are driver-latency-bound (guide
sect. 7.3), not compute-bound.

Usage: python tools/jobscan.py [sf_dir] <query ...>
       python tools/jobscan.py [sf_dir] --top N   (N slowest from bench detail)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    rest = sys.argv[1:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest
    if names and names[0] == "--top":
        n = int(names[1])
        detail = json.load(
            open(
                os.path.join(
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "artifacts",
                    "bench_detail_sf0.1_c32.json",
                )
            )
        )
        names = [
            k
            for k, _ in sorted(
                detail["queries"].items(), key=lambda kv: -kv[1]
            )[:n]
        ]

    import __spark_entry__ as entrymod
    from nfl_predictions_spark.session import get_spark

    spark = get_spark("jobscan")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    spark.range(1000).count()
    tracker = spark.sparkContext.statusTracker()

    def job_ids() -> set[int]:
        return set(tracker.getJobIdsForGroup(None) or [])

    print(
        f"{'query':<34}{'constr':>8}{'exec':>7}{'cjobs':>6}{'ejobs':>6}"
    )
    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"{name}: NOT FOUND")
            continue
        # warm run (stages fixture caches, JIT)
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        j0 = job_ids()
        t0 = time.time()
        df = fn(spark, sf_dir)
        t1 = time.time()
        j1 = job_ids()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        j2 = job_ids()
        print(
            f"{name:<34}{t1 - t0:>8.3f}{t2 - t1:>7.3f}"
            f"{len(j1 - j0):>6}{len(j2 - j1):>6}"
        )


if __name__ == "__main__":
    main()
