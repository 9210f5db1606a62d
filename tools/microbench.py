"""Bench-methodology timing for a few queries (construct + noop sink,
median of N runs) — for before/after comparisons during optimization.

Usage: python tools/microbench.py [sf_dir] <query ...>
Env: SPARK_GRAFT_BENCH_RUNS (default 3)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    rest = sys.argv[1:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

    import __spark_entry__ as entrymod
    from nfl_predictions_spark.session import get_spark

    spark = get_spark("microbench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    spark.range(1000).count()

    for name in names:
        runs, constructs = [], []
        for _ in range(n_runs):
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            t_built = time.time()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
            constructs.append(t_built - t0)
        med = statistics.median(runs)
        medc = statistics.median(constructs)
        print(
            f"{name}: wall_med={med:.3f}s construct_med={medc:.3f}s "
            f"exec_med={statistics.median(r - c for r, c in zip(runs, constructs)):.3f}s "
            f"runs={[round(r, 3) for r in runs]}"
        )


if __name__ == "__main__":
    main()
