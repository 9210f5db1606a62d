"""Dump per-query ``explain("formatted")`` output to plans/<tag>/<query>_<suffix>.txt.

Usage: python tools/dump_plan_files.py <tag> <suffix> [sf_dir] <query ...>

Writes one file per query: plans/<tag>/<query>_<suffix>.txt — the
optimization-round evidence files (before/after plan shapes for every
query touched in the round).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest

    import __spark_entry__ as entrymod
    from nfl_predictions_spark.session import get_spark

    spark = get_spark("dump_plan_files")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        if name not in queries:
            print(f"SKIP {name}: not in registry", file=sys.stderr)
            continue
        try:
            df = queries[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"wrote {path}")
        except Exception as exc:  # noqa: BLE001 - report and continue
            print(f"FAIL {name}: {exc}", file=sys.stderr)


if __name__ == "__main__":
    main()
