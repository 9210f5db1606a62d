"""Scan/Exchange census over the headline queries.

For every headline query (or a named subset), counts in the formatted
physical plan: parquet scans per source table, Exchange nodes,
ReusedExchange nodes, Window nodes, and Python-eval nodes. Queries that
scan a data-scale table many times usually contain a duplicated subtree
the optimizer cannot reuse (guide sect. 3.3) — the q39/q228 pattern.

Usage: python tools/scan_census.py [sf_dir] [query ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    rest = sys.argv[1:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest

    import bench
    import __spark_entry__ as entrymod
    from nfl_predictions_spark.session import get_spark

    spark = get_spark("scan-census")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    if not names:
        names = [n for n in bench.HEADLINE if n in queries]

    print(
        f"{'query':<34}{'scans':>6}{'exch':>6}{'reuse':>6}{'win':>5}"
        f"{'py':>4}  per-table"
    )
    for name in names:
        fn = queries.get(name)
        if fn is None:
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:<34} ERROR {exc}")
            continue
        scans = re.findall(r"Scan parquet[^\n]*", plan)
        tables: dict[str, int] = {}
        for s in scans:
            m = re.search(r"(?:testdata/sf[0-9.]+/|/)(\w+)\s*\]?", s)
            key = m.group(1) if m else "?"
            tables[key] = tables.get(key, 0) + 1
        n_exch = len(re.findall(r"\bExchange\b", plan))
        n_reuse = len(re.findall(r"ReusedExchange", plan))
        n_win = len(re.findall(r"\bWindow\b", plan))
        n_py = len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInArrow|FlatMapGroupsInPandas|MapInPandas", plan)
        )
        per = ",".join(f"{k}:{v}" for k, v in sorted(tables.items()))
        print(
            f"{name:<34}{len(scans):>6}{n_exch:>6}{n_reuse:>6}{n_win:>5}"
            f"{n_py:>4}  {per}"
        )


if __name__ == "__main__":
    main()
