"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` on a scale-factor
dir, runs the matching ``oracle_sql()`` through DuckDB on the same
parquet, and compares row count, sorted column names, and an
order-insensitive canonicalized value multiset. Usage:

    python tools/oracle_check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime
import math
import sys
import time

import duckdb


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def compare(name, spark_rows, spark_cols, duck_rows, duck_cols):
    problems = []
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"cols: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
    if len(spark_rows) != len(duck_rows):
        problems.append(f"rowcount: spark={len(spark_rows)} duck={len(duck_rows)}")
    if not problems:
        s_idx = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
        d_idx = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
        s_set = sorted(tuple(canon(r[i]) for i in s_idx) for r in spark_rows)
        d_set = sorted(tuple(canon(r[i]) for i in d_idx) for r in duck_rows)
        if s_set != d_set:
            diffs = [
                (a, b) for a, b in zip(s_set, d_set) if a != b
            ][:3]
            problems.append(f"values differ; first diffs (spark vs duck): {diffs}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from nfl_predictions_spark.session import get_spark

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        el = time.time() - t0
        if name not in oracles:
            status = "ok" if len(spark_rows) >= 0 else "??"
            print(f"WEAK {name}: rows-only, {len(spark_rows)} rows ({el:.1f}s)")
            n_weak += 1
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        if problems:
            print(f"FAIL {name} ({el:.1f}s): " + " | ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(spark_rows)} rows ({el:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
