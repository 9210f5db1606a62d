"""Generate a k-times scale-up of a TESTDATA dir for scaling benchmarks.

The driver ships sf0.001/0.01/0.1; the 100 TB posture argument wants one
more decade. This stamps k key-shifted copies of each big table (small
dims region/nation stay canonical) so joins still line up copy-locally:
every foreign key is shifted by the same per-copy offset as its parent
key. Document text gets a per-copy token prefix so the near-dup suite
sees k disjoint shingle universes (within-copy similarity structure is
preserved exactly; no artificial cross-copy duplicate explosion).

Usage: python tools/make_scale_data.py [src_sf_dir] [k] [out_dir]
Defaults: /root/testdata/sf0.1 10 /tmp/nflspark_sf1

Output is parquet per table, readable by sources/tables.table (events.ts
becomes microsecond timestamps on rewrite; the reader accepts both the
driver's nanosecond longs and plain timestamps).
"""

from __future__ import annotations

import os
import sys

import duckdb

SMALL_DIMS = ["region", "nation"]

# table -> (primary key to shift, {fk column -> parent table whose offset it uses})
SHIFTED = {
    "customer": ("c_custkey", {}),
    "supplier": ("s_suppkey", {}),
    "part": ("p_partkey", {}),
    "orders": ("o_orderkey", {"o_custkey": "customer"}),
    "lineitem": (
        "l_orderkey",
        {"l_partkey": "part", "l_suppkey": "supplier"},
    ),
    "events": ("event_id", {"user_id": "events_user", "session_id": "events_session"}),
    "documents": ("doc_id", {}),
    "embeddings": ("vec_id", {}),
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/nflspark_sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def offset_for(table: str, col: str) -> int:
        return (
            con.execute(
                f"SELECT max({col}) + 1 FROM read_parquet('{src}/{table}.parquet')"
            ).fetchone()[0]
        )

    # per-parent offsets; virtual parents for events' independent id spaces
    offsets: dict[str, int] = {}
    for t, (pk, _) in SHIFTED.items():
        if t == "events":
            offsets["events"] = offset_for("events", "event_id")
            offsets["events_user"] = offset_for("events", "user_id")
            cols = [
                r[0]
                for r in con.execute(
                    f"DESCRIBE SELECT * FROM read_parquet('{src}/events.parquet')"
                ).fetchall()
            ]
            if "session_id" in cols:
                offsets["events_session"] = offset_for("events", "session_id")
        else:
            offsets[t] = offset_for(t, pk)

    for t in SMALL_DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    for t, (pk, fks) in SHIFTED.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        parts = []
        for i in range(k):
            sel = []
            for c in cols:
                if c == pk:
                    sel.append(f"{c} + {i * offsets[t]} AS {c}")
                elif c in fks and fks[c] in offsets:
                    sel.append(f"{c} + {i * offsets[fks[c]]} AS {c}")
                elif t == "documents" and c == "text" and i > 0:
                    # disjoint token universe per copy, structure preserved
                    sel.append(
                        f"'c{i}x' || replace(text, ' ', ' c{i}x') AS text"
                    )
                else:
                    sel.append(c)
            parts.append(
                f"SELECT {', '.join(sel)} FROM read_parquet('{src}/{t}.parquet')"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/{t}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 122880)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows ({k}x)")


if __name__ == "__main__":
    main()
