"""Build the entry -> first-driver-green-round ledger (VERDICT r08 #5).

Scans CORRECTNESS_r*.json for each registry entry's FIRST round with a
fully green row (rows+schema+hash for oracle-backed entries; rows-only
entries count their rows_match row) and writes artifacts/GREEN_LEDGER.json.
Entries in the CURRENT driver window (the first 50 ``queries()`` names)
that have no row yet are marked "pending" — they are checked by the
in-flight round. Anything neither recorded nor in-window is "missing"
and fails the companion test.

Usage: python tools/green_ledger.py [--write]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

#: THE single declaration of the permanent rows-only set (VERDICT r10
#: "What's wrong" #1): the 8 registry entries that by design carry no
#: oracle SQL — each with an oracle-exact certifying twin (NOTES
#: "Permanent rows-only residual"). SURVEY §8, SWEEP tables, and
#: GREEN_LEDGER.json must all agree with THIS set; build() asserts the
#: live registry matches it, and tests/test_round11.py asserts the
#: committed artifact does too. q36/q37 additionally have historical
#: rows-only driver rows (r1/r2) — they are still classified
#: "rows_only" here, never "green": a rows-only row certifies
#: execution, not values.
PERMANENT_ROWS_ONLY = {
    "q36_stream_score_route",
    "q37_ml_best_play",
    "q37b_ml_eval",
    "q41d_ann_ivf",
    "q155b_sliding_distinct_hll",
    "q163b_pca_eigh",
    "q165b_kmeans_arrow",
    "q212_ivf_recall",
}


def build(repo: str) -> dict:
    sys.path.insert(0, repo)
    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    oracle = entrymod.oracle_sql()

    # the ledger's classification is pinned to the declaration: any
    # drift between "entries without oracle SQL" and the declared
    # permanent rows-only set is a registry bug, not a ledger state
    live_rows_only = set(names) - set(oracle)
    if live_rows_only != PERMANENT_ROWS_ONLY:
        raise AssertionError(
            "registry rows-only set drifted from the declaration: "
            f"extra={sorted(live_rows_only - PERMANENT_ROWS_ONLY)} "
            f"missing={sorted(PERMANENT_ROWS_ONLY - live_rows_only)}"
        )

    first_green: dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = re.search(r"_r(\d+)\.json$", path).group(1)
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if name in first_green or not isinstance(row, dict):
                continue
            if name in oracle:
                ok = (
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match")
                    and not row.get("err")
                )
            else:
                # rows-only entries: the driver records err='no_oracle'
                # with null matches; green = ran and produced rows
                ok = (row.get("spark_rows") or 0) > 0 and row.get("err") in (
                    None,
                    "no_oracle",
                )
            if ok:
                first_green[name] = f"r{int(rnd)}"

    window = set(names[:50])
    ledger = {}
    for name in names:
        if name in PERMANENT_ROWS_ONLY:
            # declared rows-only: NEVER classified green — a historical
            # rows-only driver row (q36 r1, q37 r2) certifies execution,
            # not values; each entry's value certification lives in its
            # oracle-exact twin (NOTES "Permanent rows-only residual")
            ledger[name] = "rows_only"
        elif name in first_green:
            ledger[name] = first_green[name]
        elif name in window:
            ledger[name] = "pending"  # in the in-flight driver window
        else:
            ledger[name] = "missing"
    return {
        "entries": ledger,
        "counts": {
            "green": sum(
                1 for v in ledger.values() if re.fullmatch(r"r\d+", v)
            ),
            "pending": sum(1 for v in ledger.values() if v == "pending"),
            "rows_only": sum(1 for v in ledger.values() if v == "rows_only"),
            "missing": sum(1 for v in ledger.values() if v == "missing"),
        },
    }


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = build(repo)
    print(json.dumps(out["counts"]))
    missing = [n for n, v in out["entries"].items() if v == "missing"]
    if missing:
        print("missing:", missing)
    if "--write" in sys.argv:
        path = os.path.join(repo, "artifacts", "GREEN_LEDGER.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
