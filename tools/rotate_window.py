"""Propose the next driver conformance window (round-6+ rotations).

The driver verifies the FIRST 50 ``queries()`` entries each round
(CORRECTNESS_r{N}.json). Rotating that window onto never-checked
entries is a per-round chore (VERDICT r04 #2); this tool computes the
candidate list so the rotation is a review, not an archaeology dig.

Usage: python tools/rotate_window.py [n_new]
Prints: the current sentinels, the never-driver-checked entries in
registry order (excluding rows-only ones, which the window test
forbids), and a proposed window of 8 sentinels + n_new (default 42)
first-timers. Apply by editing BOTH __spark_entry__._registry's
``window`` list and tests/test_driver_window.py's EXPECTED_WINDOW in
the same commit, then re-run the window tests.
"""

from __future__ import annotations

import glob
import json
import os
import sys

SENTINELS = [
    "q12_agg_pricing_summary",
    "q16_window_lag_default",
    "q06_join_broadcast",
    "q31_stream_tumbling",
    "q38_dedup_exact",
    "q39_minhash_lsh_pairs",
    "q40_token_stats",
    "q41_ann_topk",
]


def main() -> None:
    n_new = int(sys.argv[1]) if len(sys.argv) > 1 else 42
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    oracle = entrymod.oracle_sql()
    names = list(queries)

    checked: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                checked |= set(json.load(f))
        except (OSError, ValueError):
            pass
    # entries in the CURRENT window will be checked by the in-flight
    # round even if its CORRECTNESS file hasn't landed yet
    checked |= set(names[:50])

    never = [n for n in names if n not in checked]
    eligible = [n for n in never if n in oracle]
    rows_only = [n for n in never if n not in oracle]

    print(f"registry: {len(names)}  driver-checked (incl. current window): "
          f"{len(checked & set(queries.keys()))}")
    print(f"never-checked: {len(never)} ({len(eligible)} oracle-backed, "
          f"{len(rows_only)} rows-only — excluded: {rows_only})")
    proposal = SENTINELS + eligible[:n_new]
    if len(proposal) < 50:
        # backfill with the LONGEST-UNCHECKED previously-green entries —
        # ranked by the LATEST round each entry was hash-green in (not
        # the ledger's first-green round: an entry re-certified last
        # round is fresh even if its first green row dates to r01) —
        # re-certifies the stalest rows on the modern HEAD once the
        # first-timer debt runs out (VERDICT r10 #5)
        try:
            latest: dict[str, int] = {}
            for path in sorted(
                glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
            ):
                rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
                try:
                    with open(path) as f:
                        rows = json.load(f)
                except (OSError, ValueError):
                    continue
                for name, row in rows.items():
                    if isinstance(row, dict) and row.get("hash_match"):
                        latest[name] = max(latest.get(name, 0), rnd)
            # the CURRENT window is checked by the in-flight round:
            # rank it freshest so the next rotation moves on
            inflight = (max(latest.values()) if latest else 0) + 1
            for name in names[:50]:
                latest[name] = max(latest.get(name, 0), inflight)

            def age(n: str) -> int:
                return latest.get(n, 99)

            stale = sorted(
                (n for n in names if n in oracle and n not in proposal),
                key=lambda n: (age(n), names.index(n)),
            )
            proposal += stale[: 50 - len(proposal)]
            print("# backfilled to 50 with stalest-latest-green entries "
                  "(re-certification pass)")
        except Exception as exc:  # ledger unavailable: manual backfill
            print(f"# NOTE: only {len(proposal)} entries — backfill "
                  f"manually (ledger error: {exc})")
    print(f"\nproposed window ({len(proposal)} entries):")
    for n in proposal:
        print(f'    "{n}",')


if __name__ == "__main__":
    main()
