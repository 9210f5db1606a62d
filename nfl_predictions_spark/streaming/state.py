"""Exactly-once manifest for foreachBatch sinks (the transaction-log
fragment a lake format would provide).

State lives under one root directory: immutable per-batch data dirs
plus a single MANIFEST json naming (a) the applied batch ids and (b)
the live data dirs with their row counts. The manifest is replaced via
``os.replace`` — the atomic commit point. A retried foreachBatch
attempt (same batch_id) finds its id recorded and no-ops; a crash
before the replace leaves the previous consistent manifest, and the
retry overwrites the orphan data dir. Readers resolve the manifest
then read exactly the dirs it names — never a half-committed batch.

q96_streaming_matview uses the same idea inline with a full-state
rewrite per batch (its state is five rows); this module is the
APPEND-ONLY variant for per-row state, where each batch adds O(new
data) files and never rewrites the corpus.
"""

from __future__ import annotations

import json
import os


def read_manifest(root: str) -> dict:
    path = os.path.join(root, "MANIFEST")
    if not os.path.exists(path):
        return {"applied": [], "dirs": []}
    with open(path) as f:
        return json.load(f)


def commit_batch(root: str, meta: dict, batch_id: int, data_dir: str, rows: int) -> None:
    """Atomically record ``batch_id`` as applied with its data dir
    (relative to root). ``rows`` lets readers skip empty dirs (a parquet
    dir with no part files cannot be schema-inferred)."""
    new = {
        "applied": meta["applied"] + [batch_id],
        "dirs": meta["dirs"] + [{"dir": data_dir, "rows": rows}],
    }
    tmp = os.path.join(root, f".MANIFEST.tmp{batch_id}")
    with open(tmp, "w") as f:
        json.dump(new, f)
    os.replace(tmp, os.path.join(root, "MANIFEST"))


def data_dirs(root: str, meta: dict) -> list[str]:
    """Absolute paths of the non-empty committed data dirs."""
    return [os.path.join(root, d["dir"]) for d in meta["dirs"] if d["rows"] > 0]
