"""Remote execution via Spark Connect (SURVEY §2A#22 parity).

The reference ships a Livy path: it *generates PySpark source by string
interpolation*, POSTs it to a Livy server, and polls statement state
every 0.25 s (reference ``assets/app_nfl.py:74-148,163-208``). The
modern equivalent is Spark Connect: a typed DataFrame API over gRPC —
no string code-gen, no polling, server-side session state.

This module is environment-gated: it builds a remote session when a
Connect endpoint is configured and raises a clear error otherwise (the
test rig has no Connect server).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_remote_spark(url: str | None = None) -> SparkSession:
    """Connect to a remote Spark (e.g. ``sc://host:15002``). Unlike the
    reference's Livy flow there is no per-statement session bootstrap:
    the returned session is long-lived and every engine operator in this
    package works on it unchanged (they only touch the DataFrame API)."""
    url = url or os.environ.get("SPARK_REMOTE")
    if not url:
        raise RuntimeError(
            "no Spark Connect endpoint: pass url or set SPARK_REMOTE=sc://host:port"
        )
    return SparkSession.builder.remote(url).getOrCreate()
