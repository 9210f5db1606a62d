"""Streaming sources (SURVEY.md §2A#23-24 re-expressed).

The reference's stream is a NiFi GenerateFlowFile ticking every 5 s
into a random Jython record simulator. The engine replaces that with
deterministic Structured Streaming sources:

- ``events_file_stream``: the TESTDATA events table re-materialized as
  N time-ordered parquet chunk files and read as a file stream with
  ``maxFilesPerTrigger=1`` — a replayable, deterministic multi-batch
  stream (each chunk = one micro-batch, arriving in event-time order,
  with a deterministic subset of rows duplicated into the next chunk to
  exercise stateful dedup).
- ``play_request_stream``: synthetic play-scoring requests as a file
  stream (SURVEY §7 risk 4: seeded columns instead of wall-clock
  randomness).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nfl_predictions_spark.sources.tables import table

#: Events whose id hits this modulus are re-sent in the following chunk
#: (late duplicate arrivals for the dedup query).
DUP_MODULUS = 97


def _events_ltz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events with an LTZ ts — Spark watermarks require TIMESTAMP, not
    TIMESTAMP_NTZ; session tz is UTC so wall-clock values are unchanged."""
    return table(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))


def stage_event_chunks(
    spark: SparkSession, sf_dir: str, n_chunks: int = 4, with_dups: bool = True
) -> str:
    """Write events as n time-ordered chunk files; returns the input dir.

    Cached per (sf_dir, n_chunks, with_dups) under /tmp — rebuilt only
    if absent. Chunk boundaries come from exact ts quantiles so the
    split is deterministic.
    """
    key = f"{os.path.basename(os.path.normpath(sf_dir))}_c{n_chunks}_d{int(with_dups)}"
    root = os.path.join(tempfile.gettempdir(), "nfl_predictions_spark", "stream", key)
    in_dir = os.path.join(root, "in")
    marker = os.path.join(root, "_done")
    if os.path.exists(marker):
        return in_dir
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(in_dir)

    df = _events_ltz(spark, sf_dir)
    n = df.count()
    # Exact chunk assignment by event-time rank (ties broken by id).
    from pyspark.sql import Window

    w = Window.orderBy("ts", "event_id")
    ranked = df.withColumn(
        "chunk", ((F.row_number().over(w) - 1) * n_chunks / n).cast("int")
    )
    for i in range(n_chunks):
        part = ranked.filter(F.col("chunk") == i).drop("chunk")
        if with_dups and i > 0:
            prev = ranked.filter(
                (F.col("chunk") == i - 1) & (F.col("event_id") % DUP_MODULUS == 0)
            ).drop("chunk")
            part = part.unionByName(prev)
        tmpout = os.path.join(root, "tmpout")
        part.coalesce(1).write.mode("overwrite").parquet(tmpout)
        src = glob.glob(os.path.join(tmpout, "part-*.parquet"))[0]
        dst = os.path.join(in_dir, f"chunk{i:03d}.parquet")
        shutil.move(src, dst)
        # File source processes files in (mtime, path) order; pin an
        # increasing mtime so arrival order == event-time order.
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    with open(marker, "w") as f:
        f.write("ok")
    return in_dir


def events_file_stream(
    spark: SparkSession, sf_dir: str, n_chunks: int = 4, with_dups: bool = True
) -> DataFrame:
    in_dir = stage_event_chunks(spark, sf_dir, n_chunks, with_dups)
    schema = _events_ltz(spark, sf_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )


def checkpoint_dir() -> str:
    return tempfile.mkdtemp(prefix="nflspark_ck_")
