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
    split is deterministic. The build happens in a process-private temp
    dir that is renamed into place as a unit, so a concurrent reader
    either sees the complete staged input or none of it — never a
    half-written chunk set.
    """
    key = f"{os.path.basename(os.path.normpath(sf_dir))}_c{n_chunks}_d{int(with_dups)}"
    base = os.path.join(tempfile.gettempdir(), "nfl_predictions_spark", "stream")
    root = os.path.join(base, key)
    in_dir = os.path.join(root, "in")
    marker = os.path.join(root, "_done")
    if os.path.exists(marker):
        return in_dir
    os.makedirs(base, exist_ok=True)
    build_root = tempfile.mkdtemp(prefix=f".{key}_build_", dir=base)
    build_in = os.path.join(build_root, "in")
    os.makedirs(build_in)

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
        tmpout = os.path.join(build_root, "tmpout")
        part.coalesce(1).write.mode("overwrite").parquet(tmpout)
        src = glob.glob(os.path.join(tmpout, "part-*.parquet"))[0]
        dst = os.path.join(build_in, f"chunk{i:03d}.parquet")
        shutil.move(src, dst)
        # File source processes files in (mtime, path) order; pin an
        # increasing mtime so arrival order == event-time order.
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    shutil.rmtree(os.path.join(build_root, "tmpout"), ignore_errors=True)
    with open(os.path.join(build_root, "_done"), "w") as f:
        f.write("ok")
    try:
        os.rename(build_root, root)
    except OSError:
        if os.path.exists(marker):
            # Lost the race to a concurrent complete build — use theirs.
            shutil.rmtree(build_root, ignore_errors=True)
        else:
            # A stale half-build (crashed process) is squatting on the
            # path; replace it with the complete one.
            shutil.rmtree(root, ignore_errors=True)
            os.rename(build_root, root)
    return in_dir


def events_file_stream(
    spark: SparkSession,
    sf_dir: str,
    n_chunks: int = 4,
    with_dups: bool = True,
    files_per_trigger: int = 1,
) -> DataFrame:
    """``files_per_trigger`` sets the replay epoch size (how many chunk
    files land in one micro-batch). The staged chunks and their arrival
    order are unchanged; a coarser epoch only cuts the replay harness's
    fixed per-micro-batch cost (planning + state-store checkpoint round
    trip). Callers whose declared semantics NEED one-chunk epochs (late
    duplicates arriving in a LATER batch, per-batch watermark advance)
    keep the default 1."""
    in_dir = stage_event_chunks(spark, sf_dir, n_chunks, with_dups)
    schema = _events_ltz(spark, sf_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(files_per_trigger))
        .parquet(in_dir)
    )


def stream_partitions() -> str:
    """Stream-scope shuffle/state partition count: sized to expected
    STATE VOLUME (KB-scale in the replay fixtures), not cluster width.
    A production deployment overrides via SPARK_GRAFT_STREAM_PARTITIONS
    (state size / target per-partition state); the HDFS-backed state
    store writes one delta file per partition per micro-batch, so this
    is a direct file-op multiplier."""
    return os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "8")


def checkpoint_dir() -> str:
    return tempfile.mkdtemp(prefix="nflspark_ck_")


def stage_document_chunks(spark: SparkSession, sf_dir: str, n_chunks: int = 4) -> str:
    """Documents as n doc_id-ordered chunk files (contiguous id ranges,
    increasing mtimes) — the corpus-ingest stream: arrival order ==
    doc_id order, so "first seen wins" dedup equals "lowest doc_id
    wins". Same atomic build-then-rename staging as the event chunks."""
    key = f"docs_{os.path.basename(os.path.normpath(sf_dir))}_c{n_chunks}"
    base = os.path.join(tempfile.gettempdir(), "nfl_predictions_spark", "stream")
    root = os.path.join(base, key)
    in_dir = os.path.join(root, "in")
    marker = os.path.join(root, "_done")
    if os.path.exists(marker):
        return in_dir
    os.makedirs(base, exist_ok=True)
    build_root = tempfile.mkdtemp(prefix=f".{key}_build_", dir=base)
    build_in = os.path.join(build_root, "in")
    os.makedirs(build_in)

    df = table(spark, sf_dir, "documents")
    n = df.count()
    from pyspark.sql import Window

    w = Window.orderBy("doc_id")
    ranked = df.withColumn(
        "chunk", ((F.row_number().over(w) - 1) * n_chunks / n).cast("int")
    )
    for i in range(n_chunks):
        part = ranked.filter(F.col("chunk") == i).drop("chunk")
        tmpout = os.path.join(build_root, "tmpout")
        part.coalesce(1).write.mode("overwrite").parquet(tmpout)
        src = glob.glob(os.path.join(tmpout, "part-*.parquet"))[0]
        dst = os.path.join(build_in, f"chunk{i:03d}.parquet")
        shutil.move(src, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    shutil.rmtree(os.path.join(build_root, "tmpout"), ignore_errors=True)
    with open(os.path.join(build_root, "_done"), "w") as f:
        f.write("ok")
    try:
        os.rename(build_root, root)
    except OSError:
        if os.path.exists(marker):
            shutil.rmtree(build_root, ignore_errors=True)
        else:
            shutil.rmtree(root, ignore_errors=True)
            os.rename(build_root, root)
    return in_dir


def stage_recrawl_chunks(
    spark: SparkSession, sf_dir: str, n_chunks: int = 4
) -> str:
    """The q327/q332 derived re-crawl batch as n batch_id-ordered chunk
    files (contiguous rank ranges, increasing mtimes), each row carrying
    its chunk index — the incremental-dedup ingest stream. Same atomic
    build-then-rename staging as the event/document chunks; the chunk
    split formula matches the q332 oracle's chunkmap CTE exactly."""
    from nfl_predictions_spark.operators.dedup import recrawl_batch

    key = f"recrawl_{os.path.basename(os.path.normpath(sf_dir))}_c{n_chunks}"
    base = os.path.join(tempfile.gettempdir(), "nfl_predictions_spark", "stream")
    root = os.path.join(base, key)
    in_dir = os.path.join(root, "in")
    marker = os.path.join(root, "_done")
    if os.path.exists(marker):
        return in_dir
    os.makedirs(base, exist_ok=True)
    build_root = tempfile.mkdtemp(prefix=f".{key}_build_", dir=base)
    build_in = os.path.join(build_root, "in")
    os.makedirs(build_in)

    df = recrawl_batch(table(spark, sf_dir, "documents"))
    n = df.count()
    from pyspark.sql import Window

    w = Window.orderBy("batch_id")
    ranked = df.withColumn(
        "chunk", ((F.row_number().over(w) - 1) * n_chunks / n).cast("long")
    )
    for i in range(n_chunks):
        part = ranked.filter(F.col("chunk") == i)
        tmpout = os.path.join(build_root, "tmpout")
        part.coalesce(1).write.mode("overwrite").parquet(tmpout)
        src = glob.glob(os.path.join(tmpout, "part-*.parquet"))[0]
        dst = os.path.join(build_in, f"chunk{i:03d}.parquet")
        shutil.move(src, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    shutil.rmtree(os.path.join(build_root, "tmpout"), ignore_errors=True)
    with open(os.path.join(build_root, "_done"), "w") as f:
        f.write("ok")
    try:
        os.rename(build_root, root)
    except OSError:
        if os.path.exists(marker):
            shutil.rmtree(build_root, ignore_errors=True)
        else:
            shutil.rmtree(root, ignore_errors=True)
            os.rename(build_root, root)
    return in_dir


def recrawl_file_stream(
    spark: SparkSession,
    sf_dir: str,
    n_chunks: int = 4,
    files_per_trigger: int = 1,
) -> DataFrame:
    in_dir = stage_recrawl_chunks(spark, sf_dir, n_chunks)
    schema = "batch_id long, text string, chunk long"
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(files_per_trigger))
        .parquet(in_dir)
    )


def documents_file_stream(
    spark: SparkSession, sf_dir: str, n_chunks: int = 4
) -> DataFrame:
    in_dir = stage_document_chunks(spark, sf_dir, n_chunks)
    schema = table(spark, sf_dir, "documents").schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )


def stage_vector_chunks(
    spark: SparkSession, sf_dir: str, n_chunks: int = 4
) -> str:
    """The q337 absorbed vector batch (element-reversed embeddings in
    the disjoint +_ANN_OFF id space) as n vec_id-ordered chunk files
    with increasing mtimes — the vector-DB ingest stream. Same atomic
    build-then-rename staging as the event/document/recrawl chunks."""
    from nfl_predictions_spark.operators.similarity import _ANN_OFF

    key = f"vecingest_{os.path.basename(os.path.normpath(sf_dir))}_c{n_chunks}"
    base = os.path.join(tempfile.gettempdir(), "nfl_predictions_spark", "stream")
    root = os.path.join(base, key)
    in_dir = os.path.join(root, "in")
    marker = os.path.join(root, "_done")
    if os.path.exists(marker):
        return in_dir
    os.makedirs(base, exist_ok=True)
    build_root = tempfile.mkdtemp(prefix=f".{key}_build_", dir=base)
    build_in = os.path.join(build_root, "in")
    os.makedirs(build_in)

    from nfl_predictions_spark.sources.tables import spread

    df = spread(table(spark, sf_dir, "embeddings")).select(
        (F.col("vec_id") + _ANN_OFF).alias("vec_id"),
        F.reverse(F.col("embedding").cast("array<double>")).alias("emb"),
    )
    n = df.count()
    from pyspark.sql import Window

    w = Window.orderBy("vec_id")
    ranked = df.withColumn(
        "chunk", ((F.row_number().over(w) - 1) * n_chunks / n).cast("long")
    )
    for i in range(n_chunks):
        part = ranked.filter(F.col("chunk") == i).drop("chunk")
        tmpout = os.path.join(build_root, "tmpout")
        part.coalesce(1).write.mode("overwrite").parquet(tmpout)
        src = glob.glob(os.path.join(tmpout, "part-*.parquet"))[0]
        dst = os.path.join(build_in, f"chunk{i:03d}.parquet")
        shutil.move(src, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    shutil.rmtree(os.path.join(build_root, "tmpout"), ignore_errors=True)
    with open(os.path.join(build_root, "_done"), "w") as f:
        f.write("ok")
    try:
        os.rename(build_root, root)
    except OSError:
        if os.path.exists(marker):
            shutil.rmtree(build_root, ignore_errors=True)
        else:
            shutil.rmtree(root, ignore_errors=True)
            os.rename(build_root, root)
    return in_dir


def vector_file_stream(
    spark: SparkSession,
    sf_dir: str,
    n_chunks: int = 4,
    files_per_trigger: int = 1,
) -> DataFrame:
    in_dir = stage_vector_chunks(spark, sf_dir, n_chunks)
    schema = "vec_id long, emb array<double>"
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(files_per_trigger))
        .parquet(in_dir)
    )
