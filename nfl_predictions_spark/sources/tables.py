"""Table sources over the driver TESTDATA parquet (TESTDATA.md).

Parquet is the canonical columnar format (the reference's only columnar
data is its saved-model parquet; its fact table is a headerless CSV it
loads fully into driver memory — reference ``assets/app_nfl.py:42-65``).
Here every table is a lazily-scanned parquet DataFrame so Catalyst can
push filters into row-group pruning and prune columns at the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one TESTDATA table. Plain ``spark.read.parquet`` — no schema
    argument so the parquet footer schema is authoritative, no eager
    action, so downstream filters/projections push into the scan.

    Nanosecond-timestamp columns (Spark has no ns type) are read as long
    (``spark.sql.legacy.parquet.nanosAsLong``) and converted here to
    microsecond TIMESTAMP_NTZ by truncation — the same downcast DuckDB
    and Arrow apply, so oracles agree.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    return df


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register the TESTDATA tables as temp views for ``spark.sql`` use."""
    for name in names or TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def spread(df: DataFrame, min_factor: int = 2) -> DataFrame:
    """Round-robin repartition a DataFrame to cluster parallelism — but
    ONLY when its current partitioning is deficient (fewer than
    cores/``min_factor`` partitions).

    Why: a parquet file is splittable only at row-group boundaries, so a
    single-row-group file scans as ONE task no matter what
    ``maxPartitionBytes`` says — and everything pipelined onto that scan
    (filters, partial aggregates, CPU-heavy expressions) serializes. At
    real scale inputs have many files/row groups and this helper is a
    no-op (the guard keeps the plan shuffle-free exactly when scan
    parallelism already matches the cluster); on few-row-group inputs it
    trades one small shuffle for full-width execution."""
    from nfl_predictions_spark.session import default_parallelism

    target = default_parallelism()
    if df.rdd.getNumPartitions() * min_factor >= target:
        return df
    return df.repartition(target)
