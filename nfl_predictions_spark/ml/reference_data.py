"""Loader for the reference's play-by-play dataset (data, not code).

``nfldata2.csv`` is the reference's 29,412-row 2015-season fact table
(headerless, 25 positional columns — layout documented at reference
``assets/app_nfl.py:347-375``). The engine reads it with an explicit
StructType and an explicit timestamp format — no inference pass, no
driver-side row list (the reference loads the whole file into Python
memory at ``assets/app_nfl.py:65``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from nfl_predictions_spark.schemas import PLAYS_SCHEMA

REFERENCE_CSV = "/root/reference/assets/static/assets/nfldata2.csv"


def load_plays_csv(spark: SparkSession, path: str = REFERENCE_CSV) -> DataFrame:
    return spark.read.csv(
        path,
        schema=PLAYS_SCHEMA,
        header=False,
        timestampFormat="yyyy-MM-dd'T'HH:mm:ss.SSS'Z'",
    )


def reference_csv_available() -> bool:
    return os.path.exists(REFERENCE_CSV)
