"""Play-by-play feature engineering (SURVEY.md §2A#10, #27, #28).

The reference ships its fact table with the derived columns already
materialized (``nfldata2.csv`` cols 23-24) and only documents the
derivation implicitly; SURVEY §1.4 verified the semantics against all
29,412 rows. This module is the reconstructed upstream feature build,
as window/scalar expressions — one shuffle on (GameID, Drive), no
Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nfl_predictions_spark.functions.scalars import month_day


def build_features(plays: DataFrame, order_by: list | None = None) -> DataFrame:
    """Add the two derived columns the models consume.

    - ``PlayType_lag``: previous play's type within (GameID, Drive) in
      play order (TimeSecs descending — the clock counts down), with the
      first play of each drive defaulted to 'FirstPlay'. Verified
      reference semantics (SURVEY §1.4: 5,698 FirstPlay rows == one per
      drive, 0 mismatches on the other 23,714).
    - ``month_day``: int(concat(month, zero-padded day)) of Date
      (reference ``assets/app_nfl.py:263``).

    Scale: the window shuffles once on (GameID, Drive) — a high-
    cardinality compound key, so partitions stay balanced at any scale;
    no global sort.

    ``order_by`` is the play-sequence order within a drive; default is
    clock order (TimeSecs descending). The reference data has ties in
    TimeSecs (65 drive/clock groups) whose true order is the file row
    order — callers with an explicit sequence column pass it here.
    """
    w = Window.partitionBy("GameID", "Drive").orderBy(
        *(order_by if order_by is not None else [F.desc("TimeSecs"), F.asc("qtr")])
    )
    out = plays
    if "PlayType_lag" not in plays.columns:
        out = out.withColumn("PlayType_lag", F.lag("PlayType", 1, "FirstPlay").over(w))
    if "month_day" not in plays.columns:
        out = out.withColumn("month_day", month_day("Date"))
    return out


def split_by_playtype(plays: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Two training subsets: Pass rows -> pass model, Run rows -> run
    model (reference §2A#28, proven by the per-subset frequency-ordered
    StringIndexer labels in the saved model dirs)."""
    return (
        plays.filter(F.col("PlayType") == "Pass"),
        plays.filter(F.col("PlayType") == "Run"),
    )
