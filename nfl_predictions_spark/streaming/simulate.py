"""Deterministic play-request simulation (SURVEY §2A#24 re-expressed).

The reference's NiFi ExecuteScript Jython simulator fills request
fields with ``random.*`` and sleeps — non-reproducible by design. The
engine derives every field from a monotonically increasing sequence
value with seeded xxhash64, so the same sequence always produces the
same requests, whether the sequence comes from ``spark.range`` (batch),
the ``rate`` / ``rate-micro-batch`` streaming sources, or a replayed
file stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nfl_predictions_spark.schemas import TEAMS


def _h(c: Column, seed: int) -> Column:
    return F.abs(F.xxhash64(c, F.lit(seed)))


def request_exprs(seq: Column) -> list[Column]:
    """The 10 score-request fields (reference assets/app_nfl.py:288-297)
    as deterministic functions of a sequence number."""
    teams = F.array(*[F.lit(t) for t in TEAMS])
    pos_idx = (_h(seq, 6) % 32).cast("int")
    def_idx = ((pos_idx + (_h(seq, 7) % 31).cast("int") + 1) % 32).cast("int")
    return [
        (_h(seq, 20) % 5 + 1).cast("int").alias("qtr"),
        (_h(seq, 21) % 4 + 1).cast("int").alias("down"),
        (_h(seq, 22) % 4260 - 659).cast("int").alias("TimeSecs"),
        (_h(seq, 23) % 99 + 1).cast("int").alias("yrdline100"),
        (_h(seq, 24) % 42 + 1).cast("int").alias("ydstogo"),
        (_h(seq, 25) % 148 - 48).cast("int").alias("ydsnet"),
        (_h(seq, 26) % 1126 + 103).cast("int").alias("month_day"),
        F.element_at(teams, pos_idx + 1).alias("posteam"),
        F.element_at(teams, def_idx + 1).alias("DefensiveTeam"),
        F.element_at(
            F.array(F.lit("FirstPlay"), F.lit("Run"), F.lit("Pass")),
            (_h(seq, 27) % 3 + 1).cast("int"),
        ).alias("PlayType_lag"),
    ]


def simulated_requests(ticks: DataFrame, seq_col: str = "value") -> DataFrame:
    """Map a tick stream (rate source's ``value``, or any increasing
    sequence) to scoring requests. With ``invalid_every`` rows carrying
    an out-of-vocabulary PlayType_lag to exercise the dead-letter route,
    see ``with_invalid``."""
    return ticks.select(F.col(seq_col).alias("seq"), *request_exprs(F.col(seq_col)))


def with_invalid(requests: DataFrame, every: int = 37) -> DataFrame:
    """Inject an unseen label every N rows (handleInvalid=error is the
    reference contract — these must route to the dead letter, not crash
    the stream)."""
    return requests.withColumn(
        "PlayType_lag",
        F.when(F.col("seq") % every == 0, F.lit("Bogus")).otherwise(
            F.col("PlayType_lag")
        ),
    )
