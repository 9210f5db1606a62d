"""Deterministic synthetic play-by-play generator (FIXTURES.md §1).

The reference's training table (``nfldata2.csv``) is a fixed 29,412-row
CSV; the engine needs an arbitrarily-scalable, fully deterministic
equivalent for training/tests. Everything derives from ``spark.range``
ids via seeded xxhash64 — no ``rand()``, no wall clock — so the same
(n_games, plays_per_game) always yields byte-identical data at any
partitioning and any cluster size. (SURVEY §7 risk 4: replace the
reference's random Jython simulator with seeded columns.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nfl_predictions_spark.schemas import TEAMS


def _h(seed: int):
    """Uniform non-negative hash of the row id, decorrelated per seed."""
    return F.abs(F.xxhash64(F.col("id"), F.lit(seed)))


def synthetic_plays(
    spark: SparkSession, n_games: int = 32, plays_per_game: int = 120
) -> DataFrame:
    """Generate raw plays (without the derived PlayType_lag/month_day —
    those are the feature build's job, see ml.features)."""
    n = n_games * plays_per_game
    teams = F.array(*[F.lit(t) for t in TEAMS])

    df = spark.range(0, n, 1, numPartitions=max(1, n // 10000) * 8).select(
        F.col("id"),
        (F.col("id") / plays_per_game).cast("long").alias("game_idx"),
        (F.col("id") % plays_per_game).cast("int").alias("play_idx"),
    )

    game_date = F.date_add(
        F.lit("2015-09-10").cast("date"), ((F.col("game_idx") * 3) % 115).cast("int")
    )
    drive = (F.col("play_idx") / 5).cast("int") + 1  # ~5 plays per drive
    qtr = F.least((F.col("play_idx") * 4 / plays_per_game).cast("int") + 1, F.lit(5))
    down = (_h(1) % 4 + 1).cast("int")
    time_secs = (F.lit(3600) - (F.col("play_idx") * 3600 / plays_per_game)).cast("int")
    yrdline100 = (_h(2) % 99 + 1).cast("int")
    ydstogo = (_h(3) % 15 + 1).cast("int")
    ydsnet = (_h(4) % 80 - 10).cast("int")
    play_type = F.when(_h(5) % 100 < 57, F.lit("Pass")).otherwise(F.lit("Run"))
    pos_idx = (_h(6) % 32).cast("int")
    def_idx = ((pos_idx + (_h(7) % 31).cast("int") + 1) % 32).cast("int")

    # Label with real signal so the GBT learns structure: short-yardage
    # runs gain less, long passes more, plus deterministic noise —
    # clipped to the reference's observed [-5, 20] range (SURVEY §1.4).
    noise = (_h(8) % 11).cast("int") - 5
    base = (
        F.when(play_type == "Pass", 6 - (down - 1) + (ydstogo / 4).cast("int"))
        .otherwise(4 - (down - 1) + (yrdline100 / 40).cast("int"))
    )
    yards = F.greatest(F.lit(-5), F.least(F.lit(20), (base + noise).cast("int")))

    return df.select(
        game_date.cast("timestamp").alias("Date"),
        (
            F.date_format(game_date, "yyyyMMdd").cast("long") * 100
            + (F.col("game_idx") % 100)
        ).alias("GameID"),
        drive.alias("Drive"),
        qtr.alias("qtr"),
        down.alias("down"),
        F.concat(
            F.lpad(((F.lit(3600) - time_secs) % 900 / 60).cast("int").cast("string"), 2, "0"),
            F.lit(":"),
            F.lpad(((F.lit(3600) - time_secs) % 60).cast("string"), 2, "0"),
        ).alias("time"),
        ((time_secs % 900 + 59) / 60).cast("int").alias("TimeUnder"),
        time_secs.alias("TimeSecs"),
        (_h(9) % 40).cast("int").alias("PlayTimeDiff"),
        yrdline100.alias("yrdline100"),
        ydstogo.alias("ydstogo"),
        ydsnet.alias("ydsnet"),
        (_h(10) % 100 < 24).cast("int").alias("FirstDown"),
        F.element_at(teams, pos_idx + 1).alias("posteam"),
        F.element_at(teams, def_idx + 1).alias("DefensiveTeam"),
        yards.alias("Yards_Gained"),
        (_h(11) % 100 < 3).cast("int").alias("Touchdown"),
        play_type.alias("PlayType"),
        F.when(play_type == "Run", F.lit("NA"))
        .when(_h(12) % 3 == 0, F.lit("Deep"))
        .otherwise(F.lit("Short"))
        .alias("PassLength"),
        F.when(play_type == "Run", F.lit("NA"))
        .otherwise(F.element_at(F.array(F.lit("left"), F.lit("middle"), F.lit("right")), (_h(13) % 3 + 1).cast("int")))
        .alias("PassLocation"),
        F.when(play_type == "Pass", F.lit("NA"))
        .otherwise(F.element_at(F.array(F.lit("left"), F.lit("middle"), F.lit("right")), (_h(14) % 3 + 1).cast("int")))
        .alias("RunLocation"),
        (_h(15) % 51).cast("int").alias("PosTeamScore"),
        (_h(16) % 52).cast("int").alias("DefTeamScore"),
    )
