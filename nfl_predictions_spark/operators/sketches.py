"""Mergeable-sketch aggregation (Apache DataSketches HLL, built into
Spark since 3.5).

The 100 TB pattern this encodes: you cannot afford to re-scan raw data
for every distinct-count question, so you pre-aggregate each partition
(here: each event day) into a FIXED-SIZE sketch once, store the sketch
bytes in a rollup table, and answer any later question — any date
range, any union of segments — by merging sketches instead of touching
raw rows. Merge is associative and lossless for HLL, which is exactly
what makes it safe under Spark's partial aggregation: map-side combine
produces partial sketches, the reduce side unions them, and a
1000-executor cluster never moves more than (groups x sketch-size)
bytes over the shuffle.

q14 covers the built-in approx_count_distinct (HLL++ estimate only, no
reusable sketch object); this module covers the sketch-as-data flavor.
Estimates are engine-specific bytes, so oracle parity follows the q45b
certification pattern: the query emits the exact value plus a
within-tolerance boolean, and the oracle recomputes the exact value and
pins the boolean TRUE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nfl_predictions_spark.sources.tables import table

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


_LG_K = 14  # 2^14 registers -> ~0.8% relative standard error


@_q(
    "q80_hll_sketch_rollup",
    "SELECT event_type, count(DISTINCT user_id) AS exact_users, "
    "TRUE AS est_within_5pct FROM events "
    "GROUP BY event_type ORDER BY event_type",
)
def q80_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level sketch rollup: build one HLL sketch of distinct users
    per (event_type, day) — the daily rollup a pipeline would persist —
    then answer the per-type question by ``hll_union_agg`` over the
    daily sketches, never re-touching raw events. Certified against the
    exact distinct count (within 5%; lg_k=14 gives ~0.8% RSE, so 5% is
    a deterministic-pass margin at these cardinalities).
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(_LG_K)).alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return (
        exact.join(merged, "event_type")
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("est") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("est_within_5pct"),
        )
        .orderBy("event_type")
    )
