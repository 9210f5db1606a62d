"""Pareto-frontier (skyline) extraction — multi-objective curation.

"Give me the parts where nothing else is both cheaper AND smaller" is
the skyline operator (Börzsönyi et al., ICDE 2001): keep the points not
dominated by any other point. Curation pipelines use the same shape to
pick documents on (quality, length) or models on (loss, cost) — an
engine-added analytics surface (the reference has no multi-column
comparison logic at all).

Dominance here: q dominates p iff q.price <= p.price AND
q.size <= p.size with at least one strict. Equal points are mutually
non-dominating, so exact duplicates both survive (matches the
NOT-EXISTS oracle).

Scale design (100 TB posture): the naive formulation is an all-pairs
NOT EXISTS — quadratic, a non-starter. The distributed plan is the
classic two-phase skyline:

1. LOCAL PRUNE — hash-group rows into buckets and remove everything
   dominated within its bucket. For 2-D this needs no pairwise join:
   with rows ordered by price, "dominated" decomposes into two
   running-min window checks (some earlier-by-price point has smaller
   size, or some earlier-by-size point has smaller price), each a
   value-range window min. Buckets are window *partitions*, so the
   prune is one shuffle, no self-join, and removes ~all of the data:
   the expected skyline of n random points in 2-D is O(log n).
2. GLOBAL PASS — the surviving candidate set (tiny) goes through the
   same two-window check globally. The single-partition global window
   is applied only to this pruned set, never to the base table.

The RANGE CURRENT ROW frame does the strictness bookkeeping: a range
frame includes all ORDER-BY peers, so `runmin(size) < size` is true iff
some point with price <= mine has size strictly < mine — exactly the
"strict in at least one dimension" half; the transposed window covers
the other half.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


def _skyline_filter(df: DataFrame, bucket=None) -> DataFrame:
    """Drop rows dominated within their bucket (or globally if bucket is
    None) using the two running-min range windows — no pairwise join."""
    parts = [bucket] if bucket is not None else []
    w_price = (
        Window.partitionBy(*parts)
        .orderBy("p_retailprice")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_size = (
        Window.partitionBy(*parts)
        .orderBy("p_size")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_ms", F.min("p_size").over(w_price))
        .withColumn("_mp", F.min("p_retailprice").over(w_size))
        .filter(~((F.col("_ms") < F.col("p_size")) | (F.col("_mp") < F.col("p_retailprice"))))
        .drop("_ms", "_mp")
    )


@_q(
    "q161_skyline",
    """
    SELECT p.p_partkey, p.p_retailprice, CAST(p.p_size AS BIGINT) AS p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size)
    )
    ORDER BY p.p_retailprice, p.p_partkey
    """,
)
def q161_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline of `part` on (retailprice, size), both minimized.
    Local window prune per hash bucket, then the same check on the
    pruned candidates globally. The oracle is the literal quadratic
    NOT-EXISTS definition — DuckDB can afford it at test scale; the
    engine never runs it."""
    part = table(spark, sf_dir, "part").select("p_partkey", "p_retailprice", "p_size")
    bucketed = part.withColumn("_b", F.pmod(F.hash("p_partkey"), F.lit(64)))
    candidates = _skyline_filter(bucketed, bucket="_b").drop("_b")
    return (
        _skyline_filter(candidates)
        .select("p_partkey", "p_retailprice", F.col("p_size").cast("long").alias("p_size"))
        .orderBy("p_retailprice", "p_partkey")
    )
