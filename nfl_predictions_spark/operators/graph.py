"""Distributed connected components — near-duplicate cluster assignment.

Pair-level dedup (operators/dedup.py) stops at edges; a training-data
pipeline needs the transitive closure: if A~B and B~C, all three are one
duplicate cluster with one canonical survivor (the reference's analogue
is driver-side: it groups plays into a ranked set before picking the
best, reference ``assets/app_nfl.py:296-316``; here the grouping must be
distributed).

Algorithm: min-label propagation. Every node starts labeled with itself;
each round, labels flow across edges and each node keeps the minimum seen
(one join + one min-aggregate = two key shuffles per round). Rounds ≤
graph diameter — near-dup clusters are shallow (a handful of rounds);
labels are monotonically non-increasing, so an unchanged label sum is a
sound convergence proof (checked with a scalar aggregate, never a
collect of the frame). Lineage is cut with ``localCheckpoint`` each round
or the plan would double every iteration. For adversarial diameters at
100 TB, swap the propagation step for alternating large-star/small-star
(Kiveris et al., "Connected Components in MapReduce"), which converges in
O(log²n) rounds over the same join/agg primitives.

Oracle: DuckDB recursive CTE computing min reachable node id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 25
) -> DataFrame:
    """Label every node reachable through ``edges`` (undirected) with its
    component id = the minimum node id in the component. Returns
    (id, component)."""
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    bi = fwd.union(fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    bi = bi.localCheckpoint(eager=True)
    labels = (
        bi.select(F.col("a").alias("id")).distinct().withColumn("label", F.col("id"))
    )
    prev_sum = None
    for _ in range(max_iter):
        msgs = bi.join(labels, bi["a"] == labels["id"]).select(
            F.col("b").alias("id"), F.col("label")
        )
        labels = (
            labels.unionByName(msgs).groupBy("id").agg(F.min("label").alias("label"))
        ).localCheckpoint(eager=True)
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select("id", F.col("label").alias("component"))


def _cc_oracle() -> str:
    # The edge set must be bit-identical to q39b's pair set, so its
    # shingle/intersection SQL is reused verbatim from operators/dedup.
    from nfl_predictions_spark.operators.dedup import _SHINGLE_SQL

    return _CC_ORACLE_TEMPLATE.replace("__SHINGLES__", _SHINGLE_SQL)


_CC_ORACLE_TEMPLATE = """
WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
sh AS (SELECT doc_id, __SHINGLES__ AS shingles FROM tok WHERE len(ts) >= 3),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
sizes AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
          FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
pairs AS (SELECT d1, d2 FROM inter
          JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
          WHERE i * 1.0 / (s1.sz + s2.sz - i) >= 0.8),
edges AS (SELECT d1 AS a, d2 AS b FROM pairs
          UNION SELECT d2, d1 FROM pairs),
walk(id, root) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT e.b, w.root FROM walk w JOIN edges e ON e.a = w.id
)
SELECT id AS doc_id, min(root) AS component FROM walk GROUP BY id ORDER BY doc_id
"""


@_q("q66_connected_components", _cc_oracle())
def q66_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clusters: exact 3-gram Jaccard >= 0.8 pairs
    (q39b's edge set) closed under transitivity; each doc labeled with
    the min doc_id of its cluster."""
    from nfl_predictions_spark.operators.dedup import q39b_ngram_jaccard_pairs

    pairs = q39b_ngram_jaccard_pairs(spark, sf_dir).select("d1", "d2")
    return (
        connected_components(pairs, "d1", "d2")
        .select(F.col("id").alias("doc_id"), "component")
        .orderBy("doc_id")
    )
