"""MLlib-native variants of the text/near-dup stack (SURVEY §2B Q39-Q40
named ``pyspark.ml.feature`` as the Spark primitives; the engine ships
both the expression-level implementations in operators/text|dedup and
these MLlib-pipeline forms, proving the same answers through the
library path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nfl_predictions_spark.operators.dedup import _JACCARD_ORACLE, shingle_rows
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


@_q("q39d_mllib_minhash", _JACCARD_ORACLE)
def q39d_mllib_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHashLSH.approxSimilarityJoin over binary shingle vectors —
    the MLlib path to the same near-dup pairs as q39/q39b (shared
    oracle). CountVectorizer maps each distinct shingle to one vector
    index, so the join's exact key-distance IS shingle-set Jaccard;
    8 OR-amplified hash tables give candidate recall ~1-(1-j)^8
    (~1-3e-6 at j=0.8). distCol is exact, so no false positives."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    ex = shingle_rows(table(spark, sf_dir, "documents"))
    docs = ex.groupBy("doc_id").agg(F.collect_list("s").alias("sh"))
    cv = CountVectorizer(inputCol="sh", outputCol="features", binary=True)
    model = cv.fit(docs)
    feats = model.transform(docs).select("doc_id", "features")
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=12345)
    mh_model = mh.fit(feats)
    pairs = mh_model.approxSimilarityJoin(feats, feats, threshold=0.2, distCol="dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("d1"),
            F.col("datasetB.doc_id").alias("d2"),
            F.round(1 - F.col("dist"), 6).alias("jac"),
        )
        .orderBy("d1", "d2")
    )


def q40f_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer -> StopWordsRemover -> CountVectorizer -> IDF, then the
    top TF-IDF term per source (rows-only: CountVectorizer's vocabulary
    order for tied frequencies is not contractual, so the SQL oracle
    would over-pin; determinism within a session is tested instead).

    The per-doc top-3 extraction is fully relational (VERDICT r04 #5 —
    this was the engine's last row-at-a-time Python UDF outside q29's
    declared parity surface): instead of walking each doc's SparseVector
    in Python, the fitted models' vocabulary + idf arrays (both
    vocab-sized driver state, the same bound as MLlib's own broadcast of
    cv_model) become a broadcast (term, idx, idf) dimension; tf counts
    come from the exploded token stream, score = tf * idf reproduces
    IDFModel.transform exactly (same doubles, same (-score, idx)
    tie-break), and the top-3 window runs JVM-side. Scales: no dense
    vocab-length arrays ever materialize per row."""
    from pyspark.ml.feature import CountVectorizer, IDF, StopWordsRemover, Tokenizer
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    tok = Tokenizer(inputCol="text", outputCol="raw_tokens")
    sw = StopWordsRemover(inputCol="raw_tokens", outputCol="tokens")
    staged = sw.transform(tok.transform(docs))
    cv = CountVectorizer(inputCol="tokens", outputCol="tf", minDF=2.0)
    cv_model = cv.fit(staged)
    tf = cv_model.transform(staged)
    idf_model = IDF(inputCol="tf", outputCol="tfidf").fit(tf)
    idf_vals = idf_model.idf.toArray().tolist()
    vocab_df = spark.createDataFrame(
        [(i, t, idf_vals[i]) for i, t in enumerate(cv_model.vocabulary)],
        "idx: long, term: string, idf: double",
    )

    counts = (
        staged.select("doc_id", "source", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "source", "term")
        .agg(F.count(F.lit(1)).alias("tfc"))
        .join(F.broadcast(vocab_df), "term")
        .select(
            "doc_id",
            "source",
            "term",
            "idx",
            (F.col("tfc").cast("double") * F.col("idf")).alias("raw_score"),
        )
    )
    # rank on the RAW double (exactly what the SparseVector walk did);
    # round only the emitted value
    doc_w = Window.partitionBy("doc_id").orderBy(F.desc("raw_score"), F.asc("idx"))
    per_doc = (
        counts.withColumn("drn", F.row_number().over(doc_w))
        .filter(F.col("drn") <= 3)
        .withColumn("score", F.round("raw_score", 4))
    )
    return (
        per_doc.groupBy("source", "term")
        .agg(F.count("*").alias("doc_hits"), F.round(F.sum("score"), 4).alias("score_sum"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("source").orderBy(F.desc("score_sum"), F.asc("term"))
            ),
        )
        .filter(F.col("rn") <= 3)
        .select("source", "term", "doc_hits", "score_sum", F.col("rn").cast("long").alias("rn"))
        .orderBy("source", "rn")
    )


QUERIES["q40f_tfidf_top_terms"] = q40f_tfidf_top_terms


# ---------------------------------------------------------------------------
# q184 — feature-hashing vectorizer (the hashing trick, engine-exact)
# ---------------------------------------------------------------------------

_FH_DIM = 32


def _feature_hash_oracle() -> str:
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), h AS (
      SELECT doc_id,
             (ascii(substr(md5(w), 1, 1)) * 256
              + ascii(substr(md5(w), 2, 1))) % {_FH_DIM} AS dim
      FROM tok
    ), v AS (
      SELECT doc_id, dim, CAST(count(*) AS BIGINT) AS c
      FROM h GROUP BY doc_id, dim
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS nnz,
           CAST(sum(c) AS BIGINT) AS total,
           CAST(sum(c * c) AS BIGINT) AS sq_norm,
           CAST(max(c) AS BIGINT) AS max_dim_count
    FROM v GROUP BY doc_id ORDER BY doc_id
    """


def q184_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick vectorizer: every token is bucketed into a fixed
    {_FH_DIM}-dim count vector by a content hash — the stateless,
    vocabulary-free featurization (HashingTF) that needs NO fitted
    dictionary, so it runs identically on every executor and every day
    of a streaming corpus with zero coordination.

    The report is per-doc vector evidence in exact integers (nnz, mass,
    squared norm, peak bucket) — hash-exact across engines because the
    md5-prefix bucket function is the engine's standard cross-engine
    hash (q108's split trick). Scale: one explode + two keyed
    aggregates, no vocabulary broadcast, no fitted state; collisions
    are the accepted trade and surface directly in max_dim_count.
    """
    tok = table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    dim = (
        (
            F.ascii(F.substring(F.md5("w"), 1, 1)) * 256
            + F.ascii(F.substring(F.md5("w"), 2, 1))
        )
        % _FH_DIM
    ).alias("dim")
    v = tok.select("doc_id", dim).groupBy("doc_id", "dim").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        v.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("nnz"),
            F.sum("c").alias("total"),
            F.sum(F.col("c") * F.col("c")).alias("sq_norm"),
            F.max("c").alias("max_dim_count"),
        )
        .orderBy("doc_id")
    )


QUERIES["q184_feature_hashing"] = q184_feature_hashing
ORACLE["q184_feature_hashing"] = _feature_hash_oracle()
