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


#: StopWordsRemover.loadDefaultStopWords('english') — inlined so the
#: q40f DuckDB oracle (a static SQL string) can carry the same filter;
#: parity with the MLlib loader is pinned in tests/test_northstar.py.
_EN_STOPWORDS = (
    'i', 'me', 'my', 'myself', 'we', 'our', 'ours', 'ourselves', 'you',
    'your', 'yours', 'yourself', 'yourselves', 'he', 'him', 'his',
    'himself', 'she', 'her', 'hers', 'herself', 'it', 'its', 'itself',
    'they', 'them', 'their', 'theirs', 'themselves', 'what', 'which',
    'who', 'whom', 'this', 'that', 'these', 'those', 'am', 'is', 'are',
    'was', 'were', 'be', 'been', 'being', 'have', 'has', 'had', 'having',
    'do', 'does', 'did', 'doing', 'a', 'an', 'the', 'and', 'but', 'if',
    'or', 'because', 'as', 'until', 'while', 'of', 'at', 'by', 'for',
    'with', 'about', 'against', 'between', 'into', 'through', 'during',
    'before', 'after', 'above', 'below', 'to', 'from', 'up', 'down', 'in',
    'out', 'on', 'off', 'over', 'under', 'again', 'further', 'then',
    'once', 'here', 'there', 'when', 'where', 'why', 'how', 'all', 'any',
    'both', 'each', 'few', 'more', 'most', 'other', 'some', 'such', 'no',
    'nor', 'not', 'only', 'own', 'same', 'so', 'than', 'too', 'very', 's',
    't', 'can', 'will', 'just', 'don', 'should', 'now', "i'll", "you'll",
    "he'll", "she'll", "we'll", "they'll", "i'd", "you'd", "he'd",
    "she'd", "we'd", "they'd", "i'm", "you're", "he's", "she's", "it's",
    "we're", "they're", "i've", "we've", "you've", "they've", "isn't",
    "aren't", "wasn't", "weren't", "haven't", "hasn't", "hadn't", "don't",
    "doesn't", "didn't", "won't", "wouldn't", "shan't", "shouldn't",
    "mustn't", "can't", "couldn't", 'cannot', 'could', "here's", "how's",
    "let's", 'ought', "that's", "there's", "what's", "when's", "where's",
    "who's", "why's", 'would',
)


_SW_SQL = ", ".join("'" + w.replace("'", "''") + "'" for w in _EN_STOPWORDS)

_Q40F_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, source, regexp_split_to_array(lower(text), '\\s') AS toks
  FROM documents
), tok AS (
  SELECT doc_id, source, unnest(toks) AS t FROM docs
), kept AS (
  SELECT * FROM tok WHERE t <> '' AND t NOT IN ({_SW_SQL})
), dfreq AS (
  SELECT t, count(DISTINCT doc_id) AS df FROM kept GROUP BY t HAVING count(DISTINCT doc_id) >= 2
), n AS (SELECT count(*) AS n FROM documents),
idf AS (
  SELECT t, ln((n.n + 1.0) / (df + 1.0)) AS idf FROM dfreq, n
), tf AS (
  SELECT doc_id, source, t, count(*) AS tfc FROM kept GROUP BY doc_id, source, t
), scored AS (
  SELECT tf.doc_id, tf.source, tf.t AS term,
         CAST(round(tf.tfc * idf.idf, 6) AS DECIMAL(20,6)) AS score6
  FROM tf JOIN idf ON idf.t = tf.t
), top3 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                ORDER BY score6 DESC, term) AS drn
    FROM scored) WHERE drn <= 3
), agg AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS doc_hits,
         round(CAST(sum(score6) AS DOUBLE), 4) AS score_sum
  FROM top3 GROUP BY source, term
)
SELECT source, term, doc_hits, score_sum, CAST(rn AS BIGINT) AS rn
FROM (SELECT *, row_number() OVER (PARTITION BY source
        ORDER BY score_sum DESC, term) AS rn FROM agg)
WHERE rn <= 3 ORDER BY source, rn
"""


@_q("q40f_tfidf_top_terms", _Q40F_ORACLE)
def q40f_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer -> StopWordsRemover -> CountVectorizer(minDF=2) -> IDF,
    then the top-3 TF-IDF terms per doc rolled up to top-3 per source.

    Fully relational after the MLlib fits (VERDICT r04 #5 — this was the
    engine's last row-at-a-time Python UDF outside q29's declared parity
    surface): instead of walking each doc's SparseVector in Python, the
    fitted models' vocabulary + idf arrays (vocab-sized driver state,
    the same bound as MLlib's own broadcast of cv_model) become a
    broadcast (term, idf) dimension; tf counts come from the exploded
    token stream, and score = tf * idf reproduces IDFModel.transform.
    No dense vocab-length arrays ever materialize per row.

    Oracle-backed since round 5 (formerly rows-only): ranking uses the
    round-6 decimal-quantized score with a LEXICAL tie-break (not the
    CountVectorizer vocabulary index, whose order for tied document
    frequencies is not contractual), and the stopword list is inlined
    as _EN_STOPWORDS — so DuckDB can replay the whole computation from
    the documents table: df >= 2 vocabulary, idf = ln((N+1)/(df+1)),
    exact decimal score sums."""
    from pyspark.ml.feature import CountVectorizer, IDF, StopWordsRemover, Tokenizer
    from pyspark.sql.window import Window

    from nfl_predictions_spark.sources.tables import spread

    # spread: documents.parquet lands in O(1) row groups at bench scales,
    # so without it the three corpus passes below (cv.fit, idf.fit, the
    # tf explode) each serialize onto 1-2 scan tasks (VERDICT r10 #6 —
    # this was the whole q40f decade "growth": fixed-width execution, not
    # data superlinearity). The tokenized frame is lazily checkpointed so
    # tokenization runs ONCE for all three consumers.
    docs = spread(
        table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    )
    tok = Tokenizer(inputCol="text", outputCol="raw_tokens")
    sw = StopWordsRemover(inputCol="raw_tokens", outputCol="tokens")
    staged = (
        sw.transform(tok.transform(docs))
        .select("doc_id", "source", "tokens")
        .localCheckpoint(eager=False)
    )
    cv = CountVectorizer(inputCol="tokens", outputCol="tf", minDF=2.0)
    cv_model = cv.fit(staged)
    tf = cv_model.transform(staged)
    idf_model = IDF(inputCol="tf", outputCol="tfidf").fit(tf)
    idf_vals = idf_model.idf.toArray().tolist()
    vocab_df = spark.createDataFrame(
        [(t, idf_vals[i]) for i, t in enumerate(cv_model.vocabulary)],
        "term: string, idf: double",
    )

    score6 = F.round(F.col("tfc").cast("double") * F.col("idf"), 6).cast(
        "decimal(20,6)"
    )
    counts = (
        staged.select("doc_id", "source", F.explode("tokens").alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "source", "term")
        .agg(F.count(F.lit(1)).alias("tfc"))
        .join(F.broadcast(vocab_df), "term")
        .select("doc_id", "source", "term", score6.alias("score6"))
    )
    doc_w = Window.partitionBy("doc_id").orderBy(F.desc("score6"), F.asc("term"))
    per_doc = counts.withColumn("drn", F.row_number().over(doc_w)).filter(
        F.col("drn") <= 3
    )
    return (
        per_doc.groupBy("source", "term")
        .agg(
            F.count("*").alias("doc_hits"),
            F.round(F.sum("score6").cast("double"), 4).alias("score_sum"),
        )
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
