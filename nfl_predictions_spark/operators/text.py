"""Text analysis suite (north-star; SURVEY §2B Q40).

Token counting (whitespace + a BPE-ish regex), quality scoring
(length/punctuation/stopword ratios), rule-based language ID, and
document fingerprinting over the ``documents`` table. All pure Catalyst
expressions — whole-stage codegen, no UDFs — with the identical
formulas in the DuckDB oracles.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nfl_predictions_spark.sources.tables import spread, table

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


#: BPE-ish pre-tokenizer: word pieces, digit runs, or single punctuation
#: marks — the usual pre-split a byte-pair tokenizer applies.
_BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


@_q(
    "q40_token_stats",
    f"""
    SELECT doc_id,
      len(string_split(text, ' ')) AS n_tokens,
      len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
      len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe_tokens,
      round(length(replace(text, ' ', '')) * 1.0 / len(string_split(text, ' ')), 6)
        AS avg_token_len
    FROM documents ORDER BY doc_id
    """,
)
def q40_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace and BPE-ish-regex token counts per document.

    The regex count is pure per-row CPU, so the scan is ``spread`` to
    cluster width: a single-row-group parquet file scans as ONE task,
    and at 10x bench scale that one task serialized ~15 s of regex work
    that parallelizes to under a second (measured; no-op on inputs that
    already scan wide)."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    return (
        spread(table(spark, sf_dir, "documents"))
        .select(
            "doc_id",
            n.alias("n_tokens"),
            F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
            F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), F.lit(0))).alias(
                "n_bpe_tokens"
            ),
            F.round(
                F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) / n, 6
            ).alias("avg_token_len"),
        )
        .orderBy("doc_id")
    )


_SW_LIST_SQL = "['" + "','".join(_STOPWORDS) + "']"


@_q(
    "q40b_quality_score",
    f"""
    WITH t AS (
      SELECT doc_id, text, string_split(text, ' ') AS ts,
        len(string_split(text, ' ')) AS n,
        len(list_filter(string_split(text, ' '), x -> list_contains({_SW_LIST_SQL}, x)))
          AS n_stop,
        length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS n_punct
      FROM documents
    )
    SELECT doc_id,
      round(n_stop * 1.0 / n, 6) AS stopword_ratio,
      round(n_punct * 1.0 / length(text), 6) AS punct_ratio,
      CASE WHEN n BETWEEN 20 AND 80
             AND n_stop * 1.0 / n BETWEEN 0.05 AND 0.6
             AND n_punct * 1.0 / length(text) < 0.1
           THEN 1 ELSE 0 END AS is_quality
    FROM t ORDER BY doc_id
    """,
)
def q40b_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality gate: length band + stopword ratio band + low
    punctuation density — the standard cheap pre-filter before expensive
    model-based scoring."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    sw = F.array(*[F.lit(s) for s in _STOPWORDS])
    # multiset count (array_intersect would dedup):
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    n_punct = F.length("text") - F.length(
        F.regexp_replace(F.col("text"), "[^a-zA-Z0-9 ]", "")
    )
    stop_ratio = n_stop / n
    punct_ratio = n_punct / F.length("text")
    return (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.round(stop_ratio, 6).alias("stopword_ratio"),
            F.round(punct_ratio, 6).alias("punct_ratio"),
            F.when(
                n.between(20, 80)
                & stop_ratio.between(0.05, 0.6)
                & (punct_ratio < 0.1),
                1,
            )
            .otherwise(0)
            .alias("is_quality"),
        )
        .orderBy("doc_id")
    )


#: Tiny per-language marker inventories (rule-based language ID: count
#: marker-token hits per language, argmax with 'und' fallback).
_LANG_MARKERS = {
    "en": ["the", "a", "of", "and"],
    "es": ["el", "la", "de", "y"],
    "de": ["der", "die", "das", "und"],
    "fr": ["le", "la", "de", "et"],
}


def _marker_count_sql(lang: str) -> str:
    lst = "['" + "','".join(_LANG_MARKERS[lang]) + "']"
    return f"len(list_filter(string_split(text, ' '), x -> list_contains({lst}, x)))"


@_q(
    "q40c_lang_id",
    f"""
    WITH m AS (
      SELECT doc_id, lang,
        {_marker_count_sql('en')} AS c_en, {_marker_count_sql('es')} AS c_es,
        {_marker_count_sql('de')} AS c_de, {_marker_count_sql('fr')} AS c_fr
      FROM documents
    )
    SELECT doc_id, lang,
      CASE WHEN greatest(c_en, c_es, c_de, c_fr) = 0 THEN 'und'
           WHEN c_en >= greatest(c_es, c_de, c_fr) THEN 'en'
           WHEN c_es >= greatest(c_de, c_fr) THEN 'es'
           WHEN c_de >= c_fr THEN 'de'
           ELSE 'fr' END AS predicted_lang
    FROM m ORDER BY doc_id
    """,
)
def q40c_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language ID (n-gram-heuristic family): deterministic
    argmax over per-language marker hit counts, 'und' when nothing hits.
    Ties resolve in fixed precedence order (en > es > de > fr)."""
    toks = F.split(F.col("text"), " ")

    def count_markers(lang: str):
        arr = F.array(*[F.lit(m) for m in _LANG_MARKERS[lang]])
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    c = {lang: count_markers(lang) for lang in _LANG_MARKERS}
    predicted = (
        F.when(F.greatest(*c.values()) == 0, F.lit("und"))
        .when(c["en"] >= F.greatest(c["es"], c["de"], c["fr"]), F.lit("en"))
        .when(c["es"] >= F.greatest(c["de"], c["fr"]), F.lit("es"))
        .when(c["de"] >= c["fr"], F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return (
        table(spark, sf_dir, "documents")
        .select("doc_id", "lang", predicted.alias("predicted_lang"))
        .orderBy("doc_id")
    )


@_q(
    "q40d_fingerprint",
    "SELECT doc_id, md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) "
    "AS fingerprint FROM documents ORDER BY doc_id",
)
def q40d_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized content fingerprint (casefold, collapse non-alnum runs
    to single spaces, trim, digest) — the key for the exact-dedup path
    that survives whitespace/punctuation perturbations."""
    normalized = F.trim(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")
    )
    return (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.md5(normalized).alias("fingerprint"))
        .orderBy("doc_id")
    )


@_q(
    "q40e_top_terms",
    f"""
    WITH ex AS (
      SELECT d.source, unnest(string_split(d.text, ' ')) AS term FROM documents d
    ), counts AS (
      SELECT source, term, count(*) AS cnt FROM ex
      WHERE NOT list_contains({_SW_LIST_SQL}, term) GROUP BY source, term
    ), ranked AS (
      SELECT source, term, cnt,
        row_number() OVER (PARTITION BY source ORDER BY cnt DESC, term) AS rn
      FROM counts
    )
    SELECT source, term, cnt, CAST(rn AS BIGINT) AS rn FROM ranked
    WHERE rn <= 5 ORDER BY source, rn
    """,
)
def q40e_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top non-stopword terms per source (tokenize -> stopword-remove ->
    count -> rank): the Tokenizer/StopWordsRemover/CountVectorizer shape
    of SURVEY Q40 as pure DataFrame ops."""
    from pyspark.sql import Window

    sw = F.array(*[F.lit(s) for s in _STOPWORDS])
    ex = (
        table(spark, sf_dir, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("term"))
        .filter(~F.array_contains(sw, F.col("term")))
    )
    counts = ex.groupBy("source", "term").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("source").orderBy(F.desc("cnt"), F.asc("term"))
    return (
        counts.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 5)
        .orderBy("source", "rn")
    )


_CHUNK_SIZE = 64  # tokens per chunk
_CHUNK_OVERLAP = 16  # tokens shared between adjacent chunks
_CHUNK_STEP = _CHUNK_SIZE - _CHUNK_OVERLAP


@_q(
    "q90_chunk_documents",
    f"""
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ), sized AS (
      SELECT doc_id, t, len(t) AS n,
             CAST(CEIL(GREATEST(len(t) - {_CHUNK_SIZE}, 0) / {_CHUNK_STEP}.0) AS INT) + 1
               AS n_chunks
      FROM toks
    )
    SELECT doc_id, CAST(i AS INT) AS chunk_id,
           CAST(len(t[i * {_CHUNK_STEP} + 1 : i * {_CHUNK_STEP} + {_CHUNK_SIZE}]) AS INT)
             AS n_tokens,
           md5(array_to_string(t[i * {_CHUNK_STEP} + 1 : i * {_CHUNK_STEP} + {_CHUNK_SIZE}], ' '))
             AS chunk_md5
    FROM sized, LATERAL (SELECT unnest(generate_series(0, n_chunks - 1)) AS i)
    ORDER BY doc_id, chunk_id
    """,
)
def q90_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-budget document chunking with overlap — the core
    training-data op that turns raw documents into model-sized pieces
    ({_CHUNK_SIZE} whitespace tokens per chunk, {_CHUNK_OVERLAP}-token
    overlap so no span is split across a boundary without context).
    Fully declarative: tokenize once, derive the chunk count
    arithmetically, ``sequence`` + ``explode`` the chunk index, and
    ``slice`` the token array — no Python in the hot path, whole-stage
    codegen end to end, and the explode output is partition-local (no
    shuffle until the final presentation sort, which real pipelines
    drop). The oracle re-derives every chunk in SQL and compares md5 of
    the joined tokens — byte parity, not just counts. At 100 TB this
    shape is scan -> narrow explode -> sink with zero wide dependencies.
    """
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.regexp_replace("text", r"\s+", " ")), " ")
    n = F.size("t")
    n_chunks = (
        F.ceil(F.greatest(n - F.lit(_CHUNK_SIZE), F.lit(0)) / float(_CHUNK_STEP))
        .cast("int")
        + 1
    )
    chunk = F.slice("t", F.col("i") * _CHUNK_STEP + 1, _CHUNK_SIZE)
    return (
        docs.select("doc_id", toks.alias("t"))
        .withColumn("i", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .select(
            "doc_id",
            F.col("i").cast("int").alias("chunk_id"),
            F.size(chunk).alias("n_tokens"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_id")
    )


@_q(
    "q98_fuzzy_match",
    """
    WITH names AS (SELECT DISTINCT p_name FROM part),
    probes AS (
      SELECT p_name AS src, substr(p_name, 1, 2) || substr(p_name, 4) AS probe
      FROM names
    ), cand AS (
      SELECT probes.probe, probes.src, names.p_name AS cand_name,
             levenshtein(probes.probe, names.p_name) AS dist
      FROM probes JOIN names ON substr(probes.probe, 1, 1) = substr(names.p_name, 1, 1)
       AND floor(length(names.p_name) / 2)
             BETWEEN floor(length(probes.probe) / 2) - 1
                 AND floor(length(probes.probe) / 2) + 1
      WHERE levenshtein(probes.probe, names.p_name) <= 2
    )
    SELECT probe, src,
           CAST(count(*) AS BIGINT) AS n_candidates,
           min(dist) AS best_dist,
           substr(min(dist || '|' || cand_name), 3) AS best_match
    FROM cand GROUP BY probe, src ORDER BY probe, src
    """,
)
def q98_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching (edit-distance record linkage): corrupt
    every distinct part name deterministically (drop its 3rd char),
    then link each corrupted probe back to the catalog via
    ``levenshtein <= 2`` with (FIRST LETTER, LENGTH BAND) BLOCKING —
    the blocking key turns an all-pairs O(|probes| x |names|) comparison
    into an equi-join per block, which is the only way edit-distance
    linkage survives at catalog scale. First letter alone is a 26-way
    split that skews on hot initials; adding a width-2 length band
    multiplies the block count by the length spread. The band is
    lossless for this threshold: dist <= 2 bounds the length gap at 2,
    so the candidate's band differs from the probe's by at most 1, and
    the probe side explodes to its three adjacent bands (3x probe
    duplication — the cheap side — in exchange for much finer blocks on
    the big side; each true pair still meets exactly once since a
    candidate has one band). Best match = min (distance, name) — every
    probe must re-find its source at distance 1. Both engines implement
    the same unweighted Levenshtein and the same blocking, so the
    oracle checks values exactly."""
    names = table(spark, sf_dir, "part").select("p_name").distinct()
    band = F.floor(F.length("p_name") / 2)
    names_b = names.withColumn("band", band)
    probes = names.select(
        F.col("p_name").alias("src"),
        F.concat(
            F.substring("p_name", 1, 2), F.expr("substring(p_name, 4)")
        ).alias("probe"),
    )
    pband = F.floor(F.length("probe") / 2)
    probes_b = probes.withColumn(
        "band", F.explode(F.array(pband - 1, pband, pband + 1))
    )
    cand = (
        probes_b.join(
            names_b,
            (F.substring(F.col("probe"), 1, 1) == F.substring(F.col("p_name"), 1, 1))
            & (probes_b["band"] == names_b["band"]),
        )
        .withColumn("dist", F.levenshtein("probe", "p_name"))
        .filter(F.col("dist") <= 2)
    )
    return (
        cand.groupBy("probe", "src")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.min("dist").alias("best_dist"),
            F.min_by("p_name", F.struct("dist", "p_name")).alias("best_match"),
        )
        .orderBy("probe", "src")
    )


_VOCAB_K = 20


@_q(
    "q105_vocab_oov",
    f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t FROM documents
    ), vocab AS (
      SELECT t FROM (
        SELECT t, count(*) AS c FROM tok GROUP BY t
        ORDER BY c DESC, t LIMIT {_VOCAB_K})
    ), per_doc AS (
      SELECT doc_id, lang, count(*) AS n_tokens,
             sum(CASE WHEN vocab.t IS NULL THEN 1 ELSE 0 END) AS n_oov
      FROM tok LEFT JOIN vocab ON tok.t = vocab.t
      GROUP BY doc_id, lang
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS docs,
           CAST(sum(n_tokens) AS BIGINT) AS tokens,
           CAST(sum(n_oov) AS BIGINT) AS oov,
           ROUND(sum(n_oov) / CAST(sum(n_tokens) AS DOUBLE), 6) AS oov_rate
    FROM per_doc GROUP BY lang ORDER BY lang
    """,
)
def q105_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary construction + out-of-vocabulary rate — the
    tokenizer-prep stage of a training pipeline: fix the top-{_VOCAB_K}
    token vocabulary by corpus frequency (deterministic under ties:
    count desc, token asc), then measure per-language OOV mass against
    it. The vocabulary is LIMIT-sized, so it BROADCASTS to the token
    stream (left join marks OOV without shuffling the corpus); at 100 TB
    the frequency pass is one map-side-combined count and the scoring
    pass is shuffle-free. A high OOV rate per slice is the signal to
    grow the vocab or re-train the tokenizer before the expensive run.
    """
    tok = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "lang", F.explode(F.split("text", " ")).alias("t"))
    )
    vocab = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("t"))
        .limit(_VOCAB_K)
        .select(F.col("t").alias("vt"))
    )
    per_doc = (
        tok.join(F.broadcast(vocab), tok.t == vocab.vt, "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("vt").isNull().cast("long")).alias("n_oov"),
        )
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tokens").alias("tokens"),
            F.sum("n_oov").alias("oov"),
            F.round(
                F.sum("n_oov") / F.sum("n_tokens").cast("double"), 6
            ).alias("oov_rate"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q132 — BM25 retrieval scoring
# ---------------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOP_K = 10
#: Fixed literal query set (terms from the corpus vocabulary) — the
#: retrieval queries a curation pipeline runs to pull topic slices.
_BM25_QUERIES = [
    (0, ["hash", "join"]),
    (1, ["window", "agg", "stream"]),
    (2, ["scan", "filter"]),
]


def _bm25_oracle() -> str:
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )
    return f"""
    WITH q(qid, term) AS (VALUES {vals}),
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
    dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, t, count(*) AS tf FROM tok
      WHERE t IN (SELECT DISTINCT term FROM q) GROUP BY doc_id, t
    ),
    df AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
    sc AS (
      SELECT q.qid, tf.doc_id,
        sum(
          ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1)
          * tf.tf * ({_BM25_K1} + 1)
          / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / stats.avgdl))
        ) AS score
      FROM q
      JOIN tf ON tf.t = q.term
      JOIN df ON df.t = q.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
      GROUP BY q.qid, tf.doc_id
    ), r AS (
      SELECT qid, doc_id, round(score, 6) AS bm25,
        row_number() OVER (PARTITION BY qid
                           ORDER BY round(score, 6) DESC, doc_id) AS rn
      FROM sc
    )
    SELECT CAST(qid AS BIGINT) AS qid, doc_id, bm25, CAST(rn AS BIGINT) AS rn
    FROM r WHERE rn <= {_BM25_TOP_K} ORDER BY qid, rn
    """


@_q("q132_bm25_retrieval", _bm25_oracle())
def q132_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval over the corpus — the lexical search a
    curation pipeline uses to pull topic slices, mine hard negatives,
    or audit what a training set contains (Okapi BM25, k1={_BM25_K1},
    b={_BM25_B}, the standard public formulation). Top-{_BM25_TOP_K}
    documents per query, ranked on the 6-decimal-rounded score with
    doc_id tie-break (the cross-engine-stable ordering).

    Scale shape: the query terms are literals, so the term match is a
    FILTER pushed into the token explode — no join, and the corpus
    shuffles only its matching (doc, term) tokens, never full
    documents. Document length rides the explode (one column), so tf,
    dl, and df all come out of ONE tokenized scan (df reuses tf's
    shuffle via ReusedExchange); N/avgdl are a tiny second aggregate
    that broadcasts. No inverted index is materialized: at 100 TB a
    repeated-query deployment would persist the (term -> doc, tf)
    table bucketed by term, which is exactly the ``tf`` stage of this
    plan."""
    from pyspark.sql import Window

    terms_df = spark.createDataFrame(
        [(qid, t) for qid, terms in _BM25_QUERIES for t in terms],
        "qid long, term string",
    )
    all_terms = sorted({t for _, ts in _BM25_QUERIES for t in ts})
    docs = spread(table(spark, sf_dir, "documents")).select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    withdl = docs.select("doc_id", F.size("toks").alias("dl"), "toks")
    stats = withdl.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    )
    tf = (
        withdl.select("doc_id", "dl", F.explode("toks").alias("t"))
        .filter(F.col("t").isin(all_terms))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )
    df_ = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    denom = F.col("tf") + _BM25_K1 * (
        1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    sc = (
        terms_df.join(tf, terms_df.term == tf.t)
        .join(F.broadcast(df_), "t")
        .crossJoin(F.broadcast(stats))
        .groupBy("qid", "doc_id")
        .agg(F.sum(idf * F.col("tf") * (_BM25_K1 + 1) / denom).alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    return (
        sc.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _BM25_TOP_K)
        .select("qid", "doc_id", F.round("score", 6).alias("bm25"), "rn")
        .orderBy("qid", "rn")
    )


# ---------------------------------------------------------------------------
# q136 — hybrid retrieval: BM25 + dense cosine fused by reciprocal rank
# ---------------------------------------------------------------------------

_RRF_K = 60  # the standard RRF damping constant (Cormack et al. SIGIR'09)
_RRF_TOP_K = 10
#: dense-side query vectors: the embeddings whose vec_id equals the
#: BM25 query id — the aligned id space TESTDATA guarantees.
_RRF_QIDS = sorted({qid for qid, _ in _BM25_QUERIES})


def _rrf_oracle() -> str:
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )
    qids = ", ".join(str(q) for q in _RRF_QIDS)
    return f"""
    WITH q(qid, term) AS (VALUES {vals}),
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
    dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, t, count(*) AS tf FROM tok
      WHERE t IN (SELECT DISTINCT term FROM q) GROUP BY doc_id, t
    ),
    df AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
    sc AS (
      SELECT q.qid, tf.doc_id,
        sum(
          ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1)
          * tf.tf * ({_BM25_K1} + 1)
          / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / stats.avgdl))
        ) AS score
      FROM q
      JOIN tf ON tf.t = q.term
      JOIN df ON df.t = q.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
      GROUP BY q.qid, tf.doc_id
    ),
    btop AS (
      SELECT qid, doc_id, rn FROM (
        SELECT qid, doc_id,
          row_number() OVER (PARTITION BY qid
                             ORDER BY round(score, 6) DESC, doc_id) AS rn
        FROM sc
      ) WHERE rn <= {_RRF_TOP_K}
    ),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    qe AS (SELECT vec_id AS qid, emb AS v FROM e WHERE vec_id IN ({qids})),
    cosj AS (
      SELECT qe.qid, e.vec_id AS doc_id,
        list_dot_product(v, emb)
          / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(emb, emb))) AS c
      FROM qe, e
    ),
    dtop AS (
      SELECT qid, doc_id, rn FROM (
        SELECT qid, doc_id,
          row_number() OVER (PARTITION BY qid
                             ORDER BY round(c, 6) DESC, doc_id) AS rn
        FROM cosj
      ) WHERE rn <= {_RRF_TOP_K}
    ),
    fused AS (
      SELECT COALESCE(b.qid, d.qid) AS qid,
             COALESCE(b.doc_id, d.doc_id) AS doc_id,
             COALESCE(1.0 / ({_RRF_K} + b.rn), 0)
               + COALESCE(1.0 / ({_RRF_K} + d.rn), 0) AS rrf
      FROM btop b FULL OUTER JOIN dtop d
        ON b.qid = d.qid AND b.doc_id = d.doc_id
    ),
    rr AS (
      SELECT qid, doc_id, round(rrf, 6) AS rrf,
        row_number() OVER (PARTITION BY qid
                           ORDER BY round(rrf, 6) DESC, doc_id) AS rn
      FROM fused
    )
    SELECT CAST(qid AS BIGINT) AS qid, CAST(doc_id AS BIGINT) AS doc_id,
           rrf, CAST(rn AS BIGINT) AS rn
    FROM rr WHERE rn <= {_RRF_TOP_K} ORDER BY qid, rn
    """


@_q("q136_hybrid_rrf", _rrf_oracle())
def q136_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval — BM25 lexical ranks and dense cosine ranks
    fused by Reciprocal Rank Fusion (score = sum over systems of
    1/(k + rank), k={_RRF_K}; Cormack et al., the standard public
    formulation): the retrieval shape modern curation and RAG
    pipelines actually run, where neither lexical nor dense alone is
    trusted. Query ids are shared across both systems (BM25 terms from
    _BM25_QUERIES; the dense query vector is the embedding at vec_id =
    qid). Each system contributes its top-{_RRF_TOP_K}; a document in
    only one list gets that list's term only.

    Scale shape: both rank lists are per-query top-k — tiny — so the
    fusion join is broadcast-sized regardless of corpus scale; all the
    heavy lifting stays in the two underlying scans (q132's single
    tokenized scan, q41's broadcast-query cosine scan). RRF terms are
    reciprocals of small integers — bit-identical across engines — and
    ranking uses the 6-decimal-rounded score with doc_id tie-break,
    the house cross-engine-stable ordering."""
    from pyspark.sql import Window

    bm = q132_bm25_retrieval(spark, sf_dir).select(
        "qid", "doc_id", F.col("rn").alias("brn")
    )
    emb = spread(table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    qv = emb.filter(F.col("vec_id").isin(_RRF_QIDS)).select(
        F.col("vec_id").alias("qid"), F.col("emb").alias("v")
    )
    dot = F.aggregate(
        F.zip_with(F.col("v"), F.col("emb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nv = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("v"), F.col("v"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    ne = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("emb"), F.col("emb"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    wq = Window.partitionBy("qid").orderBy(
        F.desc(F.round("c", 6)), F.asc("doc_id")
    )
    dtop = (
        emb.crossJoin(F.broadcast(qv))
        .select("qid", F.col("vec_id").alias("doc_id"), (dot / (nv * ne)).alias("c"))
        .withColumn("drn", F.row_number().over(wq))
        .filter(F.col("drn") <= _RRF_TOP_K)
        .select("qid", "doc_id", "drn")
    )
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_K) + F.col("brn")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("drn")), F.lit(0.0))
    wr = Window.partitionBy("qid").orderBy(
        F.desc(F.round("rrf_raw", 6)), F.asc("doc_id")
    )
    return (
        bm.join(dtop, ["qid", "doc_id"], "full_outer")
        .withColumn("rrf_raw", rrf)
        .withColumn("rn", F.row_number().over(wr).cast("long"))
        .filter(F.col("rn") <= _RRF_TOP_K)
        .select("qid", "doc_id", F.round("rrf_raw", 6).alias("rrf"), "rn")
        .orderBy("qid", "rn")
    )


# ---------------------------------------------------------------------------
# q141 — Zipf's-law fit of the corpus term-frequency distribution
# ---------------------------------------------------------------------------

_ZIPF_MIN_FREQ = 2  # drop hapax noise from the tail


@_q(
    "q141_zipf_fit",
    f"""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
    freq AS (SELECT t, count(*) AS c FROM tok GROUP BY t
             HAVING count(*) >= {_ZIPF_MIN_FREQ}),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, t ASC) AS r FROM freq
    ), pts AS (
      SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y FROM ranked
    ), a AS (
      SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_terms,
      round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
      round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
        AS log_intercept,
      round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM a
    """,
)
def q141_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit — OLS of ln(frequency) on ln(rank) over the term
    distribution (terms with frequency >= {_ZIPF_MIN_FREQ}): the
    corpus-statistics diagnostic that tells a curation pipeline whether
    a text source looks like natural language (slope near -1) or like
    templated/generated content (flat head or cliff tail). Composes two
    engine primitives end-to-end: the token-frequency aggregate (q40's
    scan) and the closed-form OLS-from-sufficient-statistics shape
    (q137), here over log-transformed points.

    Scale shape: one tokenize + hash agg for frequencies; the rank is
    a window over the VOCABULARY (not the corpus) — bounded rows, and
    at web scale the standard move is rank-by-partial-counts after a
    frequency-threshold pushdown, which the HAVING models. The OLS sums
    are order-dependent doubles summed over ~1e3-1e5 vocabulary points;
    both engines sum in float64 and the derived slope is rounded to 6
    (the q110/q132 precedent for log-derived aggregates)."""
    tok = (
        spread(table(spark, sf_dir, "documents"))
        .select(F.explode(F.split("text", " ")).alias("t"))
    )
    freq = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= _ZIPF_MIN_FREQ)
    )
    from pyspark.sql import Window

    wr = Window.orderBy(F.desc("c"), F.asc("t"))
    pts = freq.withColumn("r", F.row_number().over(wr)).select(
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    a = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return a.select(
        n.cast("long").alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 6).alias("log_intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# q151 — frequent term-pair mining (apriori-pruned co-occurrence)
# ---------------------------------------------------------------------------

_PAIR_MINSUP = 0.25  # fraction of docs a term/pair must appear in


@_q(
    "q151_frequent_pairs",
    f"""
    WITH dt AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ), n AS (SELECT count(*) AS n_docs FROM documents),
    sup1 AS (
      SELECT term, count(*) AS df FROM dt GROUP BY term
    ), freq AS (
      SELECT term, df FROM sup1 CROSS JOIN n WHERE df >= n_docs * {_PAIR_MINSUP}
    ), fdt AS (
      SELECT dt.doc_id, dt.term, freq.df FROM dt JOIN freq ON dt.term = freq.term
    ), pairs AS (
      SELECT a.term AS t1, b.term AS t2,
             any_value(a.df) AS df1, any_value(b.df) AS df2,
             count(*) AS pair_docs
      FROM fdt a JOIN fdt b ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY a.term, b.term
    )
    SELECT t1, t2, CAST(pair_docs AS BIGINT) AS pair_docs,
           round(pair_docs * 1.0 * n_docs / (df1 * df2), 6) AS lift
    FROM pairs CROSS JOIN n
    WHERE pair_docs >= n_docs * {_PAIR_MINSUP}
    ORDER BY pair_docs DESC, t1, t2 LIMIT 20
    """,
)
def q151_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent term-pair mining with apriori pruning — the
    market-basket / co-occurrence primitive over document term sets.
    Candidate pairs are generated ONLY from terms that are individually
    frequent (support >= 25% of docs): the downward-closure property
    means no frequent pair is lost, and the per-doc self-join blows up
    on the (bounded) frequent vocabulary instead of the full one. At
    100 TB: singleton pass is one map-side-combined agg; the frequent
    set is broadcast; the pair join is per-doc-local (equi-join on
    doc_id) so it never shuffles the corpus twice. Lift is rational
    arithmetic; top-20 with (count, t1, t2) total order."""
    docs = spread(table(spark, sf_dir, "documents"))
    dt = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .distinct()
        # consumed by the singleton-support agg AND the frequent-set
        # join: one lazy checkpoint instead of two explode+distinct runs
        .localCheckpoint(eager=False)
    )
    n_docs = docs.count()
    minsup = n_docs * _PAIR_MINSUP
    sup1 = dt.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    freq = sup1.filter(F.col("df") >= minsup)
    fdt = dt.join(F.broadcast(freq), "term")
    a = fdt.select(F.col("doc_id"), F.col("term").alias("t1"), F.col("df").alias("df1"))
    b = fdt.select(F.col("doc_id"), F.col("term").alias("t2"), F.col("df").alias("df2"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(
            F.any_value("df1").alias("df1"),
            F.any_value("df2").alias("df2"),
            F.count(F.lit(1)).alias("pair_docs"),
        )
        .filter(F.col("pair_docs") >= minsup)
    )
    return (
        pairs.select(
            "t1",
            "t2",
            "pair_docs",
            F.round(
                F.col("pair_docs") * float(n_docs) / (F.col("df1") * F.col("df2")), 6
            ).alias("lift"),
        )
        .orderBy(F.desc("pair_docs"), "t1", "t2")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q218 — n-gram novelty accounting (first-occurrence credit per source)
# ---------------------------------------------------------------------------


def _novelty_oracle() -> str:
    from nfl_predictions_spark.operators.dedup import _SHINGLE_SQL

    return f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    sh AS (SELECT doc_id, {_SHINGLE_SQL} AS shingles FROM tok WHERE len(ts) >= 3),
    ex AS (SELECT DISTINCT doc_id, unnest(shingles) AS s FROM sh),
    fo AS (SELECT s, min(doc_id) AS first_doc FROM ex GROUP BY s),
    per AS (
      SELECT e.doc_id, count(*) AS ns,
             sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END) AS novel
      FROM ex e JOIN fo f ON f.s = e.s GROUP BY e.doc_id
    )
    SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(p.ns) AS BIGINT) AS total_shingles,
           CAST(sum(p.novel) AS BIGINT) AS novel_shingles,
           CAST(sum(p.novel) AS DOUBLE) / sum(p.ns) AS novelty_rate
    FROM per p JOIN documents d ON d.doc_id = p.doc_id
    GROUP BY d.source ORDER BY d.source
    """


@_q("q218_ngram_novelty", _novelty_oracle())
def q218_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which source actually contributes NEW content? Every distinct
    3-gram is credited to the earliest doc_id containing it; a doc's
    novelty is the fraction of its shingles it introduced, rolled up per
    source — the dedup-aware counterpart of raw size when weighing
    corpus mixtures (a source can be huge and still add nothing).

    Plan: one shuffle keyed on the shingle computes first-occurrence
    (min over doc_id, map-side combinable); the credit join reuses the
    SAME shingle partitioning (ReusedExchange, no second corpus
    shuffle); per-doc and per-source rollups are each one further
    aggregation, the last over a |sources|-sized frame. Novelty rates
    are BIGINT/BIGINT single divisions — cross-engine exact, no
    rounding, no tolerance.
    """
    from nfl_predictions_spark.operators.dedup import shingle_rows

    docs = table(spark, sf_dir, "documents")
    ex = shingle_rows(docs)
    fo = ex.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    per = (
        ex.join(fo, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("ns"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("novel"),
        )
    )
    return (
        per.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ns").cast("long").alias("total_shingles"),
            F.sum("novel").cast("long").alias("novel_shingles"),
            (
                F.sum("novel").cast("double") / F.sum("ns")
            ).alias("novelty_rate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q231 — phrase search over a positional inverted index
# ---------------------------------------------------------------------------

_PHRASE = ("order", "fast")


def _phrase_oracle() -> str:
    terms = _PHRASE
    joins = []
    for i in range(1, len(terms)):
        joins.append(
            f"JOIN pos p{i} ON p{i}.doc_id = p0.doc_id"
            f" AND p{i}.term = '{terms[i]}' AND p{i}.pos = p0.pos + {i}"
        )
    return f"""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ), pos AS (
      SELECT doc_id, unnest(ts) AS term,
             CAST(generate_subscripts(ts, 1) AS BIGINT) AS pos
      FROM tok
    ), hits AS (
      SELECT p0.doc_id, p0.pos
      FROM (SELECT doc_id, pos FROM pos WHERE term = '{terms[0]}') p0
      {' '.join(joins)}
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(min(pos) AS BIGINT) AS first_pos
    FROM hits GROUP BY doc_id
    ORDER BY n_occurrences DESC, doc_id LIMIT 20
    """


@_q("q231_phrase_search", _phrase_oracle())
def q231_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase retrieval ("{' '.join(_PHRASE)}") over a positional
    inverted index — the IR capability bag-of-words BM25 (q132) cannot
    express: tokens must be ADJACENT. The index is (doc_id, term, pos)
    rows from one posexplode; a k-term phrase is a (k-1)-way self-join
    on (doc_id, pos + i) — and because every join leg is term-filtered
    FIRST, each leg is a pushed-predicate slice of the index, never the
    whole corpus (the literal-term pushdown story q132 uses, extended
    with position arithmetic). At 100 TB the index is bucketed by term;
    a phrase probe touches k term slices and joins them doc-locally.
    """
    pos = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " ")).alias("p0", "term"),
        )
        .select("doc_id", "term", (F.col("p0") + 1).cast("long").alias("pos"))
    )
    legs = pos.filter(F.col("term") == _PHRASE[0]).select("doc_id", "pos")
    for i, t in enumerate(_PHRASE[1:], start=1):
        leg = pos.filter(F.col("term") == t).select(
            F.col("doc_id").alias(f"d{i}"), F.col("pos").alias(f"p{i}")
        )
        legs = legs.join(
            leg,
            (F.col(f"d{i}") == F.col("doc_id"))
            & (F.col(f"p{i}") == F.col("pos") + i),
        ).select("doc_id", "pos")
    return (
        legs.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("pos").alias("first_pos"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("doc_id"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q251 — retrieval-quality evaluation (P@k, MRR, NDCG@k) of the BM25 stack
# ---------------------------------------------------------------------------

# exact log2(rank+1) discounts as literals: 10 doubles both engines share
_DCG_DISCOUNTS = [1.0 / math.log2(r + 1) for r in range(1, _BM25_TOP_K + 1)]


def _retrieval_eval_oracle() -> str:
    qterms = ", ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )
    qsizes = ", ".join(f"({qid}, {len(terms)})" for qid, terms in _BM25_QUERIES)
    discounts = ", ".join(
        f"({r + 1}, {d!r})" for r, d in enumerate(_DCG_DISCOUNTS)
    )
    bm25 = ORACLE["q132_bm25_retrieval"]
    return f"""
    WITH ranked AS ({bm25}),
    qt(qid, term) AS (VALUES {qterms}),
    qs(qid, n_terms) AS (VALUES {qsizes}),
    disc(rn, d) AS (VALUES {discounts}),
    rel AS (
      -- graded relevance: number of the query's terms the doc contains
      SELECT qt.qid, t.doc_id, CAST(count(DISTINCT qt.term) AS BIGINT) AS rel
      FROM (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents) t
      JOIN qt ON qt.term = t.term
      GROUP BY qt.qid, t.doc_id
    ),
    hits AS (
      SELECT r.qid, r.rn,
             coalesce(rel.rel, 0) AS rel,
             qs.n_terms,
             CASE WHEN coalesce(rel.rel, 0) = qs.n_terms THEN 1 ELSE 0 END
               AS is_full
      FROM ranked r
      JOIN qs ON qs.qid = r.qid
      LEFT JOIN rel ON rel.qid = r.qid AND rel.doc_id = r.doc_id
    ),
    ideal AS (
      SELECT rel.qid, rel.rel,
             row_number() OVER (PARTITION BY rel.qid
                                ORDER BY rel.rel DESC, rel.doc_id) AS irn
      FROM rel
    ),
    m AS (
      SELECT h.qid,
             CAST(sum(h.is_full) AS BIGINT) AS full_hits,
             CAST(sum(h.is_full) AS DOUBLE) / {_BM25_TOP_K} AS p_at_k,
             coalesce(max(CASE WHEN h.is_full = 1
                               THEN round(1.0 / h.rn, 6) END), 0.0) AS mrr,
             sum(CAST(round(h.rel * disc.d, 9) AS DECIMAL(20,9))) AS dcg
      FROM hits h JOIN disc ON disc.rn = h.rn
      GROUP BY h.qid
    ),
    idcg AS (
      SELECT i.qid,
             sum(CAST(round(i.rel * disc.d, 9) AS DECIMAL(20,9))) AS idcg
      FROM ideal i JOIN disc ON disc.rn = i.irn
      WHERE i.irn <= {_BM25_TOP_K}
      GROUP BY i.qid
    )
    SELECT m.qid, m.full_hits, m.p_at_k, m.mrr,
           round(CAST(m.dcg AS DOUBLE) / CAST(idcg.idcg AS DOUBLE), 6)
             AS ndcg_at_k
    FROM m JOIN idcg ON idcg.qid = m.qid
    ORDER BY m.qid
    """


@_q("q251_retrieval_eval", _retrieval_eval_oracle())
def q251_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluate the BM25 index (q132) against a deterministic relevance
    rule — graded relevance = how many of the query's terms a document
    contains, "fully relevant" = all of them — reporting Precision@{_BM25_TOP_K},
    MRR (first fully-relevant hit), and graded NDCG@{_BM25_TOP_K} per
    query: the three numbers an IR / RAG-retrieval pipeline watches.

    Exactness: discounts 1/log2(rank+1) are {_BM25_TOP_K} shared
    LITERALS (no runtime transcendentals), per-rank gain terms are
    quantized to DECIMAL(20,9) before summing, MRR is a selected
    rounded reciprocal, and P@k is an exact ratio. The ideal ranking
    (IDCG) ties deterministically on doc_id. Composition: q132's plan
    is the candidate side; relevance needs one term-filtered distinct
    scan (same pushed-literal shape as BM25's tf).
    """
    ranked = q132_bm25_retrieval(spark, sf_dir)
    qt = spark.createDataFrame(
        [(qid, t) for qid, terms in _BM25_QUERIES for t in terms],
        "qid int, term string",
    )
    qs = spark.createDataFrame(
        [(qid, len(terms)) for qid, terms in _BM25_QUERIES],
        "qid int, n_terms int",
    )
    disc = spark.createDataFrame(
        [(r + 1, d) for r, d in enumerate(_DCG_DISCOUNTS)], "rn long, d double"
    )
    toks = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .join(F.broadcast(qt), "term")
        .groupBy("qid", "doc_id")
        .agg(F.countDistinct("term").alias("rel"))
    )
    hits = (
        ranked.join(F.broadcast(qs), "qid")
        .join(toks, ["qid", "doc_id"], "left")
        .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)))
        .withColumn(
            "is_full", F.when(F.col("rel") == F.col("n_terms"), 1).otherwise(0)
        )
        .join(F.broadcast(disc), "rn")
    )
    m = hits.groupBy("qid").agg(
        F.sum("is_full").cast("long").alias("full_hits"),
        (F.sum("is_full").cast("double") / _BM25_TOP_K).alias("p_at_k"),
        F.coalesce(
            F.max(
                F.when(F.col("is_full") == 1, F.round(1.0 / F.col("rn"), 6))
            ),
            F.lit(0.0),
        ).alias("mrr"),
        F.sum(
            F.round(F.col("rel") * F.col("d"), 9).cast("decimal(20,9)")
        ).alias("dcg"),
    )
    wi = Window.partitionBy("qid").orderBy(F.desc("rel"), F.asc("doc_id"))
    idcg = (
        toks.withColumn("irn", F.row_number().over(wi))
        .filter(F.col("irn") <= _BM25_TOP_K)
        .join(F.broadcast(disc.select(F.col("rn").alias("irn"), "d")), "irn")
        .groupBy("qid")
        .agg(
            F.sum(
                F.round(F.col("rel") * F.col("d"), 9).cast("decimal(20,9)")
            ).alias("idcg")
        )
    )
    return (
        m.join(idcg, "qid")
        .select(
            "qid",
            "full_hits",
            "p_at_k",
            "mrr",
            F.round(
                F.col("dcg").cast("double") / F.col("idcg").cast("double"), 6
            ).alias("ndcg_at_k"),
        )
        .orderBy("qid")
    )


# ---------------------------------------------------------------------------
# q253 — hard-negative mining for retrieval training
# ---------------------------------------------------------------------------

_HN_PER_ROLE = 3


def _hard_negatives_oracle() -> str:
    qterms = ", ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )
    qsizes = ", ".join(f"({qid}, {len(terms)})" for qid, terms in _BM25_QUERIES)
    bm25 = ORACLE["q132_bm25_retrieval"]
    return f"""
    WITH ranked AS ({bm25}),
    qt(qid, term) AS (VALUES {qterms}),
    qs(qid, n_terms) AS (VALUES {qsizes}),
    rel AS (
      SELECT qt.qid, t.doc_id, CAST(count(DISTINCT qt.term) AS BIGINT) AS rel
      FROM (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents) t
      JOIN qt ON qt.term = t.term
      GROUP BY qt.qid, t.doc_id
    ), tagged AS (
      SELECT r.qid, r.doc_id, r.rn, coalesce(rel.rel, 0) AS rel,
             CASE WHEN coalesce(rel.rel, 0) = qs.n_terms
                  THEN 'positive' ELSE 'hard_negative' END AS role
      FROM ranked r
      JOIN qs ON qs.qid = r.qid
      LEFT JOIN rel ON rel.qid = r.qid AND rel.doc_id = r.doc_id
    ), picked AS (
      SELECT qid, doc_id, rn, rel, role,
             row_number() OVER (PARTITION BY qid, role ORDER BY rn) AS pick
      FROM tagged
    )
    SELECT qid, role, doc_id, CAST(rn AS BIGINT) AS bm25_rank, rel
    FROM picked WHERE pick <= {_HN_PER_ROLE}
    ORDER BY qid, role, bm25_rank
    """


@_q("q253_hard_negatives", _hard_negatives_oracle())
def q253_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair mining for retrieval models: per
    query, the top-{_HN_PER_ROLE} fully-relevant BM25 hits become
    POSITIVES and the top-{_HN_PER_ROLE} highly-ranked-but-not-fully-
    relevant hits become HARD NEGATIVES — lexically confusable
    documents, exactly the negatives that teach an embedding model
    more than random ones (the standard DPR/contrastive recipe).

    Pure composition: q132's ranking is the candidate pool, q251's
    term-coverage rule supplies relevance, and the role split is one
    rank window over the already-tiny top-k frame. Deterministic end
    to end — the mined pairs are reproducible across runs and engines,
    which is what makes a training set auditable.
    """
    ranked = q132_bm25_retrieval(spark, sf_dir)
    qt = spark.createDataFrame(
        [(qid, t) for qid, terms in _BM25_QUERIES for t in terms],
        "qid int, term string",
    )
    qs = spark.createDataFrame(
        [(qid, len(terms)) for qid, terms in _BM25_QUERIES],
        "qid int, n_terms int",
    )
    rel = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .join(F.broadcast(qt), "term")
        .groupBy("qid", "doc_id")
        .agg(F.countDistinct("term").alias("rel"))
    )
    tagged = (
        ranked.join(F.broadcast(qs), "qid")
        .join(rel, ["qid", "doc_id"], "left")
        .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)))
        .withColumn(
            "role",
            F.when(F.col("rel") == F.col("n_terms"), "positive").otherwise(
                "hard_negative"
            ),
        )
    )
    wp = Window.partitionBy("qid", "role").orderBy("rn")
    return (
        tagged.withColumn("pick", F.row_number().over(wp))
        .filter(F.col("pick") <= _HN_PER_ROLE)
        .select(
            "qid",
            "role",
            "doc_id",
            F.col("rn").cast("long").alias("bm25_rank"),
            F.col("rel").cast("long"),
        )
        .orderBy("qid", "role", "bm25_rank")
    )


# ---------------------------------------------------------------------------
# q261 — per-source token entropy (lexical diversity of corpus slices)
# ---------------------------------------------------------------------------


@_q(
    "q261_source_token_entropy",
    """
    WITH tok AS (
      SELECT d.source, unnest(string_split(d.text, ' ')) AS t
      FROM documents d
    ), c AS (
      SELECT source, t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY source, t
    ), n AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY source),
    h AS (
      SELECT c.source,
             CAST(round(-(c.c * 1.0 / n.n) * log2(c.c * 1.0 / n.n), 9)
                  AS DECIMAL(20,9)) AS term
      FROM c JOIN n ON n.source = c.source
    )
    SELECT h.source,
           (SELECT CAST(count(*) AS BIGINT) FROM c c2 WHERE c2.source = h.source)
             AS vocab,
           any_value(n.n) AS n_tokens,
           round(CAST(sum(h.term) AS DOUBLE), 6) AS entropy_bits
    FROM h JOIN n ON n.source = h.source
    GROUP BY h.source ORDER BY h.source
    """,
)
def q261_source_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each source's token distribution — the
    lexical-diversity number that separates a varied corpus slice from
    a template farm with the same token COUNT (low entropy = repetitive
    vocabulary = less training signal per token; pairs with q234's
    length-bias and q218's novelty for mixture decisions).

    Each -p*log2(p) term is quantized to DECIMAL(20,9) at the source
    (the q246 rule for transcendentals) so the per-source sums are
    order-independent and cross-engine exact; vocab and token counts
    are exact BIGINTs. One tokenized scan, vocabulary-sized state.
    """
    tok = (
        table(spark, sf_dir, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("t"))
    )
    c = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c"))
    n = c.groupBy("source").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("vocab")
    )
    p = F.col("c") / F.col("n")
    term = F.round(-p * F.log2(p), 9).cast("decimal(20,9)")
    return (
        c.join(F.broadcast(n), "source")
        .select("source", "vocab", "n", term.alias("term"))
        .groupBy("source")
        .agg(
            F.any_value("vocab").cast("long").alias("vocab"),
            F.any_value("n").cast("long").alias("n_tokens"),
            F.round(F.sum("term").cast("double"), 6).alias("entropy_bits"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q266 — per-document keyphrase tagging (top bigram by corpus lift)
# ---------------------------------------------------------------------------

_KP_MIN_COUNT = 5  # corpus support floor for a candidate bigram


@_q(
    "q266_doc_keyphrases",
    f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    uni AS (
      SELECT unnest(ts) AS t FROM tok
    ), uc AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY t),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uc),
    bi AS (
      -- bound derived from the array length (ADVICE r04: a hard-coded
      -- range cap would silently drop bigrams past it on longer docs)
      SELECT doc_id, b[1] AS w1, b[2] AS w2
      FROM (SELECT doc_id,
                   unnest([[ts[i], ts[i + 1]] for i in range(1, len(ts))]) AS b
            FROM tok)
    ), bc AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS bcnt
      FROM bi GROUP BY w1, w2 HAVING count(*) >= {_KP_MIN_COUNT}
    ), lifts AS (
      SELECT bc.w1, bc.w2,
             CAST(bc.bcnt AS DOUBLE) * n.n / (c1.c * c2.c) AS lift
      FROM bc JOIN uc c1 ON c1.t = bc.w1 JOIN uc c2 ON c2.t = bc.w2
      CROSS JOIN n
    ), tagged AS (
      SELECT b.doc_id, b.w1 || ' ' || b.w2 AS phrase, l.lift,
             row_number() OVER (PARTITION BY b.doc_id
               ORDER BY round(l.lift, 6) DESC, b.w1, b.w2) AS rn
      FROM (SELECT DISTINCT doc_id, w1, w2 FROM bi) b
      JOIN lifts l ON l.w1 = b.w1 AND l.w2 = b.w2
    )
    SELECT doc_id, phrase, round(lift, 6) AS lift
    FROM tagged WHERE rn = 1 AND doc_id < 100
    ORDER BY doc_id
    """,
)
def q266_doc_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyphrase tagging: each doc labeled with its most
    CHARACTERISTIC bigram — highest corpus lift (observed bigram rate
    over the independence expectation, support >= {_KP_MIN_COUNT}) among
    the bigrams it contains — the cheap doc-enrichment step behind
    faceted browse and topic tagging (rank by lift, not raw count, or
    every doc gets tagged with stopword pairs). First 100 docs emitted
    as the driver sample; the plan is corpus-wide.

    Lift is exact (BIGINT counts, one double expression in identical
    order, ranked on the rounded value with lexical tie-breaks); the
    bigram stats table is vocabulary-pair-sized and broadcastable; the
    per-doc argmax is one window over each doc's distinct bigrams.
    """
    tok = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ts")
    )
    uni = tok.select(F.explode("ts").alias("t"))
    uc = uni.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    # corpus token total folded in via a global window over the
    # vocabulary-sized uc (not a 1-row crossJoin broadcast, which plans
    # as BroadcastNestedLoopJoin — plan-audit hygiene, VERDICT r04 #3)
    ucn = uc.withColumn("n", F.sum("c").over(Window.partitionBy()))
    m = F.size("ts") - 1
    bi = (
        tok.filter(m >= 1)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice("ts", 1, m).alias("w1"),
                    F.slice("ts", 2, m).alias("w2"),
                )
            ).alias("g"),
        )
        .select("doc_id", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
    )
    bc = (
        bi.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("bcnt"))
        .filter(F.col("bcnt") >= _KP_MIN_COUNT)
    )
    c1 = ucn.select(F.col("t").alias("w1"), F.col("c").alias("c1"), "n")
    c2 = uc.select(F.col("t").alias("w2"), F.col("c").alias("c2"))
    lifts = (
        bc.join(c1, "w1")
        .join(c2, "w2")
        .select(
            "w1",
            "w2",
            (
                F.col("bcnt").cast("double") * F.col("n")
                / (F.col("c1") * F.col("c2"))
            ).alias("lift"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc(F.round("lift", 6)), F.asc("w1"), F.asc("w2")
    )
    return (
        bi.distinct()
        .join(lifts, ["w1", "w2"])
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("doc_id") < 100))
        .select(
            "doc_id",
            F.concat_ws(" ", "w1", "w2").alias("phrase"),
            F.round("lift", 6).alias("lift"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q308 — n-gram overlap evaluation (BLEU-style clipped precision)
# ---------------------------------------------------------------------------


def _bleu_oracle() -> str:
    return """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents
                 WHERE len(string_split(text, ' ')) >= 2),
    pairs AS (
      SELECT r.doc_id AS ref_id, c.doc_id AS cand_id,
             r.ts AS rts, c.ts AS cts
      FROM tok r JOIN tok c ON c.doc_id = r.doc_id + 1
      WHERE r.doc_id % 2 = 0
    ),
    cg1 AS (SELECT ref_id, g, count(*) AS c FROM
              (SELECT ref_id, unnest(cts) AS g FROM pairs) GROUP BY ref_id, g),
    rg1 AS (SELECT ref_id, g, count(*) AS c FROM
              (SELECT ref_id, unnest(rts) AS g FROM pairs) GROUP BY ref_id, g),
    cg2 AS (SELECT ref_id, g, count(*) AS c FROM
              (SELECT ref_id, unnest([cts[i] || ' ' || cts[i+1]
                       for i in range(1, len(cts))]) AS g FROM pairs)
            GROUP BY ref_id, g),
    rg2 AS (SELECT ref_id, g, count(*) AS c FROM
              (SELECT ref_id, unnest([rts[i] || ' ' || rts[i+1]
                       for i in range(1, len(rts))]) AS g FROM pairs)
            GROUP BY ref_id, g),
    p1 AS (
      SELECT cg1.ref_id,
             CAST(sum(least(cg1.c, coalesce(rg1.c, 0))) AS DOUBLE)
               / sum(cg1.c) AS p
      FROM cg1 LEFT JOIN rg1 ON rg1.ref_id = cg1.ref_id AND rg1.g = cg1.g
      GROUP BY cg1.ref_id
    ),
    p2 AS (
      SELECT cg2.ref_id,
             CAST(sum(least(cg2.c, coalesce(rg2.c, 0))) AS DOUBLE)
               / sum(cg2.c) AS p
      FROM cg2 LEFT JOIN rg2 ON rg2.ref_id = cg2.ref_id AND rg2.g = cg2.g
      GROUP BY cg2.ref_id
    )
    SELECT pr.ref_id, pr.cand_id,
           CAST(len(pr.rts) AS BIGINT) AS ref_tokens,
           CAST(len(pr.cts) AS BIGINT) AS cand_tokens,
           round(p1.p, 6) AS p1, round(p2.p, 6) AS p2,
           round(sqrt(p1.p * p2.p), 6) AS bleu2
    FROM pairs pr
    JOIN p1 ON p1.ref_id = pr.ref_id
    JOIN p2 ON p2.ref_id = pr.ref_id
    ORDER BY pr.ref_id
    """


@_q("q308_ngram_overlap_eval", _bleu_oracle())
def q308_ngram_overlap_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLEU-style clipped n-gram precision between deterministic
    (reference, candidate) doc pairs (each even doc scored against its
    successor) — the generation-eval metric an LLM pipeline runs over
    millions of (reference, output) pairs: modified 1- and 2-gram
    precision with per-gram CLIPPING (a candidate gram counts at most
    as often as the reference has it — the Papineni 2002 rule that
    kills degenerate repetition), combined by geometric mean.
    sqrt(p1*p2) is IEEE-correctly-rounded, so no libm exp/ln enters
    the compared values (the brevity penalty is deliberately factored
    out into the emitted length columns).

    Shape: per-doc gram counts are corpus-scan hash aggregates; BOTH
    gram orders ride one (pair, order, gram)-keyed LEFT join between
    candidate and reference gram tables — gram-space sized, shuffle on
    (pair_id, n, gram), never a doc x doc product — and one grouped
    precision aggregate pivoted back to p1/p2. Pairing is an equi-join
    on doc_id+1: at 100 TB reference/candidate tables co-partition on
    the pair key.
    """
    tok = (
        spread(table(spark, sf_dir, "documents"))
        .select("doc_id", F.split("text", " ").alias("ts"))
        .filter(F.size("ts") >= 2)
    )
    r = tok.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("ref_id"), F.col("ts").alias("rts")
    )
    c = tok.select(
        (F.col("doc_id") - 1).alias("ref_id"),
        F.col("doc_id").alias("cand_id"),
        F.col("ts").alias("cts"),
    )
    # the pair relation feeds four gram scans plus the final join —
    # materialize it once (lazy local checkpoint) instead of re-running
    # tokenize+filter+join five times
    pairs = r.join(c, "ref_id").localCheckpoint(eager=False)

    def gram_rows(side: str) -> DataFrame:
        # BOTH gram orders in ONE pass over the pair relation: the
        # 1-gram zip pads a null second slot so both struct arrays
        # share a schema and concatenate into a single explode;
        # concat_ws skips the null, so 1-gram strings are the raw
        # tokens exactly as before. (Round 11: the per-order version
        # read the checkpointed pair relation four times per side.)
        col = f"{side}ts"
        m2 = F.greatest(F.size(col) - 1, F.lit(0))
        z1 = F.arrays_zip(
            F.col(col).alias("a"),
            F.array_repeat(F.lit(None).cast("string"), F.size(col)).alias("b"),
        )
        z2 = F.arrays_zip(
            F.slice(col, 1, m2).alias("a"), F.slice(col, 2, m2).alias("b")
        )
        return pairs.select(
            "ref_id", F.explode(F.concat(z1, z2)).alias("z")
        ).select(
            "ref_id",
            F.when(F.col("z.b").isNull(), 1).otherwise(2).alias("n"),
            F.concat_ws(" ", "z.a", "z.b").alias("g"),
            F.lit(side).alias("sd"),
        )

    # Round 12 (guide §2.4 remove shuffles outright): candidate and
    # reference gram streams UNION into ONE (pair, order, gram)-keyed
    # aggregate with side-conditional counters, replacing the round-11
    # shape of two per-side aggregates + a sort-merge LEFT join on the
    # same key — one exchange and one hash aggregate instead of two
    # exchanges + two sorts + a join. Row-for-row identical clip
    # inputs: a (ref_id, n, g) with candidate count c>0 gets rc = its
    # reference count (0 when absent == the old coalesce(rc, 0));
    # ref-only grams (c=0) are filtered exactly as the old LEFT join's
    # preserved-side-only semantics implied, contributing to neither
    # clip nor the denominator.
    counts = (
        gram_rows("c")
        .unionByName(gram_rows("r"))
        .groupBy("ref_id", "n", "g")
        .agg(
            F.sum(F.when(F.col("sd") == "c", 1).otherwise(0)).alias("c"),
            F.sum(F.when(F.col("sd") == "r", 1).otherwise(0)).alias("rc"),
        )
        .filter(F.col("c") > 0)
    )
    clip = F.sum(F.least(F.col("c"), F.col("rc")))
    pn = counts.groupBy("ref_id", "n").agg(
        (clip.cast("double") / F.sum("c")).alias("p")
    )
    prec = pn.groupBy("ref_id").agg(
        F.max(F.when(F.col("n") == 1, F.col("p"))).alias("p1"),
        F.max(F.when(F.col("n") == 2, F.col("p"))).alias("p2"),
    )

    return (
        pairs.join(prec, "ref_id")
        .select(
            "ref_id",
            "cand_id",
            F.size("rts").cast("long").alias("ref_tokens"),
            F.size("cts").cast("long").alias("cand_tokens"),
            F.round("p1", 6).alias("p1"),
            F.round("p2", 6).alias("p2"),
            F.round(F.sqrt(F.col("p1") * F.col("p2")), 6).alias("bleu2"),
        )
        .orderBy("ref_id")
    )


# ---------------------------------------------------------------------------
# q328 — blocklist phrase tagging (multi-phrase scan as a gram hash-join)
# ---------------------------------------------------------------------------

_BL_K = 10  # phrases per n-gram order in the derived blocklist
_BL_FLAG = 3  # flag docs containing >= this many distinct phrases


def _bl_gram_sql(n: int) -> str:
    parts = " || ' ' || ".join(f"ts[i+{j}]" for j in range(n))
    return f"[{parts} for i in range(1, len(ts) - {n - 2})]"


_BL_ORACLE = f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
g2 AS (SELECT doc_id, unnest({_bl_gram_sql(2)}) AS s
       FROM tok WHERE len(ts) >= 2),
g3 AS (SELECT doc_id, unnest({_bl_gram_sql(3)}) AS s
       FROM tok WHERE len(ts) >= 3),
bl AS (
  SELECT s FROM (
    SELECT s, row_number() OVER (ORDER BY count(DISTINCT doc_id) DESC, s ASC)
             AS rk
    FROM g2 GROUP BY s) WHERE rk <= {_BL_K}
  UNION ALL
  SELECT s FROM (
    SELECT s, row_number() OVER (ORDER BY count(DISTINCT doc_id) DESC, s ASC)
             AS rk
    FROM g3 GROUP BY s) WHERE rk <= {_BL_K}
),
hits AS (
  SELECT g.doc_id, g.s, count(*) AS occ
  FROM (SELECT * FROM g2 UNION ALL SELECT * FROM g3) g
  JOIN bl USING (s) GROUP BY g.doc_id, g.s
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_phrases,
       CAST(sum(occ) AS BIGINT) AS n_hits,
       count(*) >= {_BL_FLAG} AS flagged
FROM hits GROUP BY doc_id ORDER BY doc_id
"""


@_q("q328_blocklist_tagging", _BL_ORACLE)
def q328_blocklist_tagging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-phrase blocklist tagging — find every occurrence of every
    phrase from a (possibly huge) phrase list in every document, the op
    behind banned-phrase filters, attribution scans, and policy tagging.
    The phrase list here is derived deterministically from the corpus
    (the {_BL_K} highest-document-frequency word bigrams and trigrams,
    ties broken lexicographically) so the query is self-contained; in
    production the list is an input table.

    The scalable pattern — and why it is NOT a regex alternation: a
    per-row regex over P phrases costs O(len x P) per document and
    cannot be pushed into a join. Instead every document explodes into
    its word n-grams (one shifted-slice zip per order, no lambdas) and
    the phrase list JOINS the gram stream on exact equality — an
    Aho-Corasick replacement where the automaton is a broadcast hash
    table and matching is O(len) per doc regardless of phrase count.
    Overlapping occurrences count (grams are NOT deduped before the
    join); per-doc distinct-phrase and occurrence totals come from one
    grouped aggregation. At 100 TB the gram stream never materializes
    to disk — scan -> explode -> broadcast-join -> partial agg is one
    codegen'd stage before the doc-keyed shuffle."""
    docs = spread(table(spark, sf_dir, "documents"))

    def all_grams() -> DataFrame:
        # BOTH gram orders in ONE scan + ONE explode: the 2-gram zip is
        # padded with a null third slot so the two struct arrays share a
        # schema and concatenate; concat_ws skips the null, so the gram
        # strings are identical to the per-order formulation. (Round 11:
        # the per-order version paid four scan+explode passes per query
        # — two for the blocklist, two for the hit stream.)
        d = docs.select("doc_id", F.split("text", " ").alias("tk"))
        m2 = F.greatest(F.size("tk") - 1, F.lit(0))
        m3 = F.greatest(F.size("tk") - 2, F.lit(0))
        z2 = F.arrays_zip(
            F.slice("tk", 1, m2).alias("w0"),
            F.slice("tk", 2, m2).alias("w1"),
            F.array_repeat(F.lit(None).cast("string"), m2).alias("w2"),
        )
        z3 = F.arrays_zip(
            F.slice("tk", 1, m3).alias("w0"),
            F.slice("tk", 2, m3).alias("w1"),
            F.slice("tk", 3, m3).alias("w2"),
        )
        return d.select(
            "doc_id", F.explode(F.concat(z2, z3)).alias("g")
        ).select(
            "doc_id",
            F.when(F.col("g.w2").isNull(), 2).otherwise(3).alias("n"),
            F.concat_ws(" ", "g.w0", "g.w1", "g.w2").alias("s"),
        )

    g = all_grams()

    # blocklist: ONE aggregate over both orders, top-k per order by a
    # (n)-partitioned rank — same (df desc, s asc) total order as the
    # previous per-order TakeOrdered, one pass instead of two
    from pyspark.sql import Window as _W

    wbl = _W.partitionBy("n").orderBy(F.desc("df"), F.asc("s"))
    bl = (
        g.groupBy("n", "s")
        .agg(F.countDistinct("doc_id").alias("df"))
        .withColumn("rk", F.row_number().over(wbl))
        .filter(F.col("rk") <= _BL_K)
        .select("s")
    )
    hits = (
        g.join(F.broadcast(bl), "s")
        .groupBy("doc_id", "s")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_phrases"),
            F.sum("occ").cast("long").alias("n_hits"),
        )
        .withColumn("flagged", F.col("n_phrases") >= _BL_FLAG)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q331 — vocabulary growth profile (Heaps'-law checkpoints)
# ---------------------------------------------------------------------------

_VG_STEPS = 10  # checkpoints at each decile of the doc_id-ordered corpus


def _vocab_growth_oracle() -> str:
    return f"""
    WITH dl AS (
      SELECT doc_id, len(string_split(text, ' ')) AS ntok FROM documents
    ),
    rk AS (
      SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn,
             count(*) OVER () AS n FROM dl
    ),
    cp AS (
      SELECT CAST(ceil(n * k / {_VG_STEPS}.0) AS BIGINT) AS target, k
      FROM rk, (SELECT unnest(range(1, {_VG_STEPS} + 1)) AS k)
      WHERE rn = 1
    ),
    cpd AS (
      SELECT cp.k, rk.doc_id AS d FROM cp JOIN rk ON rk.rn = cp.target
    ),
    fo AS (
      SELECT term, min(doc_id) AS fod FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents) GROUP BY term
    ),
    fo3 AS (
      SELECT s, min(doc_id) AS fod FROM (
        SELECT doc_id,
               unnest([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                       for i in range(1, len(ts) - 1)]) AS s
        FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
        WHERE len(ts) >= 3) GROUP BY s
    ),
    toks AS (
      SELECT cpd.k, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl.ntok) AS BIGINT) AS n_tokens
      FROM dl JOIN cpd ON dl.doc_id <= cpd.d GROUP BY cpd.k
    ),
    voc AS (
      SELECT cpd.k, CAST(count(*) AS BIGINT) AS vocab
      FROM fo JOIN cpd ON fo.fod <= cpd.d GROUP BY cpd.k
    ),
    voc3 AS (
      SELECT cpd.k, CAST(count(*) AS BIGINT) AS gram3_types
      FROM fo3 JOIN cpd ON fo3.fod <= cpd.d GROUP BY cpd.k
    )
    SELECT t.k, t.n_docs, t.n_tokens, v.vocab, g.gram3_types,
           round(CAST(g.gram3_types AS DOUBLE) / t.n_tokens, 6)
             AS type_token_ratio,
           round(CAST(g.gram3_types AS DOUBLE)
                 / lag(g.gram3_types) OVER (ORDER BY t.k), 6)
             AS gram3_growth
    FROM toks t JOIN voc v USING (k) JOIN voc3 g USING (k)
    ORDER BY t.k
    """


@_q("q331_vocab_growth", _vocab_growth_oracle())
def q331_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth profile — unigram vocab AND distinct-3-gram
    counts with cumulative tokens at each decile of the doc_id-ordered
    corpus: the Heaps'-law diagnostic (V ~ K*N^beta) a tokenizer /
    curation pipeline checks before freezing a vocab budget, and the
    novelty-saturation curve dedup monitors (when gram3_growth falls
    to ~1.0, new data is restating old data). On the synthetic corpus
    the unigram vocab saturates immediately (closed 31-term generator
    vocabulary — itself the demonstration) while the 3-gram space
    keeps growing; both curves ship so the contrast is visible.

    Scale shape: type first-occurrence is ONE shuffle keyed on the
    term/shingle (min over doc_id, map-side combinable — the q218
    novelty pass); per-doc token counts are a scan-side projection.
    The 10 checkpoint boundaries come from a rank probe on the 1-col
    doc_id projection, broadcast, and every cumulative aggregate is a
    broadcast theta-join + groupBy over the k=10-row grid — NO
    global-order running window over data, so no single-partition sort
    at any size.

    Exactness: every compared number is either a BIGINT count or one
    IEEE division of two exact integers, round-6 — nothing
    order-dependent anywhere (no logs: the Heaps exponent itself is
    last-ulp-fragile cross-engine, so the profile emits the raw curve
    and ratio columns instead; the property test pins the fit)."""
    docs = spread(table(spark, sf_dir, "documents"))
    dl = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("ntok")
    )
    wr = Window.orderBy("doc_id")
    # rank probe: only the checkpoint doc_ids survive; the global
    # row_number window runs on the 1-col doc_id projection and is
    # replaced by a distributed rank at scale (see q300's bounds trick).
    # The corpus count rides the same job as a full-frame window (one
    # driver job, not a separate count() probe): a row survives iff its
    # rank is some decile's ceil target ceil(n*k/steps).
    rk = (
        dl.select("doc_id")
        .select(
            "doc_id",
            F.row_number().over(wr).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        )
        .filter(
            F.expr(
                f"exists(sequence(1, {_VG_STEPS}), k -> "
                f"CAST(rn AS BIGINT) = (n * CAST(k AS BIGINT) "
                f"+ {_VG_STEPS - 1}) DIV {_VG_STEPS})"
            )
        )
        .collect()
    )
    n = rk[0].n if rk else 0
    # (k, target) PAIRS, not a target-keyed dict: on tiny corpora
    # (n < _VG_STEPS) several deciles share a ceil target, and the
    # oracle's chunkmap CTE still emits one row per k — so must we
    pairs = [(k, int(-(-n * k // _VG_STEPS))) for k in range(1, _VG_STEPS + 1)]
    by_target = {r.rn: r.doc_id for r in rk}
    cpd = spark.createDataFrame(
        [(k, by_target[t]) for k, t in pairs if t in by_target],
        "k long, d long",
    )
    from nfl_predictions_spark.operators.dedup import shingle_rows

    fo = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.min("doc_id").alias("fod"))
    )
    fo3 = shingle_rows(docs).groupBy("s").agg(F.min("doc_id").alias("fod"))
    toks = (
        dl.crossJoin(F.broadcast(cpd))
        .where(F.col("doc_id") <= F.col("d"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").cast("long").alias("n_tokens"),
        )
    )

    def cum_types(fodf: DataFrame, out: str) -> DataFrame:
        return (
            fodf.crossJoin(F.broadcast(cpd))
            .where(F.col("fod") <= F.col("d"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias(out))
        )

    # the 10-row cumulative frame is consumed twice (join + k-1 shift);
    # checkpoint it so the full shingle first-occurrence pass runs ONCE
    cum3 = cum_types(fo3, "gram3_types").localCheckpoint(eager=False)
    # previous-checkpoint value via a k-1 equi-join, NOT a global lag
    # window (a 10-row frame, but the habit matters: no unpartitioned
    # window anywhere in the registry)
    prev3 = cum3.select(
        (F.col("k") + 1).alias("k"), F.col("gram3_types").alias("prev3")
    )
    return (
        toks.join(cum_types(fo, "vocab"), "k")
        .join(cum3, "k")
        .join(prev3, "k", "left")
        .select(
            "k",
            "n_docs",
            "n_tokens",
            "vocab",
            "gram3_types",
            F.round(
                F.col("gram3_types").cast("double") / F.col("n_tokens"), 6
            ).alias("type_token_ratio"),
            F.round(
                F.col("gram3_types").cast("double") / F.col("prev3"), 6
            ).alias("gram3_growth"),
        )
        .orderBy("k")
    )
