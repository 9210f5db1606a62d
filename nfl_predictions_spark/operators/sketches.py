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


# ---------------------------------------------------------------------------
# q213 — Count-Min sketch heavy hitters (deterministic, fully oracled)
# ---------------------------------------------------------------------------

_CMS_DEPTH = 4
_CMS_WIDTH = 256


def _cms_bucket(hcol, j: int):
    """Row-j bucket for a token: the j-th 8-hex-char slice of ONE md5,
    mod width — the engine-neutral hash family the SimHash/Bloom
    oracles use, with one hash invocation feeding all depth rows (md5's
    output hex chars are independent, so slicing beats re-hashing the
    token per row — measured 4x less hash CPU on the corpus scan)."""
    return (
        F.conv(F.substring(hcol, 8 * j + 1, 8), 16, 10).cast("long")
        % _CMS_WIDTH
    )


def _cms_oracle() -> str:
    rows = ", ".join(str(j) for j in range(_CMS_DEPTH))
    return f"""
    WITH tok AS (
      SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents
    ), tk AS (SELECT t FROM tok WHERE t <> ''),
    cells AS (
      SELECT j, CAST(('0x' || substring(md5(t), 8 * j + 1, 8)) AS BIGINT)
                % {_CMS_WIDTH} AS bucket,
             count(*) AS c
      FROM tk, (SELECT unnest([{rows}]) AS j)
      GROUP BY j, bucket
    ),
    exact AS (
      SELECT t, count(*) AS exact_cnt FROM tk GROUP BY t
      ORDER BY exact_cnt DESC, t LIMIT 20
    ),
    est AS (
      SELECT e.t, e.exact_cnt, min(c.c) AS cms_est
      FROM exact e, (SELECT unnest([{rows}]) AS j) js
      JOIN cells c
        ON c.j = js.j
       AND c.bucket = CAST(('0x' || substring(md5(e.t), 8 * js.j + 1, 8)) AS BIGINT)
                      % {_CMS_WIDTH}
      GROUP BY e.t, e.exact_cnt
    )
    SELECT t AS token, CAST(exact_cnt AS BIGINT) AS exact_cnt,
           CAST(cms_est AS BIGINT) AS cms_est,
           CAST(cms_est - exact_cnt AS BIGINT) AS overcount
    FROM est ORDER BY exact_cnt DESC, token
    """


@_q("q213_countmin_heavy_hitters", _cms_oracle())
def q213_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over the token stream + heavy-hitter readout.

    The sketch is a {_CMS_DEPTH} x {_CMS_WIDTH} counter grid summed
    from the per-TYPE token counts: the corpus tokenizes ONCE into a
    map-side-combined vocabulary aggregate (Zipf-bounded shuffle, the
    q40 shape), the md5 bucket hashes run once per type instead of
    once per token instance, and the grid is a groupBy(j, bucket) SUM
    of type counts — the identical cell integers the per-instance
    count produced, at a fraction of the hash work (the raw token
    stream never shuffles; the exact top-20 side is the certifier you
    run once at small scale, the q167-recall pattern). Heavy-hitter estimates read
    min over depth rows; CMS guarantees est >= exact, pinned in tests
    and visible as the non-negative `overcount` column. Deterministic
    md5 bucket hashes make the full grid cross-engine reproducible, so
    unlike the HLL entries this sketch is value-oracled cell-for-cell.
    """
    # spread: a single-row-group documents file would run the md5 work
    # in ONE task (measured as q213's 9x sf1 growth before this)
    tok = (
        spread(table(spark, sf_dir, "documents"))
        .select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("t"))
        .filter(F.col("t") != "")
    )
    h = F.md5(F.col("t"))
    buckets = F.array(*[_cms_bucket(h, j) for j in range(_CMS_DEPTH)])
    # ONE corpus tokenize pass: per-TYPE counts (map-side combinable,
    # vocabulary-sized by Zipf) feed both the sketch and the exact
    # certifier — previously the corpus was tokenized twice AND the md5
    # bucket hashes ran once per token INSTANCE; now they run once per
    # type. cell count = sum of its types' counts, the identical BIGINT.
    tokc = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .localCheckpoint(eager=False)
    )
    cells = (
        tokc.select("exact_cnt", F.posexplode(buckets).alias("j", "bucket"))
        .groupBy("j", "bucket")
        .agg(F.sum("exact_cnt").alias("c"))
    )
    exact = tokc.orderBy(F.desc("exact_cnt"), F.asc("t")).limit(20)
    probes = exact.select(
        "t", "exact_cnt", F.posexplode(buckets).alias("j", "bucket")
    )
    return (
        probes.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("t", "exact_cnt")
        .agg(F.min("c").alias("cms_est"))
        .select(
            F.col("t").alias("token"),
            F.col("exact_cnt").cast("long"),
            F.col("cms_est").cast("long"),
            (F.col("cms_est") - F.col("exact_cnt")).cast("long").alias("overcount"),
        )
        .orderBy(F.desc("exact_cnt"), F.asc("token"))
    )


# ---------------------------------------------------------------------------
# q299 — packed-bitmap distinct rollup (additive COUNT DISTINCT over windows)
# ---------------------------------------------------------------------------

_BM_WORD_BITS = 32  # 32 ids/word: safe shifts in both engines (DuckDB << 63 overflows)
_BM_WINDOW_DAYS = 7


@_q(
    "q299_bitmap_distinct_rollup",
    f"""
    WITH e AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS di,
             user_id
      FROM events
    ),
    d AS (
      SELECT di, CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT user_id) AS BIGINT) AS daily_users,
             CAST(count(DISTINCT user_id // {_BM_WORD_BITS}) AS BIGINT) AS n_words
      FROM e GROUP BY di
    ),
    r AS (
      SELECT d.di, CAST(count(DISTINCT e.user_id) AS BIGINT) AS rolling7_users
      FROM d JOIN e ON e.di BETWEEN d.di - {_BM_WINDOW_DAYS - 1} AND d.di
      GROUP BY d.di
    )
    SELECT d.di, d.n_events, d.daily_users, d.n_words, r.rolling7_users
    FROM d JOIN r ON r.di = d.di
    ORDER BY d.di
    """,
)
def q299_bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packed-bitmap COUNT DISTINCT rollup — the Druid/Kylin additive-
    distinct pattern: daily active users collapse to one
    {_BM_WORD_BITS}-bit word per (day, user_id//{_BM_WORD_BITS}) via
    bit_or, after which ANY date-range distinct count is a popcount of
    bit_or-merged words — no re-scan of the fact table, no distinct
    shuffle of user ids. The rolling {_BM_WINDOW_DAYS}-day window is
    computed shard-and-replicate (each day-word row is exploded to the
    {_BM_WINDOW_DAYS} window end-days it serves, then bit_or-merged per
    end day), which stays exact even when a word has no rows on the
    window's end day — the failure mode of a naive RANGE-frame window
    over a sparse (day, word) grid. At 100 TB the merge input is
    deletes/{_BM_WORD_BITS}-sized per day, not events-sized.

    The DuckDB oracle deliberately does NOT replay the bitmaps: it
    computes plain COUNT(DISTINCT ...) ground truth, so the hash match
    certifies the packed path's SEMANTICS (popcount(bit_or(words)) ==
    count distinct), not merely its arithmetic."""
    ev = table(spark, sf_dir, "events")
    base = spread(ev).select(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long").alias("di"),
        F.floor(F.col("user_id") / _BM_WORD_BITS).cast("long").alias("word_idx"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), "
            f"CAST(user_id % {_BM_WORD_BITS} AS INT))"
        ).alias("one"),
    )
    # the packed day-word table feeds BOTH the daily rollup and the
    # window merge; column-pruning differences (merged drops cnt) keep
    # the two subtrees from canonicalizing equal, so exchange reuse
    # does NOT cover them — without the checkpoint the events-scale
    # scan+pack aggregate runs twice (the q39/q228 pattern)
    words = base.groupBy("di", "word_idx").agg(
        F.bit_or("one").alias("word"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    ).localCheckpoint(eager=False)
    daily = words.groupBy("di").agg(
        F.sum("cnt").cast("long").alias("n_events"),
        F.sum(F.bit_count("word")).cast("long").alias("daily_users"),
        F.count(F.lit(1)).cast("long").alias("n_words"),
    )
    merged = (
        words.withColumn(
            "d",
            F.explode(
                F.sequence(F.col("di"), F.col("di") + (_BM_WINDOW_DAYS - 1))
            ),
        )
        .groupBy("d", "word_idx")
        .agg(F.bit_or("word").alias("mword"))
        .groupBy("d")
        .agg(F.sum(F.bit_count("mword")).cast("long").alias("rolling7_users"))
    )
    return (
        daily.join(merged, daily.di == merged.d)
        .select("di", "n_events", "daily_users", "n_words", "rolling7_users")
        .orderBy("di")
    )


# ---------------------------------------------------------------------------
# q300 — sharded top-k with truncation error bounds (TPUT shape)
# ---------------------------------------------------------------------------

_TOPK_SHARDS = 8
_TOPK_M = 50  # candidates kept per shard
_TOPK_K = 20  # global answer size


@_q(
    "q300_sharded_topk_bounds",
    f"""
    WITH tok AS (
      SELECT doc_id % {_TOPK_SHARDS} AS shard, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    sc AS (
      SELECT shard, token, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY shard, token
    ),
    ranked AS (
      SELECT shard, token, c,
             row_number() OVER (PARTITION BY shard ORDER BY c DESC, token) AS rn
      FROM sc
    ),
    kept AS (SELECT shard, token, c FROM ranked WHERE rn <= {_TOPK_M}),
    thr AS (SELECT shard, CAST(min(c) AS BIGINT) AS thr FROM kept GROUP BY shard),
    tot AS (SELECT CAST(sum(thr) AS BIGINT) AS total_thr FROM thr),
    lbs AS (
      SELECT kept.token, CAST(sum(kept.c) AS BIGINT) AS lb,
             CAST(count(*) AS BIGINT) AS n_shards_kept,
             CAST(sum(thr.thr) AS BIGINT) AS thr_kept
      FROM kept JOIN thr ON thr.shard = kept.shard
      GROUP BY kept.token
    ),
    truth AS (
      SELECT token, CAST(sum(c) AS BIGINT) AS true_cnt FROM sc GROUP BY token
    ),
    scored AS (
      SELECT lbs.token, lbs.lb, lbs.lb + tot.total_thr - lbs.thr_kept AS ub,
             lbs.n_shards_kept, truth.true_cnt,
             row_number() OVER (ORDER BY lbs.lb DESC, lbs.token) AS rk
      FROM lbs CROSS JOIN tot JOIN truth ON truth.token = lbs.token
    )
    SELECT token, lb, ub, n_shards_kept, true_cnt, CAST(rk AS BIGINT) AS rk
    FROM scored WHERE rk <= {_TOPK_K} ORDER BY rk
    """,
)
def q300_sharded_topk_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed top-k with truncation error bounds — the TPUT /
    three-phase-uniform-threshold shape: every shard (here doc_id mod
    {_TOPK_SHARDS}; at 100 TB, a partition or node) reports only its
    local top-{_TOPK_M} token counts plus its truncation threshold (the
    m-th count). The coordinator-side candidate set then carries, for
    every candidate, an exact LOWER bound (sum of reporting shards) and
    an UPPER bound (lb + sum of the thresholds of the shards that did
    NOT report it — a non-reported count can never beat the shard's own
    cut). This is how a fleet answers "global top tokens" while
    shipping m rows per shard instead of a vocabulary-sized shuffle.
    ``true_cnt`` is the full-aggregation certifier (the test pins
    lb <= true_cnt <= ub for every emitted row; production would skip
    it). Determinism: ranks tie-break on token; all counts and bounds
    are integer-exact in both engines. Ranking is on lb (the only
    thing the truncated protocol can sort on), not true_cnt."""
    docs = spread(table(spark, sf_dir, "documents"))
    tok = docs.select(
        (F.col("doc_id") % _TOPK_SHARDS).alias("shard"),
        F.explode(F.split("text", " ")).alias("token"),
    )
    # sc (the per-shard token counts) feeds the kept/threshold legs AND
    # the true-count certifier; without a cut the corpus-scale
    # tokenize+explode+aggregate subtree runs once per consumer (4
    # scans / 10 Windows in the un-cut plan). One lazy checkpoint
    # computes it once; everything downstream is shard-report-sized.
    sc = tok.groupBy("shard", "token").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint(eager=False)
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy(F.desc("c"), F.asc("token"))
    kept = (
        sc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK_M)
        .drop("rn")
    )
    thr = kept.groupBy("shard").agg(F.min("c").cast("long").alias("thr"))
    tot = thr.agg(F.sum("thr").cast("long").alias("total_thr"))
    lbs = (
        kept.join(F.broadcast(thr), "shard")
        .groupBy("token")
        .agg(
            F.sum("c").cast("long").alias("lb"),
            F.count(F.lit(1)).cast("long").alias("n_shards_kept"),
            F.sum("thr").cast("long").alias("thr_kept"),
        )
    )
    truth = sc.groupBy("token").agg(F.sum("c").cast("long").alias("true_cnt"))
    wr = Window.orderBy(F.desc("lb"), F.asc("token"))
    return (
        lbs.crossJoin(F.broadcast(tot))
        .join(truth, "token")
        .select(
            "token",
            "lb",
            (F.col("lb") + F.col("total_thr") - F.col("thr_kept")).alias("ub"),
            "n_shards_kept",
            "true_cnt",
        )
        .withColumn("rk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rk") <= _TOPK_K)
        .orderBy("rk")
    )


# ---------------------------------------------------------------------------
# q316 — KMV (k-minimum-values) distinct sketch, mergeable, oracle-exact
# ---------------------------------------------------------------------------

_KMV_K = 64
_KMV_SCALE = 1 << 60  # hash domain: 60-bit md5 slice


def _kmv_oracle() -> str:
    # Shared 60-bit engine-neutral hash — same helper the dedup suite
    # uses (ADVICE r06 #3: was a verbatim redefinition).
    from nfl_predictions_spark.operators.dedup import _h60_duck

    h = _h60_duck("CAST(user_id AS VARCHAR)")
    return f"""
    WITH u AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    hs AS (SELECT DISTINCT day, CAST({h} AS BIGINT) AS hv FROM u),
    daily AS (SELECT day, CAST(count(*) AS BIGINT) AS exact_daily
              FROM hs GROUP BY day),
    rk AS (
      SELECT day, hv,
             row_number() OVER (PARTITION BY day ORDER BY hv) AS rn
      FROM hs
    ),
    sk AS (
      SELECT day, list(hv ORDER BY hv) AS arr
      FROM rk WHERE rn <= {_KMV_K} GROUP BY day
    ),
    win AS (
      -- RANGE on epoch-day: a true trailing 7-day CALENDAR window, so a
      -- gap in active days shrinks the merge instead of reaching back
      -- past the period (ADVICE r06 #3).
      SELECT day, arr,
             flatten(list(arr) OVER (ORDER BY (day - DATE '1970-01-01')
                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)) AS raw
      FROM sk
    ),
    mrg AS (
      SELECT day, len(arr) AS sketch_size,
             list_sort(list_distinct(raw))[1:{_KMV_K}] AS m
      FROM win
    )
    SELECT mrg.day, daily.exact_daily,
           CAST(len(mrg.m) AS BIGINT) AS merged_size,
           round(CASE WHEN len(mrg.m) < {_KMV_K}
                      THEN CAST(len(mrg.m) AS DOUBLE)
                      ELSE ({_KMV_K} - 1)
                           / (CAST(mrg.m[{_KMV_K}] AS DOUBLE) / {_KMV_SCALE})
                 END, 6) AS users_7d_est
    FROM mrg JOIN daily ON daily.day = mrg.day
    ORDER BY mrg.day
    """


@_q("q316_kmv_distinct_sketch", _kmv_oracle())
def q316_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values, Bar-Yossef et al. 2002) distinct-count
    sketch: keep only the {_KMV_K} smallest 60-bit hashes per day —
    constant state — and estimate distinct users as (k-1)/R_k where
    R_k is the k-th minimum normalized hash. Unlike the DataSketches
    HLL path (q155b, engine-native and therefore rows-only), KMV is
    pure order statistics on an engine-neutral md5 hash, so the WHOLE
    sketch lifecycle — build, trailing 7-CALENDAR-DAY MERGE (RANGE
    frame on the epoch-day ordinal: union the hash lists, keep the k
    smallest), estimate — carries a full value oracle. Mergeability is the point: sketches union losslessly, the
    re-cut k-minimum set of a union is exact, and a sketch smaller
    than k IS the exact count.

    Shape: per-day k-minima via a day-partitioned rank filter (Spark
    plans WindowGroupLimit: each input partition keeps k, then k per
    partition merge — never a full sort); everything after runs on the
    calendar-day frame with ≤7k-element arrays. Estimate arithmetic is
    one division on the identical double in both engines.
    """
    from nfl_predictions_spark.operators.dedup import _h60_spark
    from pyspark.sql import Window

    u = (
        table(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("day"), "user_id")
        .distinct()
    )
    hs = u.select(
        "day", _h60_spark(F.col("user_id").cast("string")).alias("hv")
    ).distinct()
    daily = hs.groupBy("day").agg(F.count(F.lit(1)).alias("exact_daily"))
    wrk = Window.partitionBy("day").orderBy("hv")
    sk = (
        hs.withColumn("rn", F.row_number().over(wrk))
        .filter(F.col("rn") <= _KMV_K)
        .groupBy("day")
        .agg(F.sort_array(F.collect_list("hv")).alias("arr"))
    )
    # RANGE over epoch-day, not ROWS over active days: across a calendar
    # gap the merge covers the 7-DAY period, not the last 7 days with
    # data (ADVICE r06 #3). unix_date gives the integer day ordinal the
    # range frame needs; the frame is still bounded (≤7 day-rows).
    wday = (
        Window.orderBy(F.unix_date(F.col("day"))).rangeBetween(-6, 0)
    )
    mrg = sk.withColumn(
        "m",
        F.slice(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("arr").over(wday)))
            ),
            1,
            _KMV_K,
        ),
    )
    est = F.when(
        F.size("m") < _KMV_K, F.size("m").cast("double")
    ).otherwise(
        (_KMV_K - 1)
        / (F.element_at("m", _KMV_K).cast("double") / F.lit(float(_KMV_SCALE)))
    )
    return (
        mrg.join(daily, "day")
        .select(
            "day",
            F.col("exact_daily").cast("long"),
            F.size("m").cast("long").alias("merged_size"),
            F.round(est, 6).alias("users_7d_est"),
        )
        .orderBy("day")
    )
