"""Explicit StructType schema registry (SURVEY.md §1.3).

The reference keeps its 25-column play-by-play schema as a comment block
(reference ``assets/app_nfl.py:347-375``) and a hard-coded header list
(``sklearn_deployment/main.py:36``); typing happens ad hoc at use sites.
The engine makes the schema a first-class constant: every source is read
with an explicit ``StructType`` (no inference pass — at 100 TB a schema
inference scan is a full extra read of the data).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Play-by-play fact table: 25 positional columns (reference
# assets/app_nfl.py:347-375; logical types from use-site casts
# assets/app_nfl.py:257-263 and sklearn_deployment/main.py:104).
# ---------------------------------------------------------------------------
PLAYS_SCHEMA = T.StructType(
    [
        T.StructField("Date", T.TimestampType()),
        T.StructField("GameID", T.LongType()),
        T.StructField("Drive", T.IntegerType()),
        T.StructField("qtr", T.IntegerType()),
        T.StructField("down", T.IntegerType()),
        T.StructField("time", T.StringType()),
        T.StructField("TimeUnder", T.IntegerType()),
        T.StructField("TimeSecs", T.IntegerType()),
        T.StructField("PlayTimeDiff", T.IntegerType()),
        T.StructField("yrdline100", T.IntegerType()),
        T.StructField("ydstogo", T.IntegerType()),
        T.StructField("ydsnet", T.IntegerType()),
        T.StructField("FirstDown", T.IntegerType()),
        T.StructField("posteam", T.StringType()),
        T.StructField("DefensiveTeam", T.StringType()),
        T.StructField("Yards_Gained", T.IntegerType()),
        T.StructField("Touchdown", T.IntegerType()),
        T.StructField("PlayType", T.StringType()),
        T.StructField("PassLength", T.StringType()),
        T.StructField("PassLocation", T.StringType()),
        T.StructField("RunLocation", T.StringType()),
        T.StructField("PosTeamScore", T.IntegerType()),
        T.StructField("DefTeamScore", T.IntegerType()),
        T.StructField("month_day", T.IntegerType()),
        T.StructField("PlayType_lag", T.StringType()),
    ]
)

#: 32-team domain (reference assets/app_nfl.py:34).
TEAMS = (
    "NYJ CAR TB OAK DET TEN BUF BAL NE GB JAC DEN ARI SF KC SEA CIN DAL CLE "
    "MIA SD STL MIN ATL PHI WAS NYG PIT NO IND HOU CHI"
).split()

#: Feature columns assembled by the reference's VectorAssembler
#: (model metadata, SURVEY.md §2A#18).
FEATURE_COLS = [
    "qtr",
    "down",
    "TimeSecs",
    "yrdline100",
    "ydstogo",
    "ydsnet",
    "month_day",
    "PlayType_lag_index",
]

#: 10-field single-record scoring input (reference assets/app_nfl.py:288-297).
SCORE_REQUEST_SCHEMA = T.StructType(
    [
        T.StructField("qtr", T.IntegerType()),
        T.StructField("down", T.IntegerType()),
        T.StructField("TimeSecs", T.IntegerType()),
        T.StructField("yrdline100", T.IntegerType()),
        T.StructField("ydstogo", T.IntegerType()),
        T.StructField("ydsnet", T.IntegerType()),
        T.StructField("month_day", T.IntegerType()),
        T.StructField("posteam", T.StringType()),
        T.StructField("DefensiveTeam", T.StringType()),
        T.StructField("PlayType_lag", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Driver TESTDATA star schema (TESTDATA.md). Explicit schemas let CSV
# round-trips and file-stream sources skip inference.
# ---------------------------------------------------------------------------
TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

#: JSON payload schema of the ``events.props`` column (SURVEY.md §2B Q27).
EVENT_PROPS_SCHEMA = T.StructType([T.StructField("k", T.IntegerType())])

#: Multimodal asset table: opaque binary payload + typed metadata
#: (north-star; see operators/multimodal.py).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)
