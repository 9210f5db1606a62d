"""Multimodal binary-column plumbing (north-star).

Images/audio/video are opaque ``binary`` payloads with typed metadata
(schemas.MEDIA_SCHEMA). The Spark-side plumbing — schema, partitioning,
Arrow batch shape, UDF signatures — is real and tested; the actual
codec decode is STUBBED: the image/audio libraries are not in this
container, so ``decode_media_real`` raises NotImplementedError behind
an import-try, and ``extract_features`` computes deterministic
byte-level statistics instead (a stand-in with the same dataflow shape
as a real decode -> feature-extract stage).

Scale notes: payloads never pass through Python row-at-a-time —
``mapInPandas`` streams Arrow record batches, so each executor touches
its partition's binaries in bulk; feature extraction is embarrassingly
parallel and shuffle-free.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict = {}
ORACLE: dict[str, str] = {}

_MEDIA_TYPES = ["image", "audio", "video"]


def synthetic_media(spark: SparkSession, n: int = 300) -> DataFrame:
    """Deterministic fake assets: payload bytes derive from md5 chains of
    the asset id (64-256 bytes each), metadata from seeded hashes."""
    h = lambda seed: F.abs(F.xxhash64(F.col("id"), F.lit(seed)))  # noqa: E731
    n_blocks = (h(1) % 13 + 4).cast("int")  # 4..16 x 16-byte blocks
    payload = F.unhex(
        F.aggregate(
            F.sequence(F.lit(1), n_blocks),
            F.lit(""),
            lambda acc, i: F.concat(acc, F.md5(F.concat(F.col("id").cast("string"), F.lit("#"), i.cast("string")))),
        )
    )
    mt = F.element_at(
        F.array(*[F.lit(t) for t in _MEDIA_TYPES]), (h(2) % 3 + 1).cast("int")
    )
    return spark.range(n).select(
        F.col("id").alias("asset_id"),
        mt.alias("media_type"),
        payload.alias("payload"),
        F.struct(
            (h(3) % 1920 + 1).cast("int").alias("width"),
            (h(4) % 1080 + 1).cast("int").alias("height"),
            (h(5) % 60000).cast("int").alias("duration_ms"),
            F.element_at(
                F.array(F.lit("raw"), F.lit("jpg"), F.lit("pcm"), F.lit("h264")),
                (h(6) % 4 + 1).cast("int"),
            ).alias("codec"),
        ).alias("meta"),
    )


def decode_media_real(payload: bytes, media_type: str):  # pragma: no cover
    """Real codec decode — STUB. The container ships no image/audio
    libraries; a deployment with PIL/soundfile/av installed plugs in
    here without touching the Spark plumbing."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "codec libraries not available in this environment; "
            "use extract_features (deterministic byte-level stand-in)"
        ) from e
    raise NotImplementedError("real decode not wired yet")


FEATURE_SCHEMA = (
    "asset_id long, media_type string, n_bytes int, width int, height int, "
    "byte_mean double, byte_std double, head16 array<int>"
)


def extract_features(media: DataFrame) -> DataFrame:
    """decode -> feature-extract as mapInPandas over Arrow batches.
    Features are deterministic byte statistics (the decode stand-in);
    the batch shape, schema handling, and null-safety are the real
    production plumbing."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            arrs = [np.frombuffer(p, dtype=np.uint8) if p is not None else np.array([], np.uint8) for p in payloads]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(a) for a in arrs],
                    "width": [m["width"] for m in pdf["meta"]],
                    "height": [m["height"] for m in pdf["meta"]],
                    "byte_mean": [round(float(a.mean()), 6) if a.size else 0.0 for a in arrs],
                    "byte_std": [round(float(a.std()), 6) if a.size else 0.0 for a in arrs],
                    "head16": [a[:16].astype("int32").tolist() for a in arrs],
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, frame_size: int = 16, stride: int = 64) -> DataFrame:
    """Frame sampling as pure Catalyst expressions: every ``stride``-th
    ``frame_size``-byte slice of the payload (the shape of video
    frame-sampling without a codec). Output: one row per sampled frame."""
    n = F.length("payload")
    offsets = F.sequence(F.lit(1), F.greatest((n / stride).cast("int"), F.lit(1)))
    frames = F.transform(
        offsets,
        lambda i: F.substring(F.col("payload"), (i - 1) * stride + 1, frame_size),
    )
    return (
        media.filter(F.col("media_type") == "video")
        .select("asset_id", F.posexplode(frames).alias("frame_idx", "frame_bytes"))
        .select("asset_id", "frame_idx", F.length("frame_bytes").alias("frame_len"))
    )


def q43_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: synthetic assets -> Arrow-batched feature extraction
    -> per-type summary (deterministic; model-free decode stand-in, so
    rows-only check; determinism + plumbing pinned in tests)."""
    feats = extract_features(synthetic_media(spark, 300))
    return (
        feats.groupBy("media_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("byte_mean"), 4).alias("avg_byte_mean"),
        )
        .orderBy("media_type")
    )


QUERIES["q43_multimodal_features"] = q43_multimodal_features


_PNG_SIG_HEX = "89504E470D0A1A0A"


def q97_image_header_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image-header parsing, entirely JVM-side: synthesize valid
    PNG byte prefixes (8-byte signature + IHDR chunk) as a binary
    column, then parse width/height back OUT of the raw bytes with
    ``substring``/``hex``/``conv`` — no Python, no codec library, pure
    whole-stage-codegen byte slicing. parse(construct(i)) == i is the
    oracle, certifying offsets and big-endian decoding; the identical
    parse expressions run unchanged on real PNG files ingested through
    q78's binaryFile source (width/height live at bytes 17-24 of every
    conformant PNG). This is the metadata-extraction stage a 100 TB
    image corpus runs BEFORE any expensive decode: a scan-speed filter
    on dimensions/signature that discards junk without ever leaving
    the JVM."""
    ids = spark.range(500).select(F.col("id").alias("img_id"))
    width = (F.col("img_id") % 1000 + 1).cast("int")
    height = (F.col("img_id") % 777 + 1).cast("int")
    ihdr = F.concat(
        F.lit(_PNG_SIG_HEX),
        F.lit("0000000D"),  # IHDR data length
        F.lit("49484452"),  # "IHDR"
        F.lpad(F.hex(width), 8, "0"),
        F.lpad(F.hex(height), 8, "0"),
    )
    with_bytes = ids.withColumn("png", F.unhex(ihdr))
    parsed_w = F.conv(F.hex(F.expr("substring(png, 17, 4)")), 16, 10).cast("int")
    parsed_h = F.conv(F.hex(F.expr("substring(png, 21, 4)")), 16, 10).cast("int")
    sig_ok = F.hex(F.expr("substring(png, 1, 8)")) == F.lit(_PNG_SIG_HEX)
    return (
        with_bytes.select(
            "img_id",
            parsed_w.alias("width"),
            parsed_h.alias("height"),
            sig_ok.alias("sig_ok"),
        )
        .orderBy("img_id")
    )


QUERIES["q97_image_header_parse"] = q97_image_header_parse
ORACLE["q97_image_header_parse"] = (
    "SELECT CAST(i AS BIGINT) AS img_id, "
    "CAST(i % 1000 + 1 AS INT) AS width, CAST(i % 777 + 1 AS INT) AS height, "
    "TRUE AS sig_ok FROM (SELECT unnest(range(0, 500)) AS i) ORDER BY img_id"
)
