"""Multimodal binary columns: opaque payload + typed metadata.

The reference's multimodal surface is FITS image blobs moved as
``byte[]`` through S3 (S3Service.java:30-66, retrieveData :53-67) with
typed header metadata parsed at decode time (NAXIS/INSTRUME/FILTER,
FitsProcessingService.java:212-272) and per-record heavy transforms over
``float[][]`` pixels (dark/flat/cosmic-ray, :323-552). The Spark-native
restatement:

- media rides as a ``binary`` column next to a typed metadata struct
  (media_type, width, height, n_frames, sample_rate) — never parsed by
  the relational layer, so Catalyst prunes it unless a transform needs
  the bytes;
- decode / feature-extract run as Arrow-batched ``mapInPandas`` over the
  binary column (the P1–P6 transform shape, SURVEY.md §2.9) — the real
  codec libraries (PIL/ffmpeg) are absent in this environment, so the
  codec call is STUBBED at a documented plug point with a deterministic
  byte-level fake; the Spark-side plumbing (schema, batch shape,
  partitioning, metadata passthrough) is real and tested;
- frame sampling is pure relational (``sequence`` + ``explode``), no
  bytes touched — at 100 TB the planner only scans the metadata struct.

The synthetic media table derives deterministically from the driver's
``documents`` table (payload = utf-8 bytes of text, metadata = stable
hash of doc_id), so DuckDB can recompute every metadata-level oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..sources import load_table

MEDIA_TYPES = ("image", "audio", "video")

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_std", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
        T.StructField("decoder", T.StringType()),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → media rows: binary payload + typed metadata struct.

    Deterministic: media_type/width/height/n_frames/sample_rate are pure
    functions of doc_id (pmod of doc_id — reproducible in ANSI SQL), the
    payload is the utf-8 encoding of the text. The binary column stays
    opaque to the relational layer; metadata carries everything the
    planner may filter or partition on (the reference keeps FITS headers
    queryable in Postgres while pixels stay in S3 — same split).
    """
    docs = load_table(spark, sf_dir, "documents")
    mt = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    is_img = mt == "image"
    is_aud = mt == "audio"
    is_vid = mt == "video"
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            mt.alias("media_type"),
            F.when(is_img | is_vid, (F.pmod(F.col("doc_id"), F.lit(4)) + 1) * 160)
            .otherwise(F.lit(None).cast("long"))
            .alias("width"),
            F.when(is_img | is_vid, (F.pmod(F.col("doc_id"), F.lit(3)) + 1) * 120)
            .otherwise(F.lit(None).cast("long"))
            .alias("height"),
            F.when(is_vid, F.pmod(F.col("doc_id"), F.lit(240)) + 8)
            .otherwise(F.lit(None).cast("long"))
            .alias("n_frames"),
            F.when(is_aud, F.lit(16000).cast("long"))
            .otherwise(F.lit(None).cast("long"))
            .alias("sample_rate"),
        ).alias("meta"),
        "n_chars",  # documents already carries length(text) — don't recompute
    )


# ------------------------------------------------------------- decode stub

def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Decode one Arrow batch of media rows into features.

    Computes the deterministic byte-level fake — the documented stub
    for this environment (the codec plug point is marked below). The fake
    is NOT a placeholder shape: it computes real statistics over the
    payload bytes so downstream plumbing is exercised with meaningful,
    reproducible values.
    """
    import numpy as np

    # A real deployment dispatches to the codec (PIL/ffmpeg/...) right
    # here — the plug point. This environment always computes the
    # deterministic byte-level stub, and the column SAYS so: labeling by
    # whether PIL happens to be importable would mislabel stub data as
    # decoded features and make a registered query environment-dependent.
    decoder = "stub-bytes"

    n_bytes, mean, std, feats = [], [], [], []
    for payload in pdf["payload"]:
        if payload is None:  # null text ⇒ null payload ⇒ null features
            n_bytes.append(None)
            mean.append(None)
            std.append(None)
            feats.append(None)
            continue
        arr = np.frombuffer(payload, dtype=np.uint8)
        n_bytes.append(len(arr))
        mean.append(float(arr.mean()) if len(arr) else 0.0)
        std.append(float(arr.std()) if len(arr) else 0.0)
        # 8-bin byte histogram, density-normalized — the stand-in for a
        # decoded feature vector (deterministic, vectorized)
        hist, _ = np.histogram(arr, bins=8, range=(0, 256))
        total = max(hist.sum(), 1)
        feats.append((hist / total).round(6).tolist())
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "media_type": pdf["media_type"],
            "n_bytes": n_bytes,
            "byte_mean": mean,
            "byte_std": std,
            "feature": feats,
            "decoder": decoder,
        }
    )


def decode_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over the binary column
    (``mapInPandas`` — the P1–P6 per-record transform shape).

    Only ``doc_id, media_type, payload`` cross the Arrow boundary —
    metadata the kernel doesn't need never leaves the JVM.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _decode_batch(pdf)

    slim = media.select("doc_id", F.col("meta.media_type").alias("media_type"), "payload")
    return slim.mapInPandas(gen, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, stride: int = 16) -> DataFrame:
    """Frame-sampling plan for video rows: explode every ``stride``-th
    frame index from metadata — pure relational (sequence + explode), the
    payload column is pruned from the scan entirely."""
    vids = media.filter(F.col("meta.media_type") == "video").select(
        "doc_id", F.col("meta.n_frames").alias("n_frames")
    )
    return vids.select(
        "doc_id",
        "n_frames",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                (F.col("n_frames") - 1).cast("long"),
                F.lit(stride).cast("long"),
            )
        ).alias("frame_idx"),
    )


# --------------------------------------------------------------- queries

@query(
    "mm_media_metadata_stats",
    oracle="""
    SELECT media_type,
           COUNT(*) AS n_media,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(MAX(CASE WHEN media_type IN ('image','video')
                    THEN ((doc_id % 4) + 1) * 160 END) AS BIGINT) AS max_width,
           CAST(SUM(CASE WHEN media_type = 'video'
                    THEN (doc_id % 240) + 8 ELSE 0 END) AS BIGINT) AS total_frames
    FROM (
        SELECT doc_id, text,
               CASE (doc_id % 3) WHEN 0 THEN 'image'
                                 WHEN 1 THEN 'audio'
                                 ELSE 'video' END AS media_type
        FROM documents
    )
    GROUP BY media_type
    """,
)
def mm_media_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only rollup over the media table: the binary payload is
    pruned from the scan (only ``meta`` + payload length are read).
    Verifies the typed-metadata model end-to-end against DuckDB."""
    media = media_table(spark, sf_dir)
    return (
        media.groupBy(F.col("meta.media_type").alias("media_type"))
        .agg(
            F.count("*").alias("n_media"),
            F.sum(F.length("payload")).cast("long").alias("total_bytes"),
            F.max("meta.width").cast("long").alias("max_width"),
            F.sum(F.coalesce(F.col("meta.n_frames"), F.lit(0)))
            .cast("long")
            .alias("total_frames"),
        )
    )


@query(
    "mm_frame_sample_plan",
    oracle="""
    SELECT doc_id, n_frames, CAST(gs.g AS BIGINT) AS frame_idx
    FROM (
        SELECT doc_id, CAST((doc_id % 240) + 8 AS BIGINT) AS n_frames
        FROM documents WHERE (doc_id % 3) = 2
    ) v
    CROSS JOIN generate_series(0, 255, 16) AS gs(g)
    WHERE gs.g <= v.n_frames - 1
    """,
)
def mm_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 16th frame index per video — sequence+explode over metadata,
    zero bytes scanned."""
    return sample_frames(media_table(spark, sf_dir), stride=16)


@query(
    "mm_decode_feature_stub",
    oracle="""
    SELECT doc_id, media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM (
        SELECT doc_id, text,
               CASE (doc_id % 3) WHEN 0 THEN 'image'
                                 WHEN 1 THEN 'audio'
                                 ELSE 'video' END AS media_type
        FROM documents
    )
    """,
)
def mm_decode_feature_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode plumbing: mapInPandas over the binary column.
    The oracle checks the deterministic projection (ids, types, byte
    counts); the float features are covered by unit tests (byte_mean/std
    vs numpy recompute) since DuckDB lacks the kernel."""
    feats = decode_features(media_table(spark, sf_dir))
    return feats.select("doc_id", "media_type", "n_bytes")
