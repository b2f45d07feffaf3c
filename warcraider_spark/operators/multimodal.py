"""Multimodal column operators (BASELINE north-star surface).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs, exactly how a 100 TB training-data pipeline carries them: the
bytes never leave the executor, Arrow batches move them across the Python
boundary, and per-modality transforms are ``mapInPandas`` stages.

The container has no image/audio codecs, so the DECODE step is a
deterministic fake (documented, clearly marked) behind the same UDF
signature a real libjpeg/ffmpeg-backed implementation would use — the
Spark-side plumbing (schema, batching, partitioning, null-safety) is real
and tested, per the driver brief.

The synthetic corpus derives binary payloads deterministically from the
``documents`` table so correctness is oracle-checkable end-to-end.
"""

from __future__ import annotations

import hashlib
import struct as _struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from warcraider_spark.registry import query
from warcraider_spark.tables import load_table

# ---------------------------------------------------------------------------
# Corpus: deterministic fake "images" derived from documents (Spark + SQL)
# ---------------------------------------------------------------------------

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)


def media_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → media rows: payload = UTF-8 bytes of the text (a stand-
    in blob), modality round-robins image/audio/video, dims derived from
    n_chars. Pure expressions, so the DuckDB twin is exact."""
    docs = load_table(spark, sf_dir, "documents")
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        (F.col("n_chars") % 640 + 32).cast("int").alias("width"),
        (F.col("n_chars") % 480 + 32).cast("int").alias("height"),
        (F.col("n_chars") % 240 + 1).cast("int").alias("n_frames"),
    )


MEDIA_CORPUS_SQL = """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS modality,
       encode(text) AS payload,
       CAST(n_chars % 640 + 32 AS INT) AS width,
       CAST(n_chars % 480 + 32 AS INT) AS height,
       CAST(n_chars % 240 + 1 AS INT) AS n_frames
FROM documents
"""


# ---------------------------------------------------------------------------
# The decode/feature stage — STUBBED codec, real plumbing
# ---------------------------------------------------------------------------

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("payload_bytes", LongType(), False),
        StructField("payload_sha", StringType(), False),
        StructField("thumb_w", IntegerType(), True),
        StructField("thumb_h", IntegerType(), True),
        StructField("sampled_frames", IntegerType(), True),
    ]
)

THUMB_MAX = 128
FRAME_STRIDE = 10


def decode_media(payload: bytes, modality: str) -> dict:
    """STUB DECODER — deterministic fake standing in for libjpeg/ffmpeg.

    A real deployment swaps this body for actual decoding; signature,
    schema and batching stay identical. Raises NotImplementedError for
    unknown modalities (the contract a real codec registry would have).
    """
    if modality not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder registered for modality {modality!r}")
    return {
        "n_bytes": len(payload),
        "sha": hashlib.sha256(payload).hexdigest(),
    }


def media_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: decode (stubbed) → resize math →
    frame sampling. Arrow-batched; one output row per input row; payload
    column is dropped AFTER this stage so the heavy bytes never shuffle.
    """
    from warcraider_spark.dist import ensure_package_on_executors
    ensure_package_on_executors()

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                payload = bytes(row.payload) if row.payload is not None else b""
                meta = decode_media(payload, row.modality)
                # thumbnail: fit the (width, height) box into THUMB_MAX,
                # preserving aspect (integer floor like a real resizer)
                w, h = int(row.width), int(row.height)
                scale = THUMB_MAX / max(w, h)
                thumb_w = max(int(w * scale), 1) if scale < 1 else w
                thumb_h = max(int(h * scale), 1) if scale < 1 else h
                sampled = (int(row.n_frames) + FRAME_STRIDE - 1) // FRAME_STRIDE
                out.append(
                    {
                        "media_id": row.media_id,
                        "modality": row.modality,
                        "payload_bytes": meta["n_bytes"],
                        "payload_sha": meta["sha"],
                        "thumb_w": thumb_w,
                        "thumb_h": thumb_h,
                        "sampled_frames": sampled,
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(extract, FEATURE_SCHEMA)


@query(
    "q027_media_features",
    oracle=f"""
WITH media AS ({MEDIA_CORPUS_SQL}),
feat AS (
  SELECT media_id, modality,
         octet_length(payload) AS payload_bytes,
         sha256(decode(payload)) AS payload_sha,
         CASE WHEN greatest(width, height) > {THUMB_MAX}
              THEN greatest(CAST(floor(width * ({THUMB_MAX}.0 / greatest(width, height))) AS INT), 1)
              ELSE width END AS thumb_w,
         CASE WHEN greatest(width, height) > {THUMB_MAX}
              THEN greatest(CAST(floor(height * ({THUMB_MAX}.0 / greatest(width, height))) AS INT), 1)
              ELSE height END AS thumb_h,
         CAST(ceil(n_frames / {FRAME_STRIDE}.0) AS INT) AS sampled_frames
  FROM media
)
SELECT media_id, modality, payload_bytes, payload_sha, thumb_w, thumb_h, sampled_frames
FROM feat ORDER BY media_id
""",
    tags=("multimodal", "mapInPandas"),
)
def q027_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode/resize/frame-sample via mapInPandas (stub codec,
    real plumbing): payload size + sha256, aspect-preserving thumbnail
    dims, stride-10 frame sampling — hash-checked against the SQL twin."""
    media = media_corpus(spark, sf_dir)
    return media_features(media).orderBy("media_id")


@query(
    "q028_media_stats",
    oracle=f"""
WITH media AS ({MEDIA_CORPUS_SQL})
SELECT modality,
       COUNT(*) AS n,
       CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
       CAST(MIN(width) AS INT) AS min_w,
       CAST(MAX(height) AS INT) AS max_h,
       CAST(SUM(n_frames) AS BIGINT) AS total_frames
FROM media GROUP BY modality ORDER BY modality
""",
    tags=("multimodal", "agg"),
)
def q028_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus accounting over binary payload sizes per modality — all
    native (octet length never deserializes the blob)."""
    media = media_corpus(spark, sf_dir)
    return (
        media.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.min("width").alias("min_w"),
            F.max("height").alias("max_h"),
            F.sum("n_frames").cast("bigint").alias("total_frames"),
        )
        .orderBy("modality")
    )
