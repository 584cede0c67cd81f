"""Multimodal columns: opaque binary payloads + typed metadata (SURVEY §7 M5).

Pattern for 100 TB image/audio/video pipelines: the payload is an opaque
``binary`` column (or a pointer into object storage), metadata is a typed
struct, and decode / feature-extraction runs as Arrow-batched Python over
``mapInPandas`` — never row-at-a-time UDFs.

The container has no image/audio libraries, so the actual decoders are
STUBS (NotImplementedError) behind a clearly-marked seam; the Spark-side
plumbing — schema, batching, partitioning, deterministic featurization —
is real and oracle-checked: q37 builds binary payloads from document text,
extracts byte-level features in Python (mapInPandas), and must agree with
the DuckDB twin computed in SQL.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from mapreduce_framework_spark.catalog import table
from mapreduce_framework_spark.functions.hashing import fnv1a32_py
from mapreduce_framework_spark.registry import register

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("fingerprint", LongType()),
        StructField("first_byte", LongType()),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to pixels. STUB: no imaging libs in this
    environment; on a real cluster plug Pillow/opencv here."""
    raise NotImplementedError("image decode requires an imaging library")


def decode_audio(payload: bytes) -> "object":
    """Decode an audio payload to samples. STUB (no audio libs here)."""
    raise NotImplementedError("audio decode requires an audio library")


def sample_video_frames(payload: bytes, every_n: int = 30) -> "object":
    """Frame-sample a video payload. STUB (no video libs here)."""
    raise NotImplementedError("video decode requires a video library")


def extract_byte_features(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Deterministic byte-level featurizer — the *real* decode seam: on a
    real cluster the body would call decode_image/decode_audio and emit
    embeddings; here it emits byte length, FNV fingerprint, first byte.
    One Arrow batch in, one out — no per-row Python dispatch."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "byte_len": [len(p) for p in payloads],
                "fingerprint": [fnv1a32_py(bytes(p)) for p in payloads],
                "first_byte": [bytes(p)[0] if len(p) else -1 for p in payloads],
            }
        )


def media_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media table derived from documents: payload = UTF-8 bytes of
    the text (a deterministic stand-in for image/audio bytes)."""
    docs = table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
    )


@register(
    "q37_multimodal_features",
    oracle="""
    SELECT doc_id,
           'text/plain' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CASE WHEN length(text) = 0 THEN CAST(2166136261 AS BIGINT)
           ELSE list_reduce(list_prepend(CAST(2166136261 AS BIGINT),
                list_transform(range(1, length(text) + 1),
                               i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))),
                (acc, b) -> ((xor(acc, b) * 16777619) % 4294967296)) END AS fingerprint,
           CAST(CASE WHEN length(text) > 0 THEN unicode(substr(text, 1, 1)) ELSE -1 END AS BIGINT) AS first_byte
    FROM documents ORDER BY doc_id
    """,
    tags=("ext", "multimodal"),
)
def q37_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: binary payload column → Arrow-batched
    mapInPandas featurizer → typed feature frame. The Python-side FNV must
    agree with the SQL oracle byte-for-byte (ASCII corpus ⇒ unicode()==byte)."""
    from mapreduce_framework_spark.deploy import ensure_package_on_executors

    ensure_package_on_executors(spark)
    media = media_frame(spark, sf_dir)
    feats = media.mapInPandas(extract_byte_features, schema=FEATURE_SCHEMA)
    return feats.orderBy("doc_id")
