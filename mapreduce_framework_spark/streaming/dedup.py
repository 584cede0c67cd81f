"""Streaming incremental dedup — the streaming face of the dedup family
(pipeline/dedup.py is the batch face).

An ingestion pipeline dedupes *as documents arrive*, not in a nightly
batch. Two state regimes:

- :func:`streaming_exact_dedup` — ``dropDuplicates`` on a content hash.
  State is one 8-byte hash per distinct document, forever: exact, but
  state grows with corpus cardinality. Right when the keyed state store
  (RocksDB-backed on a real cluster) can hold the full hash set.
- :func:`streaming_dedup_within_watermark` — ``dropDuplicatesWithinWatermark``:
  duplicates are only suppressed if they arrive within the watermark delay
  of the first copy; older state is evicted as the watermark advances.
  Bounded state — the 100 TB-viable form when duplicates cluster in time
  (re-crawls, retry storms), trading eternal exactness for an explicit
  duplicate horizon.

The reference engine is batch-only (hard map→reduce barrier,
``src/mr/coordinator.go:143-155``); this module is [EXT] surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(docs_stream: DataFrame, content_col: str = "text") -> DataFrame:
    """Keep the first arrival of each distinct content value (by xxhash64).
    Emits kept rows in append mode; duplicates in any later micro-batch are
    suppressed by the keyed state store."""
    return docs_stream.withColumn(
        "content_hash", F.xxhash64(F.col(content_col))
    ).dropDuplicates(["content_hash"])


def streaming_dedup_within_watermark(
    stream: DataFrame, keys: list[str], ts_col: str, delay: str
) -> DataFrame:
    """Bounded-state dedup: suppress duplicates of ``keys`` arriving within
    ``delay`` (event time) of the first copy; evict state once the
    watermark passes first_seen + delay."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
