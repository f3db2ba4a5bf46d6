"""Streaming deduplication: first-seen document wins, state bounded by a
watermark.

The streaming face of :mod:`assemblagedb_spark.operators.dedup`'s exact
pass — a training-data ingest pipeline runs this in front of the batch
near-dup stages so exact duplicates never hit storage. Built on
``dropDuplicatesWithinWatermark``: the state store keeps one entry per
distinct key only until the event-time watermark passes it, so state is
O(distinct keys per watermark window), not O(stream length) — the property
that keeps a months-long 100 TB ingest from accumulating unbounded state.

Key = md5 of the whitespace-collapsed lower-cased text (same normalization
as the batch ``exact_duplicates``), so the streaming and batch passes agree
on what "exact duplicate" means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from assemblagedb_spark.operators.dedup import normalized_text


def streaming_exact_dedup(
    docs: DataFrame,
    *,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """First occurrence of each normalized text within the watermark window.

    A duplicate arriving within ``watermark`` of the original's event time
    is dropped; after the watermark passes, the key's state is evicted (a
    much-later re-occurrence is treated as new — the standard trade a
    bounded-state streaming dedup makes; run the batch pass for global
    exactness).
    """
    hashed = docs.withColumn("text_hash", F.md5(normalized_text(text_col)))
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["text_hash"]
    )
