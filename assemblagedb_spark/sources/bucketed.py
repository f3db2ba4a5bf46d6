"""Bucketed table layout: the co-located-join storage story.

Docstrings across the engine state the 100 TB disposition for each stored
relation — grams postings "bucketed by gram" (grams.py, search.py), the kv
table "bucketed by key" (mvcc.py), IVF cell assignments and PQ inverted
lists "bucketed by cell" (similarity.py, pq.py). This module makes that
claim an executable fact instead of prose: :func:`write_bucketed` persists
a relation with Spark's catalog bucketing (``DataFrameWriter.bucketBy`` —
hash(key) % buckets per file group, recorded in the metastore), and any
reader that joins or aggregates on the bucket key gets a plan with NO
shuffle exchange on that key: Catalyst recognizes the scan's
HashPartitioning as already satisfying the operator's distribution
requirement. ``tests/test_bucketed_layout.py`` pins exactly that — zero
``Exchange`` nodes for the postings self-join, the per-key aggregate and
the MVCC latest-version rank window over bucketed+sorted inputs.

Scale notes (what this buys at 100 TB):
- A bucketed self-join (overlaps postings, LSH band tables) co-locates
  both sides at WRITE time — the single biggest shuffle of the dedup
  pipeline is paid once at ingest, then amortized over every query.
- ``sortBy`` within buckets additionally elides the sort of a sort-merge
  join or a per-key window when the query order matches the layout order.
- Bucket count is a layout constant: pick it so one bucket's rows fit an
  executor's task comfortably (the same sizing rule as
  ``spark.sql.shuffle.partitions``); joins between tables bucketed with
  the SAME count and key need no exchange on either side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    buckets: int,
    *,
    sort: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Persist ``df`` as a catalog table hash-bucketed by ``keys`` (and
    optionally sorted by ``sort`` within each bucket); returns the table
    read back. Readers joining/aggregating on ``keys`` get shuffle-free
    plans; with a matching ``sort``, sort-merge joins and per-key windows
    also skip their sort."""
    writer = df.write.mode(mode).format("parquet").bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*sort)
    writer.saveAsTable(table)
    return df.sparkSession.table(table)
