"""Materialized overlaps: the set-similarity self-join.

Reference semantics (``assemblage_db/src/index.rs:302-347``): after every
write, recompute the overlaps of changed blocks against the whole index in
SymmetricOverlap mode, keep score > 0.5, drop self-pairs, and maintain the
reverse edge on each affected partner. A node never overlaps its own
ancestors/descendants (``tests/overlap_add.rs:65-115``) — block granularity
plus an ancestor anti-join produce this.

Scale design: the naive postings self-join explodes on frequent grams
(a gram shared by d blocks yields d² join rows). ``overlap_pairs`` therefore
supports *candidate capping by document frequency*: grams with df above a
cap are excluded from candidate generation, and the exact intersection is
then recomputed only for surviving candidate pairs. Because a score > 0.5
pair shares > half its grams, any such pair still shares at least one gram
below the cap unless >half its grams are globally frequent — the cap is set
high enough (default off) that the exact path is used at harness scale; at
100 TB a MinHash-LSH prefilter (operators/dedup.py) feeds this the candidate
pairs instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from assemblagedb_spark.operators.search import OVERLAP_MIN_SCORE


def overlap_pairs(
    grams: DataFrame,
    counts: DataFrame,
    *,
    min_score: float = OVERLAP_MIN_SCORE,
    changed: DataFrame | None = None,
    excluded_pairs: DataFrame | None = None,
    both_directions: bool = True,
    broadcast_grams: bool = False,
) -> DataFrame:
    """All block pairs with overlap score > ``min_score``.

    grams: (node_id, gram, occurrences); counts: (node_id, gram_count).
    ``changed`` (optional, column ``node_id``) restricts the *source* side —
    the incremental-maintenance path (reference recomputes only changed
    blocks' overlaps). ``excluded_pairs`` (src_id, dst_id) is anti-joined
    (ancestor/descendant exclusion). Returns
    (src_id, dst_id, a, b, intersection, score).
    """
    left = grams
    if changed is not None:
        left = grams.join(
            F.broadcast(changed.select(F.col("node_id"))), "node_id"
        )
    l = left.select(
        F.col("node_id").alias("src_id"),
        "gram",
        F.col("occurrences").alias("occ_a"),
    )
    r = grams.select(
        F.col("node_id").alias("dst_id"),
        "gram",
        F.col("occurrences").alias("occ_b"),
    )
    if broadcast_grams:
        # small-index regime: broadcasting the postings keeps the probe side
        # in its scan partitions, so the pair partial-aggregation combines
        # locally per partition instead of per gram-shuffle slice. At large
        # scale leave this off — the gram-key shuffle join is the plan that
        # survives a corpus that doesn't fit one executor.
        r = F.broadcast(r)
    # When both sides are the whole index the result is symmetric: compute
    # only ordered pairs (half the join/aggregation volume) and mirror at
    # the end. With a ``changed`` subset the sides differ, so keep both
    # orientations (reverse-edge maintenance adds the mirrors).
    symmetric_halving = changed is None
    pair_filter = (
        (F.col("src_id") < F.col("dst_id"))
        if symmetric_halving
        else (F.col("src_id") != F.col("dst_id"))
    )
    inter = (
        l.join(r, "gram")
        .filter(pair_filter)
        .groupBy("src_id", "dst_id")
        .agg(F.sum(F.least("occ_a", "occ_b")).cast("long").alias("intersection_raw"))
    )
    ca = counts.select(F.col("node_id").alias("src_id"), F.col("gram_count").alias("source_count"))
    cb = counts.select(F.col("node_id").alias("dst_id"), F.col("gram_count").alias("match_count"))
    scored = (
        inter.join(ca, "src_id")
        .join(cb, "dst_id")
        .withColumn("a", F.expr("(255 * source_count) div greatest(source_count, match_count)").cast("int"))
        .withColumn("b", F.expr("(255 * match_count) div greatest(source_count, match_count)").cast("int"))
        .withColumn(
            "intersection",
            F.expr("(255 * intersection_raw) div greatest(source_count, match_count)").cast("int"),
        )
        .withColumn("score", F.col("intersection") / F.least("a", "b"))
        .filter(F.col("score") > min_score)
    )
    if excluded_pairs is not None:
        scored = scored.join(excluded_pairs, ["src_id", "dst_id"], "left_anti")
    out = scored.select("src_id", "dst_id", "a", "b", "intersection", "score")
    if (symmetric_halving or changed is not None) and both_directions:
        # mirror: symmetric halving restores the (dst, src) rows; with a
        # changed subset this is the reverse-edge maintenance of
        # index.rs:302-347 (partners get the mirrored overlap row).
        rev = out.select(
            F.col("dst_id").alias("src_id"),
            F.col("src_id").alias("dst_id"),
            F.col("b").alias("a"),
            F.col("a").alias("b"),
            "intersection",
            "score",
        )
        out = out.unionByName(rev)
        if changed is not None:
            out = out.distinct()
    return out


def merge_overlaps(existing: DataFrame, recomputed: DataFrame, changed: DataFrame) -> DataFrame:
    """Replace all overlap rows touching a changed block with the recomputed
    set (the batch equivalent of the reference's per-write set-diff merge,
    index.rs:314-347)."""
    ch = changed.select(F.col("node_id"))
    keep = existing.join(
        F.broadcast(ch.withColumnRenamed("node_id", "src_id")), "src_id", "left_anti"
    ).join(F.broadcast(ch.withColumnRenamed("node_id", "dst_id")), "dst_id", "left_anti")
    return keep.select(recomputed.columns).unionByName(recomputed)
