"""Connected components via label propagation — the GraphX-style analytics
layer over the engine's edge relation (BASELINE.json north star: "GraphX for
analytics queries", re-expressed as DataFrame rounds).

Each round every node takes the min label in its closed neighborhood; after
``rounds`` ≥ graph diameter the labels are exactly the per-component minimum
node id (classic synchronous label propagation — the Pregel loop GraphX
ships, as a join + aggregate per round).

Scale design: per round the work is ONE |E| join + one |V| aggregate — no
transitive closure is ever materialized, so hub nodes cause no row
explosion. Labels ride the same key partitioning every round (Spark reuses
the exchange). For graphs whose diameter is unknown or large, swap the
fixed-round loop for convergence probing (count changed labels per round)
or the large-star/small-star alternating algorithm — same per-round shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def label_propagation_components(
    edges: DataFrame,
    *,
    rounds: int,
    directed: bool = False,
) -> DataFrame:
    """(node_id, component) with component = min node id reachable within
    ``rounds`` hops — the exact component id once ``rounds`` ≥ diameter.

    ``edges``: (parent_id, child_id); treated as undirected unless
    ``directed`` (components of the underlying undirected graph is the
    standard CC semantics).
    """
    fwd = edges.select(
        F.col("parent_id").alias("src"), F.col("child_id").alias("dst")
    )
    und = fwd if directed else fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    und = und.distinct().persist()
    labels = (
        und.select(F.col("src").alias("node_id"))
        .distinct()
        .withColumn("component", F.col("node_id"))
    )
    for r in range(rounds):
        neigh = (
            und.join(
                labels.select(
                    F.col("node_id").alias("dst"), F.col("component").alias("nl")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nl").alias("nl"))
            .withColumnRenamed("src", "node_id")
        )
        labels = (
            labels.join(neigh, "node_id", "left")
            .select(
                "node_id",
                F.least(
                    "component", F.coalesce("nl", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)  # one round computed once; lineage flat
        )
    und.unpersist()
    return labels


def pagerank_rounds(
    edges: DataFrame,
    *,
    rounds: int,
    scale: int = 1_000_000,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-point integer PageRank: ``rounds`` synchronous iterations with
    ranks held as BIGINT multiples of 1/``scale`` and integer-division
    contributions — every engine computes bit-identical ranks (no float
    summation order), which is what makes the result oracle-comparable.

    Per round: one |E| join (contribution = rank div out-degree), one |V|
    aggregate — same shuffle shape as the Pregel PageRank GraphX ships.
    Dangling mass is dropped (nodes with no outgoing edges contribute
    nothing), the common simplification for bounded-round analytics.
    """
    e = edges.select(
        F.col("parent_id").alias("src"), F.col("child_id").alias("dst")
    ).distinct().persist()
    nodes = (
        e.select(F.col("src").alias("node_id"))
        .unionByName(e.select(F.col("dst").alias("node_id")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    base = (100 - damping_pct) * scale // 100
    ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    for _ in range(rounds):
        contrib = (
            e.join(ranks.withColumnRenamed("node_id", "src"), "src")
            .join(outdeg, "src")
            .select("dst", F.expr("rank div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
            .withColumnRenamed("dst", "node_id")
        )
        ranks = (
            nodes.join(contrib, "node_id", "left")
            .select(
                "node_id",
                (
                    F.lit(base)
                    + F.expr(f"({damping_pct} * coalesce(in_sum, 0)) div 100")
                ).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    return ranks
