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
