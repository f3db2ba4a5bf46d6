"""Distributed vector aggregation over embedding columns.

Centroids (per-label mean vectors) are the building block for IVF index
training, cluster drift monitoring, and class-prototype dedup. At scale the
only viable plan is dimension-exploded aggregation: posexplode the
``array<float>`` into (label, pos, value) and run ONE groupBy — map-side
partial sums mean each executor contributes m*dim rows no matter how many
vectors it scanned. Driver never sees a vector.

Sums are integer-quantized (``floor(value * scale)`` on the float64
promotion of the float32 input) so the compared state is exact: float
summation ORDER is engine- and partitioning-dependent, integers commute.
The float centroid is ``sum_q / (scale * n)`` — caller-side, like any
fixed-point store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def label_centroids(
    embeddings: DataFrame,
    *,
    label_col: str = "label",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """(label, pos, sum_q, n_vecs): quantized component sums + counts per
    label — the exact merge state of a distributed mean."""
    return (
        embeddings.select(
            F.col(label_col).alias("label"),
            F.posexplode(vec_col).alias("pos", "v"),
        )
        .groupBy("label", "pos")
        .agg(
            F.sum(F.floor(F.col("v").cast("double") * scale))
            .cast("long")
            .alias("sum_q"),
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
        )
    )


def centroid_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Nearest-centroid assignment (one k-means E-step): broadcast the
    (tiny) centroid table, compute quantized squared distance per pair with
    a zip_with fold, keep the argmin.

    Distance is on the quantized integer grid (sum of (q_i - c_q_i)^2 with
    c_q_i = floor(sum_q / n_vecs) per component) — deterministic tie-break
    on centroid label. The corpus is scanned once, never shuffled (the
    argmin is a per-row reduce over the broadcast list).
    """
    cent = (
        centroids.groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "sum_q", "n_vecs"))
            ).alias("comps")
        )
        .select(
            "label",
            F.expr(
                "transform(comps, c -> CAST(floor(c.sum_q / c.n_vecs) AS BIGINT))"
            ).alias("cvec"),
        )
    )
    pairs = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.expr("transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT))").alias(
            "qvec"
        ),
    ).crossJoin(F.broadcast(cent))
    dist = F.expr(
        "aggregate(zip_with(qvec, cvec, (a, b) -> (a - b) * (a - b)), "
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    scored = pairs.select("vec_id", "label", dist.alias("dist"))
    best = scored.groupBy("vec_id").agg(
        F.min(F.struct("dist", "label")).alias("b")
    )
    return best.select(
        "vec_id", F.col("b.label").alias("label"), F.col("b.dist").alias("dist")
    )
