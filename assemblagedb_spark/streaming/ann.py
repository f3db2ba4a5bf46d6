"""Streaming IVFPQ index maintenance: encode + cell-assign new vectors.

New embedding rows arriving on a stream become (vec_id, subspace, code,
cell) RESIDUAL inverted-list rows — the exact layout
`operators.pq.ivfpq_adc_topk_residual` serves — per micro-batch, against
FROZEN trained states: residual codebooks and the coarse quantizer
retrain offline on a schedule, ingest never mutates them (the production
ANN discipline; a drifting codebook would silently corrupt every
previously stored code).

All steps are stateless projections:

- coarse-cell assignment is an Arrow-batched matmul against the k × dim
  centroid matrix riding in the task closure (same kernel discipline as
  `similarity._nearest_cells`);
- the residual rvec = floor(v·scale) − ccent[cell] folds the integer
  coarse centroids in as a map literal (k × dim ints — tiny);
- PQ encoding folds the (m × k) residual codebook into the row
  expression (`pq.encode_codes_column` with ``scale=None``) — argmin
  codes inline, no join, no aggregate.

Stateless ⇒ append-mode safe with no watermark or state store, and the
sink can write straight into the cell-partitioned code table (bucketed by
cell at scale — sources/layout.py::write_bucketed), where the serving join
partition-prunes probes. Batch and streaming encode the same rows to the
same codes by construction (pinned by tests/test_streaming_ann.py, and
gate-checked against the DuckDB oracle via `streaming_ivfpq_ingest`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from assemblagedb_spark.operators.pq import (
    _codebook_literal,
    _pq_encode_agg,
    encode_codes_column,
)
from assemblagedb_spark.operators.similarity import centroid_matrix


def _cell_udf(cents):
    """Nearest trained cell per vector (cosine desc, cell asc on ties) —
    the n=1 case of similarity._nearest_cells, returned as a scalar."""
    cent_ids, CM, cnorm = cents

    @pandas_udf("bigint")
    def cell(v: pd.Series) -> pd.Series:
        V = np.stack([np.asarray(x, dtype=np.float64) for x in v.values])
        cos = (V @ CM.T) / np.outer(np.sqrt((V * V).sum(1)), cnorm)
        out = [int(cent_ids[np.lexsort((cent_ids, -row))[0]]) for row in cos]
        return pd.Series(out)

    return cell


def _coarse_map_sql(centroids: DataFrame) -> str:
    """SQL map literal cell -> integer centroid array, from a kmeans_train
    merge state (floor(sum_q / n_vecs) per component — the same grid
    `pq.coarse_centroid_vectors` emits). k × dim ints: tiny by
    construction, folded into the projection so the stream joins
    nothing."""
    by_label: dict[int, dict[int, int]] = {}
    for r in centroids.collect():
        # python // floors toward -inf for negative sums, same as the
        # engines' floor(sum_q / n_vecs)
        by_label.setdefault(r["label"], {})[r["pos"]] = (
            r["sum_q"] // r["n_vecs"]
        )
    entries = []
    for label in sorted(by_label):
        comps = by_label[label]
        arr = ", ".join(
            f"CAST({comps[p]} AS BIGINT)" for p in sorted(comps)
        )
        entries.append(f"CAST({label} AS BIGINT), array({arr})")
    return f"map({', '.join(entries)})"


def ivfpq_ingest(
    stream: DataFrame,
    codebook: DataFrame,
    centroids: DataFrame,
    *,
    m: int = 8,
    sub_dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """(vec_id, subspace, code, cell) RESIDUAL inverted-list rows for
    every arriving vector — assign the coarse cell, residualize against
    that cell's integer centroid, encode with the frozen residual
    ``codebook``; identical rows to the batch build
    (`pq.residual_vectors` + `pq.pq_encode(..., scale=None)` over
    `similarity.ivf_assign(centroids=)`). One projection chain + one
    explode: zero exchanges, append-mode safe."""
    # ONE codebook collect serves both the never-trained check and the
    # encode literal (an eager count() job here would block the streaming
    # setup path for information the literal already carries)
    cb = _codebook_literal(codebook)
    if not cb:
        # NEVER-trained states (empty offline corpus): nothing can be
        # encoded or cell-assigned — an empty streaming projection with
        # the output schema (still a stream transformation, append-safe)
        return stream.select(
            F.col(id_col).alias("vec_id"),
            F.lit(None).cast("long").alias("subspace"),
            F.lit(None).cast("long").alias("code"),
            F.lit(None).cast("long").alias("cell"),
        ).where(F.lit(False))
    codes_expr = encode_codes_column(
        codebook, m=m, sub_dim=sub_dim, vec_col="rvec", scale=None,
        literal=cb,
    )
    if codes_expr is None:
        raise ValueError(
            "ivfpq_ingest needs a literal-foldable codebook (every "
            "subspace trained, m*k within the literal budget): the "
            "aggregate fallback is a streaming aggregation, which is not "
            "append-mode ingest. Retrain the codebook or encode in batch "
            f"via {_pq_encode_agg.__name__}."
        )
    cell = _cell_udf(centroid_matrix(centroids, scale=scale))
    cmap = _coarse_map_sql(centroids)
    # NULL vectors ingest nothing (same exclusion as the batch build) —
    # a plain filter, so the stream stays append-mode stateless
    stream = stream.filter(F.col(vec_col).isNotNull())
    rvec = (
        f"zip_with(transform({vec_col}, v -> "
        f"CAST(floor(CAST(v AS DOUBLE) * {scale}) AS BIGINT)), "
        f"element_at({cmap}, cell), (a, b) -> a - b)"
    )
    return (
        stream.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col),
            cell(F.col(vec_col)).alias("cell"),
        )
        .withColumn("rvec", F.expr(rvec))
        .select(
            "vec_id",
            "cell",
            F.posexplode(codes_expr).alias("subspace", "code"),
        )
        .select(
            "vec_id",
            F.col("subspace").cast("long").alias("subspace"),
            "code",
            "cell",
        )
    )
