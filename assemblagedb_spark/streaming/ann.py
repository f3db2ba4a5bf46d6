"""Streaming IVFPQ index maintenance: encode + cell-assign new vectors.

New embedding rows arriving on a stream become (vec_id, subspace, code,
cell) inverted-list rows — the exact layout `operators.pq.ivfpq_adc_topk`
serves — per micro-batch, against FROZEN trained states: codebooks and the
coarse quantizer retrain offline on a schedule, ingest never mutates them
(the production ANN discipline; a drifting codebook would silently corrupt
every previously stored code).

Both steps are stateless projections:

- PQ encoding folds the (m × k) codebook into the row expression
  (`pq.encode_codes_column`) — argmin codes inline, no join, no aggregate;
- coarse-cell assignment is an Arrow-batched matmul against the k × dim
  centroid matrix riding in the task closure (same kernel discipline as
  `similarity._nearest_cells`).

Stateless ⇒ append-mode safe with no watermark or state store, and the
sink can write straight into the cell-partitioned code table (bucketed by
cell at scale — sources/layout.py::write_bucketed), where the serving join
partition-prunes probes. Batch and streaming encode the same rows to the
same codes by construction (pinned by tests/test_streaming_ann.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from assemblagedb_spark.operators.pq import _pq_encode_agg, encode_codes_column
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
    """(vec_id, subspace, code, cell) rows for every arriving vector —
    one projection + one explode, identical codes/cells to the batch
    build (`pq_encode` + `similarity.ivf_assign(centroids=)`)."""
    codes_expr = encode_codes_column(
        codebook, m=m, sub_dim=sub_dim, vec_col=vec_col, scale=scale
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
    return (
        stream.select(
            F.col(id_col).alias("vec_id"),
            cell(F.col(vec_col)).alias("cell"),
            F.posexplode(codes_expr).alias("subspace", "code"),
        )
        .select(
            "vec_id",
            F.col("subspace").cast("long").alias("subspace"),
            "code",
            "cell",
        )
    )
