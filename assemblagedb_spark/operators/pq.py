"""Product quantization (PQ) for ANN at memory scale.

The third leg of the ANN stack next to LSH buckets and IVF cells
(similarity.py): split each d-dim vector into ``m`` contiguous subvectors,
train an independent k-means codebook per subspace (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI'11), and store each vector
as ``m`` sub-byte codes — the gated config packs a 64-dim float vector
into 96 bits (~21× compression), which is what lets a 100 TB embedding
table's index live in executor memory.

Querying uses asymmetric distance computation (ADC): the query stays
full-precision, a per-query (m × k) distance table against the codebook is
precomputed ONCE, and each corpus vector's approximate distance is m table
lookups — no float math per corpus row.

Scale shape mirrors the rest of the vector stack: training is the
broadcast-assign/merge-state k-means loop per subspace; encoding is ONE
corpus scan joined to the broadcast codebook; ADC scoring is one scan of
the (vec_id, subspace, code) table against a broadcast distance table with
a (query, vec) partial-sum aggregate. All arithmetic runs on the quantized
integer grid (floor(v * scale)), so codes and ADC scores are bit-identical
on any engine/partitioning — the same oracle-parity discipline as
kmeans_train (vectors.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

def pq_train(
    embeddings: DataFrame,
    *,
    m: int = 8,
    sub_dim: int = 8,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Train ``m`` independent subspace codebooks: subspace s covers
    components [s*sub_dim, (s+1)*sub_dim). Returns the union of per-
    subspace k-means merge states: (subspace, label, pos, sum_q, n_vecs)
    with pos LOCAL to the subspace.

    All m codebooks train in ONE combined Lloyd loop: the corpus explodes
    once into (vec_id, subspace, qvec) and every round is a single
    broadcast-assign scan + a single (subspace, label, pos) merge-state
    groupBy — per-round cost is independent of m (m sequential kmeans
    loops would cost m corpus scans per round). Results are identical to
    independent per-subspace training: subspaces never interact (the
    argmin is per (vec_id, subspace), the state keys on subspace).

    Seeds mirror kmeans_train (vectors.py): label j = j-th lowest vec_id,
    the same k seed vectors in every subspace — deterministic and
    oracle-replayable.
    """
    sub = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {m - 1}), s -> "
                f"transform(slice({vec_col}, s * {sub_dim} + 1, {sub_dim}), "
                f"v -> CAST(floor(CAST(v AS DOUBLE) * {scale}) AS BIGINT)))"
            )
        ).alias("subspace", "qvec"),
    ).withColumn("subspace", F.col("subspace").cast("long")).localCheckpoint(
        eager=True
    )

    seed_ids = [
        r[0]
        for r in embeddings.select(F.col(id_col).alias("vec_id"))
        .orderBy("vec_id").limit(k).collect()
    ]
    id_type = embeddings.schema[id_col].dataType.simpleString()
    seeds = embeddings.sparkSession.createDataFrame(
        [(v, i) for i, v in enumerate(seed_ids)],
        f"vec_id {id_type}, label long",
    )
    state = (
        seeds.join(sub, "vec_id")
        .select("subspace", "label", F.posexplode("qvec").alias("pos", "sum_q"))
        .withColumn("n_vecs", F.lit(1).cast("long"))
        .withColumn("sum_q", F.col("sum_q").cast("long"))
    )

    dist = F.expr(
        "aggregate(zip_with(qvec, cvec, (a, b) -> (a - b) * (a - b)), "
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    for _ in range(iters):
        cent = _codebook_vectors(state)
        assigned = (
            sub.join(F.broadcast(cent), "subspace")
            .select("vec_id", "subspace", "label", dist.alias("dist"))
            .groupBy("vec_id", "subspace")
            .agg(F.min(F.struct("dist", "label")).alias("b"))
            .select("vec_id", "subspace", F.col("b.label").alias("label"))
        )
        state = (
            assigned.join(sub, ["vec_id", "subspace"])
            .select(
                "subspace", "label", F.posexplode("qvec").alias("pos", "qv")
            )
            .groupBy("subspace", "label", "pos")
            .agg(
                F.sum("qv").cast("long").alias("sum_q"),
                F.count(F.lit(1)).cast("long").alias("n_vecs"),
            )
            .localCheckpoint(eager=True)  # ≤ m×k×sub_dim rows
        )
    return state.select(
        "subspace", F.col("label").cast("long").alias("label"),
        F.col("pos").cast("long").alias("pos"), "sum_q", "n_vecs"
    )


def _codebook_vectors(codebook: DataFrame) -> DataFrame:
    """(subspace, label, cvec): integer centroid vectors from merge state."""
    return (
        codebook.groupBy("subspace", "label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "sum_q", "n_vecs"))
            ).alias("comps")
        )
        .select(
            "subspace",
            "label",
            F.expr(
                "transform(comps, c -> CAST(floor(c.sum_q / c.n_vecs) AS BIGINT))"
            ).alias("cvec"),
        )
    )


_ENCODE_LITERAL_MAX_CELLS = 65_536  # m*k codebook entries foldable inline


def _codebook_literal(codebook: DataFrame) -> dict[int, list[list[int]]]:
    """Collect the (m × k × sub_dim) merge state into
    {subspace: [centroid ints per label, label-ascending]} — the codebook
    is bounded tiny by construction (the broadcast side of every PQ join),
    so this collect is the same build-side materialization
    :func:`_codebook_vectors` feeds to the planner."""
    by_sp: dict[int, dict[int, dict[int, int]]] = {}
    for r in codebook.collect():
        by_sp.setdefault(r["subspace"], {}).setdefault(r["label"], {})[
            r["pos"]
        ] = r["sum_q"] // r["n_vecs"]  # floor(sum_q / n_vecs), n_vecs > 0
    # keep REAL label values (an emptied cluster leaves a gap; positional
    # renumbering would emit wrong codes), label-ascending for the
    # deterministic tie-break
    out: dict[int, list[tuple[int, list[int]]]] = {}
    for sp, labels in by_sp.items():
        out[sp] = [
            (l, [labels[l][p] for p in sorted(labels[l])])
            for l in sorted(labels)
        ]
    return out


def pq_encode(
    embeddings: DataFrame,
    codebook: DataFrame,
    *,
    m: int = 8,
    sub_dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Encode every vector as ``m`` codes: (vec_id, subspace, code).

    A pure PROJECTION: the codebook (bounded at m × k rows by
    construction) folds into the encode expression as literals, so each
    row computes its m argmin codes inline — one corpus scan, zero
    shuffle, zero aggregation (the previous explode + groupBy argmin
    moved n·m scored rows through an exchange for the same answer).
    Being stateless, the same expression encodes a STREAM per
    micro-batch (streaming/ann.py). Tie-break: lowest label on equal
    distance — identical to the merge-state argmin and the oracle's
    ``row_number() OVER (ORDER BY dist, label)``.

    Falls back to the broadcast-join + partial-agg plan when the codebook
    exceeds the literal-folding budget (never at sane m·k; the guard is
    for misuse, not scale)."""
    codes_expr = encode_codes_column(
        codebook, m=m, sub_dim=sub_dim, vec_col=vec_col, scale=scale
    )
    if codes_expr is None:
        # oversized codebook, or a subspace with no trained labels (the
        # join path simply emits no code row for it — keep that behavior)
        return _pq_encode_agg(
            embeddings, codebook, m=m, sub_dim=sub_dim,
            id_col=id_col, vec_col=vec_col, scale=scale,
        )
    return embeddings.select(
        F.col(id_col).alias("vec_id"), F.posexplode(codes_expr).alias("subspace", "code")
    ).select("vec_id", F.col("subspace").cast("long").alias("subspace"), "code")


def encode_codes_column(
    codebook: DataFrame,
    *,
    m: int = 8,
    sub_dim: int = 8,
    vec_col: str = "embedding",
    scale: int = 1000,
):
    """The literal-folded encode expression: an ``array<bigint>`` of the
    row's m argmin codes (index = subspace). Stateless, so it encodes a
    STREAM per micro-batch unchanged (streaming/ann.py). Returns ``None``
    when the codebook exceeds the literal budget or a subspace trained no
    labels — callers fall back to :func:`_pq_encode_agg`."""
    cb = _codebook_literal(codebook)
    n_cells = sum(len(v) for v in cb.values())
    if n_cells > _ENCODE_LITERAL_MAX_CELLS or any(
        not cb.get(sp) for sp in range(m)
    ):
        return None
    per_subspace = []
    for sp in range(m):
        dists = ", ".join(
            f"named_struct('dist', aggregate(zip_with("
            f"transform(slice({vec_col}, {sp * sub_dim} + 1, {sub_dim}), "
            f"v -> CAST(floor(CAST(v AS DOUBLE) * {scale}) AS BIGINT)), "
            f"array({', '.join(f'CAST({c} AS BIGINT)' for c in cvec)}), "
            f"(a, b) -> (a - b) * (a - b)), CAST(0 AS BIGINT), "
            f"(acc, x) -> acc + x), 'label', CAST({label} AS BIGINT))"
            for label, cvec in cb[sp]
        )
        per_subspace.append(f"array_min(array({dists})).label")
    return F.expr(f"array({', '.join(per_subspace)})")


def _pq_encode_agg(
    embeddings: DataFrame,
    codebook: DataFrame,
    *,
    m: int,
    sub_dim: int,
    id_col: str,
    vec_col: str,
    scale: int,
) -> DataFrame:
    """Broadcast-join + argmin-aggregate encode (the pre-literal plan,
    kept as the oversized-codebook fallback and the parity reference)."""
    sub = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {m - 1}), s -> "
                f"transform(slice({vec_col}, s * {sub_dim} + 1, {sub_dim}), "
                f"v -> CAST(floor(CAST(v AS DOUBLE) * {scale}) AS BIGINT)))"
            )
        ).alias("subspace", "qvec"),
    ).withColumn("subspace", F.col("subspace").cast("long"))
    cent = _codebook_vectors(codebook)
    dist = F.expr(
        "aggregate(zip_with(qvec, cvec, (a, b) -> (a - b) * (a - b)), "
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    scored = (
        sub.join(F.broadcast(cent), "subspace")
        .select("vec_id", "subspace", "label", dist.alias("dist"))
    )
    best = scored.groupBy("vec_id", "subspace").agg(
        F.min(F.struct("dist", "label")).alias("b")
    )
    return best.select(
        "vec_id", "subspace", F.col("b.label").cast("long").alias("code")
    )


def _adc_distance_table(
    codebook: DataFrame,
    queries: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    m: int,
    sub_dim: int,
    scale: int,
) -> DataFrame:
    """(query_id, subspace, code, d): each query's integer squared distance
    to every subspace centroid — the |Q| × m × k ADC lookup table, the
    broadcast side of every PQ serving join."""
    qsub = queries.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {m - 1}), s -> "
                f"transform(slice({vec_col}, s * {sub_dim} + 1, {sub_dim}), "
                f"v -> CAST(floor(CAST(v AS DOUBLE) * {scale}) AS BIGINT)))"
            )
        ).alias("subspace", "qvec"),
    ).withColumn("subspace", F.col("subspace").cast("long"))
    cent = _codebook_vectors(codebook)
    dist = F.expr(
        "aggregate(zip_with(qvec, cvec, (a, b) -> (a - b) * (a - b)), "
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    return qsub.join(F.broadcast(cent), "subspace").select(
        "query_id", "subspace", F.col("label").alias("code"), dist.alias("d")
    )


def _adc_rank(scored: DataFrame, k: int) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "adc_dist",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def pq_adc_topk(
    codes: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    sub_dim: int = 8,
    scale: int = 1000,
) -> DataFrame:
    """Asymmetric-distance top-k: per query, distances to each subspace
    centroid are computed once (|Q| × m × k rows, broadcast); each corpus
    vector's approximate squared distance is the sum of its m code lookups.

    Output: (query_id, neighbor_id, adc_dist, rank) — rank 1 = nearest,
    self excluded, ties broken by ascending neighbor id. The scan of the
    code table is the only big input; scoring shuffles (query, vec) partial
    sums, never raw vectors."""
    dtable = _adc_distance_table(
        codebook, queries, id_col=id_col, vec_col=vec_col,
        m=m, sub_dim=sub_dim, scale=scale,
    )
    scored = (
        codes.join(F.broadcast(dtable), ["subspace", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").cast("long").alias("adc_dist"))
    )
    return _adc_rank(scored, k)


def ivfpq_adc_topk(
    cell_codes: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    probes: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    sub_dim: int = 8,
    scale: int = 1000,
) -> DataFrame:
    """IVFADC serving (Jégou et al. TPAMI'11 §V: coarse quantizer +
    per-cell PQ codes — the FAISS ``IVFPQ`` layout): each query ADC-scores
    ONLY the vectors whose coarse cell it probes, instead of the whole code
    table.

    ``cell_codes``: (vec_id, subspace, code, cell) — the PQ code table
    carrying each vector's coarse-cell assignment, i.e. the inverted lists.
    At scale this relation is written partitioned/bucketed BY CELL, so a
    probe touches only its cells' files (partition pruning); the query-side
    join below keeps that shape — the big table is scanned, never shuffled.
    ``probes``: (q_id, cell) — each query's nprobe nearest cells
    (:func:`assemblagedb_spark.operators.similarity.ivf_probes`).

    Per-scan work is Σ_q Σ_{probed cells} |cell| · m code lookups — the
    nprobe/nlist fraction of :func:`pq_adc_topk` — with the same exact
    integer arithmetic, self-exclusion and (adc_dist, neighbor_id) tie
    order. A corpus vector appears in exactly one cell, so no distinct is
    needed on the candidate pairs."""
    dtable = _adc_distance_table(
        codebook, queries, id_col=id_col, vec_col=vec_col,
        m=m, sub_dim=sub_dim, scale=scale,
    )
    scored = (
        cell_codes.join(
            F.broadcast(probes.withColumnRenamed("q_id", "query_id")), "cell"
        )
        .join(F.broadcast(dtable), ["query_id", "subspace", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").cast("long").alias("adc_dist"))
    )
    return _adc_rank(scored, k)
