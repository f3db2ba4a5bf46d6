"""Skew-mitigation operators: salted equi-join and two-phase aggregation.

At 100 TB a handful of hot keys (the empty document, a viral node id, a
default timestamp) can put one shuffle partition hours behind the rest. AQE's
skew-join split (enabled in session.py) handles moderate skew at runtime;
these operators are the explicit form for the pathological case AQE can't
fix: a single key larger than an executor.

Design: classic salting. The build side is replicated ``salt`` times with an
explicit salt column; the probe side routes each row to one deterministic
salt bucket. The join key becomes (key, salt), spreading a hot key over
``salt`` reducers. Results are bit-identical to the unsalted join — salting
only changes routing — and the salt is derived from stable row content
(xxhash64 of the probe row's columns), never from rand(), so runs are
reproducible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

SALT = "__salt"


def salted_equijoin(
    probe: DataFrame,
    build: DataFrame,
    keys: Sequence[str],
    *,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``probe ⋈ build`` on ``keys`` with the probe side's hot keys
    spread over ``salt`` buckets.

    ``build`` (the smaller relation, but too big or too mutable to
    broadcast) is replicated ``salt`` times — its shuffle volume multiplies
    by ``salt``, the price of splitting the probe side's hot keys. Use when
    probe skew dominates: probe rows hash to a deterministic bucket via
    xxhash64 over ALL probe columns, so a key with N rows lands in
    min(N, salt) buckets of ~N/salt rows each.

    ``how`` is restricted to inner/left/left_semi/left_anti: with a right or
    full outer join every unmatched BUILD row would surface once per salt
    replica, breaking the bit-identical guarantee.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "semi",
               "left_semi", "leftsemi", "anti", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_equijoin: how={how!r} would replicate unmatched build "
            f"rows across salt buckets; use one of {sorted(allowed)}"
        )
    keys = list(keys)
    non_key = [c for c in probe.columns if c not in keys]
    p = probe.withColumn(
        SALT, F.pmod(F.xxhash64(*[F.col(c) for c in non_key] or [F.lit(0)]), F.lit(salt)).cast("int")
    )
    b = build.withColumn(SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return p.join(b, keys + [SALT], how).drop(SALT)


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    *,
    salt: int = 16,
) -> DataFrame:
    """Aggregation with an explicit pre-shuffle partial phase on a salted
    key: ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max}.

    Spark's hash aggregate already map-side-combines, but a hot key still
    funnels all its partial rows to ONE reducer; salting the partial phase
    caps any reducer's input at ~n_partitions × salt rows per key. The
    second phase re-aggregates the ≤ salt partials per key — negligible.
    """
    keys = list(keys)
    partial_fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    final_fns = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    salted = df.withColumn(
        SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt)).cast("int"),
    )
    partial = salted.groupBy(*keys, SALT).agg(
        *[partial_fns[fn](col).alias(out) for out, (col, fn) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[final_fns[fn](out).alias(out) for out, (col, fn) in aggs.items()]
    )
