"""Distributed as-of join (backward, inclusive).

Spark has no native ASOF JOIN; the scalable form is the union-window trick:
tag both sides, union them, and run ONE window pass per key ordered by
(ts, side) with ``last(..., ignorenulls=True)`` carrying the most recent
right-side payload forward onto left rows. Cost: a single shuffle on the
key — no per-key loops, no range self-join blowup, and skew handling comes
from AQE like any other exchange.

Right rows sort before left rows at equal timestamps, so a left row at
exactly t matches a right row at t (inclusive semantics — DuckDB's
``ASOF JOIN ... ON l.ts >= r.ts`` matches, which is the oracle used in the
harness). The payload travels as ONE struct column, which is non-null
whenever a right ROW exists — so a matched row's genuinely NULL field
stays NULL instead of being backfilled from an older right row (the
per-column fill conflated the two; NULL-content sweep finding, round 5).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    ts: str,
    payload: Sequence[str],
    right_tiebreak: Sequence[str] = (),
    tolerance: int | None = None,
) -> DataFrame:
    """For each left row: the right row with the greatest ``ts`` <= left ts
    within the same ``key`` (ties among right rows resolved by
    ``right_tiebreak``, last one wins). Returns all left columns plus the
    right ``payload`` columns (null when no prior right row exists).

    ``tolerance``: maximum allowed ``left_ts - right_ts`` (same unit as the
    ``ts`` column). A match older than the tolerance is nulled out — the
    pandas ``merge_asof(tolerance=...)`` / kdb ``wj`` bound — applied AFTER
    the forward fill, so the plan is unchanged: still one shuffle, one
    window pass."""
    p_struct = F.struct(*[F.col(p) for p in payload]).alias("__p")
    p_type = right.select(p_struct).schema["__p"].dataType
    l_tag = left.select(
        key,
        ts,
        F.lit(1).alias("__side"),
        F.lit(None).cast(p_type).alias("__p"),
        *[F.lit(None).cast(right.schema[t].dataType).alias(f"__tb_{i}") for i, t in enumerate(right_tiebreak)],
        F.struct(*left.columns).alias("__left"),
    )
    r_tag = right.select(
        key,
        ts,
        F.lit(0).alias("__side"),
        p_struct,
        *[F.col(t).alias(f"__tb_{i}") for i, t in enumerate(right_tiebreak)],
        F.lit(None).cast(l_tag.schema["__left"].dataType).alias("__left"),
    )
    order = [F.col(ts).asc(), F.col("__side").asc()] + [
        F.col(f"__tb_{i}").asc_nulls_first() for i in range(len(right_tiebreak))
    ]
    w = Window.partitionBy(key).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    match_ts = F.when(F.col("__side") == 0, F.col(ts))
    filled = l_tag.unionByName(r_tag).select(
        "__side",
        "__left",
        F.col(ts).alias("__l_ts"),
        F.last(match_ts, ignorenulls=True).over(w).alias("__m_ts"),
        F.last("__p", ignorenulls=True).over(w).alias("__f"),
    )
    in_tol = (
        F.lit(True)
        if tolerance is None
        else (F.col("__l_ts") - F.col("__m_ts")) <= tolerance
    )
    return filled.filter(F.col("__side") == 1).select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        *[F.when(in_tol, F.col(f"__f.{p}")).alias(p) for p in payload],
    )
