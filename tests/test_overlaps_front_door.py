"""store_overlaps front door (round-9, verdict #3): one entry point for
materialized overlaps that dispatches the physical strategy by measured
corpus density. The pins here are the two properties the front door must
never lose:

1. ROUTE INVARIANCE — every route (dense matrix, sparse CSR kernel,
   distributed prefix plan, changed-restricted incremental) returns the
   SAME exact relation on the same input. Exactness is the reference's
   contract (index.rs:302-347); the route is only a physical choice.
2. DISPATCH VACUITY — the dispatcher actually takes different branches as
   the corpus density crosses the budgets (a front door that always picks
   one branch is decoration).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from assemblagedb_spark import harness as h
from assemblagedb_spark.operators.overlaps import (
    overlap_pairs,
    overlap_pairs_prefix,
    overlap_pairs_sparse,
    store_overlaps,
)


def _frame(df):
    pdf = df.toPandas()
    for c in ("score",):
        pdf[c] = pdf[c].round(9)
    return pdf[sorted(pdf.columns)].sort_values(
        by=sorted(pdf.columns), ignore_index=True
    )


@pytest.fixture(scope="module")
def grams(spark, sf_dir):
    g = h._doc_gram_index(spark, sf_dir).filter(F.col("node_id") % 10 == 0)
    g = g.localCheckpoint(eager=True)
    yield g


def test_route_invariance(spark, grams):
    counts = h.gram_counts(grams)
    routes = {}
    frames = {}
    for name, kwargs in (
        ("dense", {}),
        ("sparse", {"max_dense_cells": 0}),
        ("prefix", {"max_dense_cells": 0, "max_sparse_nnz": 0}),
    ):
        disp = {}
        out = store_overlaps(grams, counts, dispatch_out=disp, **kwargs)
        routes[name] = disp["route"]
        frames[name] = _frame(out)
    assert routes == {"dense": "dense", "sparse": "sparse", "prefix": "prefix"}
    assert len(frames["dense"]) > 0, "vacuous fixture: no overlapping pairs"
    pd.testing.assert_frame_equal(frames["dense"], frames["sparse"])
    pd.testing.assert_frame_equal(frames["dense"], frames["prefix"])
    # and all three equal the naive reference plan (overlap_pairs)
    naive = _frame(
        overlap_pairs(grams, counts).select(
            "src_id", "dst_id", "a", "b", "intersection", "score"
        )
    )
    pd.testing.assert_frame_equal(frames["dense"], naive)


def test_route_invariance_changed(spark, grams):
    counts = h.gram_counts(grams)
    changed = grams.select("node_id").filter(F.col("node_id") % 20 == 0).distinct()
    outs = {}
    for name, kwargs in (
        ("dense", {}),
        ("sparse", {"max_dense_cells": 0}),
        ("sparse-incremental", {"max_dense_cells": 0, "max_sparse_nnz": 0}),
    ):
        disp = {}
        out = store_overlaps(
            grams, counts, changed=changed, dispatch_out=disp, **kwargs
        )
        assert disp["route"] == name
        outs[name] = _frame(out)
    assert len(outs["dense"]) > 0
    pd.testing.assert_frame_equal(outs["dense"], outs["sparse"])
    pd.testing.assert_frame_equal(outs["dense"], outs["sparse-incremental"])


def test_exclusion_applied_on_every_route(spark, grams):
    # exclusion is ORIENTATION-EXACT and route-invariant: excluding one
    # (src, dst) removes exactly that orientation on every route — the
    # mirror row survives (the kernels differ in which orientation they
    # compute first, so a kernel-side anti-join would be route-sensitive;
    # the front door applies it post-kernel, uniformly)
    counts = h.gram_counts(grams)
    base = store_overlaps(grams, counts)
    one = base.limit(1).collect()
    assert one, "vacuous: nothing to exclude"
    s, d = one[0]["src_id"], one[0]["dst_id"]
    excl = spark.createDataFrame([(s, d)], "src_id long, dst_id long")
    mirror = spark.createDataFrame([(d, s)], "src_id long, dst_id long")
    for kwargs in ({}, {"max_dense_cells": 0}, {"max_dense_cells": 0, "max_sparse_nnz": 0}):
        out = store_overlaps(grams, counts, excluded_pairs=excl, **kwargs)
        assert out.join(excl, ["src_id", "dst_id"]).count() == 0
        assert out.join(mirror, ["src_id", "dst_id"]).count() == 1


def test_changed_single_direction_and_exclusion_are_route_invariant(spark, grams):
    # the post-kernel branch COMBINATIONS on the incremental path: with a
    # changed set, both_directions=False must keep exactly the
    # changed-side orientation (the broadcast semi-join branch, otherwise
    # untested) and exclusion must stay orientation-exact — on every
    # route that accepts a changed set
    counts = h.gram_counts(grams)
    changed = grams.select("node_id").filter(F.col("node_id") % 20 == 0).distinct()
    ch_ids = {r["node_id"] for r in changed.collect()}
    base = store_overlaps(grams, counts, changed=changed)
    # pick an excluded pair the single-direction filter would KEEP (src in
    # changed), so the exclusion assertion below is non-vacuous
    one = base.join(
        changed.withColumnRenamed("node_id", "src_id"), "src_id"
    ).limit(1).collect()
    assert one, "vacuous fixture"
    s, d = one[0]["src_id"], one[0]["dst_id"]
    excl = spark.createDataFrame([(s, d)], "src_id long, dst_id long")
    frames = {}
    for name, kwargs in (
        ("dense", {}),
        ("sparse", {"max_dense_cells": 0}),
        ("sparse-incremental", {"max_dense_cells": 0, "max_sparse_nnz": 0}),
    ):
        out = store_overlaps(
            grams, counts, changed=changed, both_directions=False,
            excluded_pairs=excl, **kwargs,
        )
        rows = out.collect()
        assert all(r["src_id"] in ch_ids for r in rows), name
        assert all((r["src_id"], r["dst_id"]) != (s, d) for r in rows), name
        frames[name] = _frame(out)
    assert len(frames["dense"]) > 0
    pd.testing.assert_frame_equal(frames["dense"], frames["sparse"])
    pd.testing.assert_frame_equal(frames["dense"], frames["sparse-incremental"])


def test_single_direction_is_route_invariant(spark, grams):
    # both_directions=False returns the SAME canonical half (src < dst)
    # on every route, even though dense/sparse kernels natively emit both
    counts = h.gram_counts(grams)
    frames = {}
    for name, kwargs in (
        ("dense", {}),
        ("sparse", {"max_dense_cells": 0}),
        ("prefix", {"max_dense_cells": 0, "max_sparse_nnz": 0}),
    ):
        out = store_overlaps(grams, counts, both_directions=False, **kwargs)
        assert out.filter(F.col("src_id") >= F.col("dst_id")).count() == 0
        frames[name] = _frame(out)
    assert len(frames["dense"]) > 0
    pd.testing.assert_frame_equal(frames["dense"], frames["sparse"])
    pd.testing.assert_frame_equal(frames["dense"], frames["prefix"])


def test_sparse_kernel_multiset_exactness(spark):
    # hand fixture with occurrences > 1: the (gram, copy) expansion must
    # reproduce the MULTISET intersection, not the set one. Blocks:
    # A = {g1 x3, g2 x1}, B = {g1 x2, g3 x2} -> inter_raw = min(3,2) = 2,
    # counts 4/4 -> a = b = 255, intersection = 127, score = 127/255 ≈ 0.498
    # (fails 0.5); C = {g1 x3, g2 x1} duplicate of A -> score 1.0 passes.
    rows = [
        (1, 100, 3), (1, 200, 1),
        (2, 100, 2), (2, 300, 2),
        (3, 100, 3), (3, 200, 1),
    ]
    g = spark.createDataFrame(rows, "node_id long, gram long, occurrences long")
    out = overlap_pairs_sparse(g)
    assert out is not None
    got = {(r["src_id"], r["dst_id"]): r for r in out.collect()}
    assert set(got) == {(1, 3), (3, 1)}
    assert got[(1, 3)]["intersection"] == 255 and got[(1, 3)]["score"] == 1.0
    # prefix plan agrees on the same fixture
    pf = {
        (r["src_id"], r["dst_id"]): r
        for r in overlap_pairs_prefix(g).collect()
    }
    assert set(pf) == set(got)


def test_dispatcher_budget_is_density_not_rowcount(spark, grams):
    # the dense budget is blocks x vocab cells: the SAME postings with the
    # cell budget shrunk below the fixture's footprint must route away
    # from dense without changing results — i.e. the dispatch reads the
    # stats aggregate, not a hardcoded branch
    counts = h.gram_counts(grams)
    stats = grams.agg(
        F.countDistinct("gram").alias("v"),
        F.countDistinct("node_id").alias("b"),
    ).collect()[0]
    cells = stats["v"] * stats["b"]
    disp = {}
    store_overlaps(grams, counts, max_dense_cells=cells - 1, dispatch_out=disp)
    assert disp["route"] != "dense"
    disp2 = {}
    store_overlaps(grams, counts, max_dense_cells=cells, dispatch_out=disp2)
    assert disp2["route"] == "dense"
