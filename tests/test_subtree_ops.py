"""Distributed subtree operators: per-root closure, shared-descendant
detection (lib.rs:805-831), ordered-DFS preview (lib.rs:462-509), and
gap-sessionization — cases the DuckDB oracle gate can't cover (cycles,
empty subtrees, duplicate timestamps)."""

from __future__ import annotations

from pyspark.sql import functions as F

from assemblagedb_spark.operators.sessions import sessionize
from assemblagedb_spark.operators.traversal import (
    has_shared_descendants,
    preview_leaf,
    subtree_closure,
)

EDGE_SCHEMA = "parent_id string, child_id string, idx int"


def _edges(spark, rows):
    return spark.createDataFrame(rows, EDGE_SCHEMA)


def _roots(spark, *ids):
    return spark.createDataFrame([(i,) for i in ids], "node_id string")


def test_subtree_closure_cycle_safe(spark):
    # a -> b -> c -> a: closure terminates, each node once, root not re-added
    e = _edges(spark, [("a", "b", 0), ("b", "c", 0), ("c", "a", 0)])
    out = subtree_closure(e, _roots(spark, "a"), max_depth=10)
    rows = {(r.node_id, r.depth) for r in out.collect()}
    assert rows == {("b", 1), ("c", 2)}


def test_subtree_closure_multi_root_membership(spark):
    # shared child s belongs to both roots' subtrees independently
    e = _edges(spark, [("r1", "s", 0), ("r2", "s", 0), ("s", "t", 0)])
    out = subtree_closure(e, _roots(spark, "r1", "r2"), max_depth=3)
    rows = {(r.root_id, r.node_id) for r in out.collect()}
    assert rows == {("r1", "s"), ("r2", "s"), ("r1", "t"), ("r2", "t")}


def test_has_shared_descendants_diamond(spark):
    # diamond: r -> x, r -> y, x -> s, y -> s  (s has two parents)
    e = _edges(
        spark,
        [("r", "x", 0), ("r", "y", 1), ("x", "s", 0), ("y", "s", 0), ("z", "w", 0)],
    )
    out = {
        r.root_id: r.has_shared
        for r in has_shared_descendants(e, _roots(spark, "r", "z", "lone"), max_depth=4).collect()
    }
    assert out == {"r": True, "z": False, "lone": False}


def test_preview_skips_blanks_and_structural_nodes(spark):
    # root -> (p0 childless list, p1 -> [blank t0, text t1]): preview = t1;
    # root2 has only blank leaves -> 'empty'
    e = _edges(
        spark,
        [
            ("root", "p0", 0),
            ("root", "p1", 1),
            ("p1", "t0", 0),
            ("p1", "t1", 1),
            ("root2", "t2", 0),
        ],
    )
    blanks = spark.createDataFrame(
        [("t0", True), ("t1", False), ("t2", True)], "node_id string, is_blank boolean"
    )
    out = {
        r.root_id: r.preview_id
        for r in preview_leaf(e, _roots(spark, "root", "root2"), blanks, max_depth=3).collect()
    }
    assert out == {"root": "t1", "root2": "empty"}


def test_preview_orders_by_path_not_id(spark):
    # child at idx 2 named "a", child at idx 1 named "z": path order wins
    e = _edges(spark, [("r", "a", 2), ("r", "z", 1)])
    blanks = spark.createDataFrame(
        [("a", False), ("z", False)], "node_id string, is_blank boolean"
    )
    out = preview_leaf(e, _roots(spark, "r"), blanks, max_depth=1).collect()
    assert out[0].preview_id == "z"


def test_sessionize_gaps_and_duplicate_ts(spark):
    rows = [
        # user 1: two sessions (gap 100 > 10), duplicate ts stays together
        (1, 1, 0),
        (1, 2, 5),
        (1, 3, 5),
        (1, 4, 200),
        # user 2: one session
        (2, 5, 0),
    ]
    ev = spark.createDataFrame(rows, "user_id int, event_id int, ts long")
    out = {
        (r.user_id, r.session_idx): (r.n_events, r.start_ts, r.end_ts)
        for r in sessionize(ev, gap=10).collect()
    }
    assert out == {
        (1, 1): (3, 0, 5),
        (1, 2): (1, 200, 200),
        (2, 1): (1, 0, 0),
    }
