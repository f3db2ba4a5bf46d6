"""Bucketed layout: the co-located join must be exchange-free.

The 100 TB argument in executable form — two tables bucketed on the join
key, sorted within buckets, joined with broadcast disabled: the plan must
contain zero Exchange nodes (and no Sort for the sorted case)."""

from __future__ import annotations

import pytest

from assemblagedb_spark.plans.explain import count_exchanges, formatted_plan
from assemblagedb_spark.sources.layout import drop_table, write_bucketed


@pytest.fixture
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_no_exchange(spark, tmp_path, no_broadcast):
    edges = spark.createDataFrame(
        [(f"p{i % 7}", f"c{i}", i) for i in range(100)],
        "parent_id string, child_id string, idx int",
    )
    try:
        write_bucketed(
            edges, "t_edges_a", str(tmp_path / "ea"),
            buckets=4, key_cols=["parent_id"], sort_cols=["parent_id"],
        )
        write_bucketed(
            edges, "t_edges_b", str(tmp_path / "eb"),
            buckets=4, key_cols=["parent_id"], sort_cols=["parent_id"],
        )
        a = spark.table("t_edges_a")
        b = (
            spark.table("t_edges_b")
            .select("parent_id", "child_id")
            .withColumnRenamed("child_id", "other_child")
        )
        joined = a.join(b, "parent_id")
        plan = formatted_plan(joined)
        assert count_exchanges(joined) == 0, plan
        assert joined.count() == 2 * 15 * 15 + 5 * 14 * 14
    finally:
        drop_table(spark, "t_edges_a")
        drop_table(spark, "t_edges_b")


def test_unbucketed_join_needs_exchanges(spark, no_broadcast):
    # control: the same join without bucketing shuffles both sides
    edges = spark.createDataFrame(
        [(f"p{i % 7}", f"c{i}", i) for i in range(100)],
        "parent_id string, child_id string, idx int",
    )
    joined = edges.join(
        edges.withColumnRenamed("child_id", "other_child"), "parent_id"
    )
    assert count_exchanges(joined) == 2
