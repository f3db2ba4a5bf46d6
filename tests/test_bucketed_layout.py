"""Bucketed layout: the 'written bucketed by <key>' dispositions stated in
the operator docstrings must actually elide the exchanges they promise."""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from assemblagedb_spark import harness as h
from assemblagedb_spark.plans.explain import count_exchanges, formatted_plan
from assemblagedb_spark.sources.bucketed import write_bucketed


@pytest.fixture
def drop_tables(spark):
    names: list[str] = []
    yield names
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_bucketed_postings_agg_and_self_join_shuffle_free(
    spark, sf_dir, drop_tables
):
    # grams.py/search.py: "grams table is written partitioned/bucketed by
    # gram" — the per-gram aggregate and the postings self-join (the
    # overlaps candidate machinery) must then need NO exchange at all:
    # the one shuffle of the dedup pipeline is paid once at write time
    g = h._doc_gram_index(spark, sf_dir).filter(F.col("node_id") % 5 == 0)
    drop_tables.append("grams_by_gram")
    t = write_bucketed(g, "grams_by_gram", ["gram"], 8, sort=["gram"])

    agg = t.groupBy("gram").agg(F.sum("occurrences").alias("df"))
    assert count_exchanges(agg) == 0
    assert agg.count() > 0

    a, b = t.alias("a"), t.alias("b")
    join = a.hint("merge").join(b, "gram").filter(
        F.col("a.node_id") < F.col("b.node_id")
    )
    plan = formatted_plan(join)
    assert count_exchanges(join) == 0
    assert "SortMergeJoin" in plan

    # co-located result must equal the shuffled one
    shuffled = (
        g.alias("a").hint("shuffle_hash").join(g.alias("b"), "gram")
        .filter(F.col("a.node_id") < F.col("b.node_id"))
    )
    assert join.count() == shuffled.count()


def test_bucketed_sorted_kv_latest_version_shuffle_and_sort_free(
    spark, sf_dir, drop_tables
):
    # mvcc.py: "with the table bucketed by key the sort is cheap" — with
    # bucketBy(key) the latest-version rank window needs no exchange (the
    # window's sort stays partition-local over pre-grouped buckets)
    kv = h.load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderkey").alias("version"),
        F.col("o_totalprice").alias("value"),
    )
    drop_tables.append("kv_by_key")
    t = write_bucketed(
        kv, "kv_by_key", ["key"], 8, sort=["key", "version"]
    )
    w = Window.partitionBy("key").orderBy(F.desc("version"))
    latest = (
        t.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    )
    assert count_exchanges(latest) == 0
    assert latest.count() == kv.select("key").distinct().count()
