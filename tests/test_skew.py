"""Skew operators: salted join / two-phase agg must be result-identical to
their unsalted forms (salting only changes routing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from assemblagedb_spark.operators.skew import salted_equijoin, two_phase_agg


def test_salted_equijoin_matches_plain_join(spark):
    # one pathologically hot key (90% of probe rows) + normal keys
    probe = spark.createDataFrame(
        [(1, i) for i in range(900)] + [(k, k * 10) for k in range(2, 12)],
        "k int, v int",
    )
    build = spark.createDataFrame(
        [(1, "hot"), (2, "a"), (3, "b"), (99, "unmatched")], "k string, name string"
    ).withColumn("k", F.col("k").cast("int"))
    got = salted_equijoin(probe, build, ["k"], salt=8)
    want = probe.join(build, ["k"])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_equijoin_spreads_hot_key(spark):
    probe = spark.createDataFrame([(1, i) for i in range(1000)], "k int, v int")
    build = spark.createDataFrame([(1, "x")], "k int, name string")
    from assemblagedb_spark.operators.skew import SALT

    p = probe.withColumn(
        SALT, F.pmod(F.xxhash64("v"), F.lit(8)).cast("int")
    )
    n_buckets = p.select(SALT).distinct().count()
    assert n_buckets == 8  # the hot key's rows really fan out


def test_two_phase_agg_matches_direct(spark):
    df = spark.createDataFrame(
        [(i % 3, float(i)) for i in range(1000)], "k int, x double"
    )
    got = two_phase_agg(
        df, ["k"], {"n": ("x", "count"), "tot": ("x", "sum"), "mx": ("x", "max")},
        salt=8,
    )
    want = df.groupBy("k").agg(
        F.count("x").alias("n"), F.sum("x").alias("tot"), F.max("x").alias("mx")
    )
    g = {r["k"]: (r["n"], r["tot"], r["mx"]) for r in got.collect()}
    w = {r["k"]: (r["n"], r["tot"], r["mx"]) for r in want.collect()}
    assert g == w
