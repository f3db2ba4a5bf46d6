"""Table profiler, funnel stages, cohort retention."""

from __future__ import annotations

import datetime as dt

from assemblagedb_spark.operators.funnel import cohort_retention, funnel_stages
from assemblagedb_spark.operators.profile import table_profile


def test_table_profile_counts_and_extremes(spark):
    df = spark.createDataFrame(
        [(1, 2.5, "b", None), (2, None, "a", None), (None, 0.1, "a", None)],
        "k long, v double, s string, ts timestamp",
    )
    p = {r["col_name"]: r for r in table_profile(df).collect()}
    assert p["k"]["n_rows"] == 3
    assert p["k"]["n_nulls"] == 1 and p["k"]["n_distinct"] == 2
    assert (p["k"]["min_num"], p["k"]["max_num"]) == (100, 200)
    assert (p["v"]["min_num"], p["v"]["max_num"]) == (10, 250)  # floor(x*100)
    assert (p["s"]["min_str"], p["s"]["max_str"]) == ("a", "b")
    assert p["s"]["min_num"] is None
    assert p["ts"]["n_nulls"] == 3 and p["ts"]["min_num"] is None


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, event_type string, ts long")


def test_funnel_stages_strict_ordering(spark):
    ev = _ev(spark, [
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),   # full
        (2, "click", 5), (2, "view", 10), (2, "purchase", 20),    # click BEFORE view
        (3, "view", 10),                                          # stalls at 1
        (4, "purchase", 1), (4, "view", 2), (4, "click", 3),      # purchase too early
    ])
    out = {r["user_id"]: r for r in
           funnel_stages(ev, ["view", "click", "purchase"]).collect()}
    assert out[1]["funnel_stage"] == 3 and (out[1]["t_1"], out[1]["t_2"], out[1]["t_3"]) == (10, 20, 30)
    assert out[2]["funnel_stage"] == 1  # only click precedes the first view
    assert out[3]["funnel_stage"] == 1 and out[3]["t_2"] is None
    assert out[4]["funnel_stage"] == 2 and out[4]["t_3"] is None


def test_funnel_user2_click_before_view_blocks_stage2(spark):
    ev = _ev(spark, [(2, "click", 5), (2, "view", 10), (2, "purchase", 20)])
    r = funnel_stages(ev, ["view", "click", "purchase"]).first()
    # the only click precedes the first view -> stage 2 never reached
    assert r["funnel_stage"] == 1 and r["t_2"] is None


def test_cohort_retention_matrix(spark):
    day = 86_400_000_000_000
    ev = spark.createDataFrame(
        [(1, 0 * day), (1, 1 * day), (1, 3 * day),
         (2, 0 * day), (2, 0 * day + 5),          # same-day dup collapses
         (3, 1 * day), (3, 2 * day)],
        "user_id long, ts long",
    )
    got = {(r["cohort_day"], r["day_offset"]): r["n_users"]
           for r in cohort_retention(ev).collect()}
    assert got == {
        (0, 0): 2,  # users 1, 2
        (0, 1): 1, (0, 3): 1,  # user 1 returns
        (1, 0): 1, (1, 1): 1,  # user 3
    }


def test_events_twa_holds_value_until_next_sample(spark):
    from pyspark.sql import functions as F

    from assemblagedb_spark.harness import q_events_twa  # gate form
    # direct operator-shape check on a hand aggregate: value 100 held for
    # 3ms then 200 for 1ms -> twa = (100*3 + 200*1)/4 = 125
    ev = spark.createDataFrame(
        [(1, 0, "a", 1.0), (2, 3_000_000, "a", 2.0), (3, 4_000_000, "a", 9.9)],
        "event_id long, ts long, event_type string, value double",
    )
    from pyspark.sql import Window
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    rows = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.expr("(lead(ts) over (partition by event_type order by ts, event_id) - ts) div 1000000").alias("gap_ms"),
    ).filter(F.col("gap_ms").isNotNull())
    out = rows.groupBy("event_type").agg(
        F.expr("(1000 * sum(cents * gap_ms)) div sum(gap_ms)").alias("milli_twa")
    ).first()
    # (100*3 + 200*1) / 4 = 125 -> 125000 milli; the 9.9 sample has no
    # successor and carries no weight
    assert out["milli_twa"] == 125_000


def test_drift_state_merges_by_addition(spark):
    from pyspark.sql import functions as F

    from assemblagedb_spark.harness import q_events_drift_state

    # the state of the union equals the element-wise sum of per-half
    # states — the mergeability that makes it a rollup-safe aggregate
    import pandas as pd
    rows = [(i, (i * 13) % 7, "t%d" % (i % 2), float(i % 11)) for i in range(500)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts long, event_type string, value double"
    )
    def state(df):
        x = F.expr("ts div 1").cast("long")  # hours formula irrelevant here
        y = F.round(F.col("value") * 100).cast("long")
        r = df.select("event_type", x.alias("x"), y.alias("y"))
        return {t["event_type"]: t for t in r.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").alias("sum_x"), F.sum("y").alias("sum_y"),
            F.sum(F.col("x")*F.col("x")).alias("sum_xx"),
            F.sum(F.col("x")*F.col("y")).alias("sum_xy"),
            F.sum(F.col("y")*F.col("y")).alias("sum_yy"),
        ).collect()}
    whole = state(ev)
    h1 = state(ev.filter("event_id < 250"))
    h2 = state(ev.filter("event_id >= 250"))
    for t in whole:
        for c in ("n", "sum_x", "sum_y", "sum_xx", "sum_xy", "sum_yy"):
            assert whole[t][c] == h1[t][c] + h2[t][c], (t, c)


def test_histogram_state_merges_and_bounds(spark):
    from assemblagedb_spark.harness import q_events_histogram  # gate shape
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([-9.0, 0.1, 4.99, 5.0, 999.0])],
        "event_id long, value double",
    ).withColumn("event_type", F.lit("t"))
    b = F.least(F.lit(40), F.greatest(F.lit(0), F.expr(
        "CAST(round(value * 100) AS BIGINT) div 500")))
    out = {r["bin"]: r["n"] for r in
           ev.select(b.cast("long").alias("bin")).groupBy("bin")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    # -9.0 clamps to bin 0; 0.1 and 4.99 share bin 0; 5.0 -> bin 1;
    # 999.0 (bin 199) clamps to the overflow bin 40
    assert out == {0: 3, 1: 1, 40: 1}
