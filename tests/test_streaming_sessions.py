"""Stateful streaming sessionization: cross-batch state carry.

Two availableNow drains over one checkpoint prove that the open session
survives in the state store between micro-batches: batch 2 either extends
it (small gap) or closes it and starts a new one (large gap).
"""

from __future__ import annotations

import pandas as pd

from assemblagedb_spark.streaming.sessions import sessionize_stream

GAP = 100


def _write_batch(spark, src_dir: str, rows, name: str) -> None:
    pdf = pd.DataFrame(rows, columns=["user_id", "event_id", "ts"])
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src_dir)
    _ = name


def _drain(spark, src_dir: str, out_dir: str, ckpt: str) -> None:
    stream = (
        spark.readStream.schema("user_id long, event_id long, ts long")
        .parquet(src_dir)
    )
    q = (
        sessionize_stream(stream, gap=GAP)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_sessions_close_within_batch_and_carry_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: user 1 has a closed session (0..10) and an open one (500..)
    _write_batch(spark, src, [(1, 1, 0), (1, 2, 10), (1, 3, 500)], "b1")
    _drain(spark, src, out, ckpt)
    got = {
        (r.user_id, r.session_idx): (r.n_events, r.start_ts, r.end_ts)
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(1, 1): (2, 0, 10)}  # open session NOT emitted yet

    # batch 2: ts=550 extends the open session (gap 50 <= 100); ts=900
    # closes it and opens session 3
    _write_batch(spark, src, [(1, 4, 550), (1, 5, 900)], "b2")
    _drain(spark, src, out, ckpt)
    got = {
        (r.user_id, r.session_idx): (r.n_events, r.start_ts, r.end_ts)
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        (1, 1): (2, 0, 10),
        (1, 2): (2, 500, 550),  # carried state: started in batch 1
    }


def test_streaming_matches_batch_operator_on_closed_sessions(spark, tmp_path):
    from assemblagedb_spark.operators.sessions import sessionize

    rows = [(u, i, t) for u in (1, 2) for i, t in enumerate([0, 50, 400, 430, 990])]
    src = str(tmp_path / "src2")
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    _write_batch(spark, src, rows, "all")
    _drain(spark, src, out, ckpt)
    streamed = {
        (r.user_id, r.session_idx): (r.n_events, r.start_ts, r.end_ts)
        for r in spark.read.parquet(out).collect()
    }
    batch_df = spark.createDataFrame(rows, "user_id long, event_id long, ts long")
    batch = {
        (r.user_id, r.session_idx): (r.n_events, r.start_ts, r.end_ts)
        for r in sessionize(batch_df, gap=GAP).collect()
    }
    # the stream withholds each user's LAST (still-open) session
    open_keys = {(u, max(i for (uu, i) in batch if uu == u)) for u in (1, 2)}
    assert streamed == {k: v for k, v in batch.items() if k not in open_keys}
