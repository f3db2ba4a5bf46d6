"""Streaming exact dedup: duplicates within the watermark are dropped
across micro-batches (state persists via checkpoint); distinct docs pass."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from assemblagedb_spark.streaming.dedup import streaming_exact_dedup

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write(spark, src: str, rows: list[tuple[int, str, int]]) -> None:
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "ts": [T0 + dt.timedelta(minutes=r[2]) for r in rows],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)


def _drain(spark, src: str, out: str, ckpt: str) -> None:
    stream = spark.readStream.schema("doc_id long, text string, ts timestamp").parquet(src)
    q = (
        streaming_exact_dedup(stream, watermark="30 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_dedup_drops_duplicates_across_batches(spark, tmp_path):
    src, out, ckpt = (
        str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )

    _write(spark, src, [(1, "hello world", 0), (2, "something else", 1)])
    _drain(spark, src, out, ckpt)

    # batch 2: doc 3 normalizes to doc 1's text (case/whitespace differ),
    # doc 4 is genuinely new — state from batch 1 must still apply
    _write(spark, src, [(3, "  Hello   WORLD ", 2), (4, "brand new", 3)])
    _drain(spark, src, out, ckpt)

    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {1, 2, 4}


def test_streaming_dedup_agrees_with_batch_normalization(spark, tmp_path):
    # the streaming key and the batch exact_duplicates key are the same
    # normalization: what batch groups together, streaming dedups
    from assemblagedb_spark.operators.dedup import exact_duplicates

    docs = spark.createDataFrame(
        [(1, "a  b"), (2, "A b"), (3, "c")], "doc_id long, text string"
    )
    batch = {
        r["text_hash"]: r["n_copies"]
        for r in exact_duplicates(docs).collect()
    }
    assert sorted(batch.values()) == [1, 2]

    src, out, ckpt = (
        str(tmp_path / "s2"), str(tmp_path / "o2"), str(tmp_path / "c2")
    )
    _write(spark, src, [(1, "a  b", 0), (2, "A b", 1), (3, "c", 2)])
    _drain(spark, src, out, ckpt)
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {1, 3}
