"""Watermarked windowed aggregation: late data inside the watermark updates
its window; data older than the watermark is dropped once the watermark has
advanced past the window's end (append-mode emission only happens for
finalized windows)."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from assemblagedb_spark.streaming.broadcast import windowed_event_counts

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _rows(*offset_minutes):
    return pd.DataFrame(
        {
            "ts": [T0 + dt.timedelta(minutes=m) for m in offset_minutes],
            "event_type": ["click"] * len(offset_minutes),
            "value": [1.0] * len(offset_minutes),
        }
    )


def _drain(spark, src_dir: str, out_dir: str, ckpt: str) -> None:
    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .parquet(src_dir)
    )
    q = (
        windowed_event_counts(stream, window="10 minutes", watermark="15 minutes")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _read_windows(spark, out_dir):
    try:
        return {
            (r["window"]["start"].minute, r["n"])
            for r in spark.read.parquet(out_dir).collect()
        }
    except Exception:
        return set()


def test_late_data_within_watermark_counts_drop_after(spark, tmp_path):
    src, out, ckpt = (
        str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )

    def write(pdf):
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)

    # batch 1: events at minute 2 and 12 → watermark advances to 12-15 < 0,
    # nothing finalized yet, nothing emitted in append mode
    write(_rows(2, 12))
    _drain(spark, src, out, ckpt)

    # batch 2: minute 5 is LATE but within the watermark → still counted
    # into the [0,10) window; minute 40 pushes the watermark to 25, which
    # finalizes [0,10) and [10,20)
    write(_rows(5, 40))
    _drain(spark, src, out, ckpt)
    got = _read_windows(spark, out)
    assert (0, 2) in got, got  # late minute-5 event made it into [0,10)
    assert (10, 1) in got, got

    # batch 3: minute 3 is older than the watermark (25) → dropped; a fresh
    # minute-70 event later finalizes [40,50) with only its own row
    write(_rows(3, 70))
    _drain(spark, src, out, ckpt)
    got = _read_windows(spark, out)
    assert (0, 2) in got, got  # unchanged: the too-late row did not reopen it
    assert (40, 1) in got, got
