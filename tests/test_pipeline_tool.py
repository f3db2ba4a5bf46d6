"""Smoke: the end-to-end curation demo (tools/run_pipeline.py) runs over
the sf0.001 fixtures and each stage's survivor count is sane."""

from __future__ import annotations

import json
import os
import sys


def test_run_pipeline_end_to_end(spark, sf_dir, tmp_path):
    sys.path.insert(0, "/root/repo/tools")
    import run_pipeline

    out = str(tmp_path / "out")
    old_argv = sys.argv
    sys.argv = ["run_pipeline.py", sf_dir, out]
    try:
        assert run_pipeline.main() == 0
    finally:
        sys.argv = old_argv
    rep = json.load(open(os.path.join(out, "report.json")))
    # monotone survivor chain, nothing negative or inverted
    assert rep["input_docs"] >= rep["after_exact_dedup"] >= rep["after_near_dedup"]
    assert rep["after_near_dedup"] >= rep["after_quality_lang"] >= rep["after_decontam"]
    assert rep["after_decontam"] >= rep["after_mixture"] > 0
    assert rep["split_train"] > 0
    assert rep["train_chunks"] > 0 and rep["train_bins"] > 0
    # the curated train parquet landed and is readable
    got = spark.read.parquet(os.path.join(out, "train"))
    assert got.count() == rep["split_train"]
    assert "order_idx" in got.columns
    # the multimodal sidecar decoded real media for every train doc
    # (the synthetic corpus has no undecodables) and audited its pixels
    assert rep["media_decoded"] == rep["split_train"]
    assert rep["media_pixel_rows"] == rep["media_decoded"] > 0
    media = spark.read.parquet(os.path.join(out, "media_stats"))
    assert media.count() == rep["media_pixel_rows"]
    assert {"media_id", "pixel_sum"} <= set(media.columns)
