"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (count() over the final frame); the
first run of the session includes JVM/codegen warmup, so a tiny warmup query
runs first and is not counted.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "search",
    "find_symmetric",
    "overlaps",
    "overlaps_incremental",
    "reindex_parents",
    "dedup_exact",
    "dedup_lsh_pairs",
    "dedup_lsh_capped",
    "dedup_clusters",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "embedding_neardup",
    "embedding_clusters",
    "ann_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "events_sessions",
    "view_tile",
    "graph_preview",
    "text_quality",
    "text_lang_id",
    "text_winnowing",
    "text_lang_ngram",
    "text_chunks",
    "text_packing",
    "pipeline_filter",
    "mvcc_latest",
    "mvcc_asof",
    "events_tumbling",
    "events_rollup",
    "events_quantiles",
    "events_moving",
    "graph_descendants",
    "graph_ancestor_path",
    "graph_components",
    "graph_pagerank",
    "graph_triangles",
    "siblings",
    "display_class",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q18",
    "text_decontam",
    "pii_scrub",
    "text_repetition",
    "select_budget",
    "training_order",
    "text_boilerplate",
    "embedding_centroids",
    "embedding_assign",
    "distinct_hll",
    "sketch_countmin",
    "text_tfidf",
    "layout_zorder",
    "kmeans_train",
    "bloom_semijoin",
    "sample_topn",
    "sample_mixture",
    "dedup_incremental",
    "table_profile",
    "events_funnel",
    "events_retention",
    "mvcc_diff",
    "graph_ppr",
    "ann_ivf_trained",
    "text_outliers",
    "sketch_join_est",
    "crossmodal_centroids",
    "sample_repeat",
    "events_outliers_grouped",
    # round-3 additions (BENCH_r03 ⊇ BENCH_r02: keys only ever append)
    "dedup_lsh_verify",
    "dedup_containment",
    "split_assign",
    "select_best_group",
    "graph_bfs_depth",
    "text_chunk_dedup",
    "text_surprisal",
    "events_rollup_cascade",
    "embedding_quantize",
    "ann_pq_codes",
    "sketch_rollup",
    "graph_kcore",
    "sample_weighted",
    "ann_pq_adc",
    "events_twa",
    "events_drift_state",
    "events_histogram",
    # round-5 additions: residual IVFADC build (cold) + serving (warm)
    # + gate-checked streaming ingest
    "ann_ivfpq_codes",
    "ann_ivfpq",
    "ann_ivfpq_rerank",  # two-tier refine serves warm off the same index
    "streaming_ivfpq_ingest",
    "streaming_rollup_ingest",
    "streaming_hll_ingest",
    "streaming_sessions_ingest",
    # round-6 additions: broadcast subscription via the checkpointed
    # episode file source (state after 3 pulls == batch export), and the
    # REAL image-header decode loop (engine-built PNG bytes parsed back)
    "streaming_broadcast_ingest",
    "multimodal_decode",
    "multimodal_resize",  # real PNG codec: encode -> resize -> decode
    "multimodal_audio",   # real WAV codec: PCM frames -> waveform stats
    "multimodal_jpeg",    # real baseline JPEG: Huffman/DCT lossy roundtrip
    "multimodal_video",   # real y4m container: frame-sampled luma stats
    "multimodal_gif",     # real animated GIF: LZW decode + compositing
]


# Several gates share session-cached build artifacts (harness memos): the
# dedup overlap relation, the trained k-means state, the PQ codebook+codes
# index. To keep the bench honest about BOTH costs, the build-side key of
# each group is timed COLD (ONLY its own group's cache dropped before each
# timed run -> the full build pipeline cost) while the serving-side keys
# that follow measure the warm marginal cost — the actual shape of a
# deployed engine (index built once, served many). Clearing only the
# group's own cache keeps other groups' warm numbers independent of list
# order; tools/scale_curve.py imports this mapping so the two stay in sync.
COLD_KEY_CACHES = {
    "dedup_lsh_verify": "_OVERLAP_CACHE",  # dedup_containment serves warm
    "kmeans_train": "_KMEANS_CACHE",       # ann_ivf_trained serves warm
    "ann_pq_codes": "_PQ_CACHE",           # ann_pq_adc serves warm
    "ann_ivfpq_codes": "_IVFPQ_CACHE",     # ann_ivfpq serves warm
}


def reset_shared_caches(name: str) -> None:
    cache_attr = COLD_KEY_CACHES.get(name)
    if cache_attr is not None:
        from assemblagedb_spark.harness import clear_artifact_cache

        clear_artifact_cache(cache_attr)


def warmup(spark, sf_dir: str) -> None:
    """JVM + parquet footer reads + Python-UDF worker pool warmup (the 32
    workers cost ~6s to spawn; that's provisioning, not query time)."""
    import pandas as _pd

    from assemblagedb_spark.harness import SPARK_QUERIES

    SPARK_QUERIES["mvcc_last_updated"](spark, sf_dir).collect()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: (_pd.DataFrame({"x": [1]}) for _ in it), "x int"
    ).count()


def time_queries(
    spark, sf_dir: str, names: list[str], runs: int = 2
) -> dict[str, float]:
    """Min-of-``runs`` wall time per query with the cold-key cache resets
    (the single timing discipline — tools/scale_curve.py imports this so
    SCALING.md measures exactly what BENCH_LOCAL.json does). The first
    run pays one-off codegen/JIT; the min reflects steady-state
    throughput (materialized indexes persist across queries, as they
    would in a deployed engine). Returns UNROUNDED seconds — callers
    round for display only, so ratio fits never divide by a rounded
    zero."""
    from assemblagedb_spark.harness import SPARK_QUERIES

    out: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(runs):
            reset_shared_caches(name)
            t0 = time.time()
            SPARK_QUERIES[name](spark, sf_dir).count()
            best = min(best, time.time() - t0)
        out[name] = best
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from assemblagedb_spark.session import get_spark

    spark = get_spark("assemblagedb-bench")
    spark.sparkContext.setLogLevel("ERROR")

    warmup(spark, sf_dir)
    timings = {
        name: round(t, 3)
        for name, t in time_queries(spark, sf_dir, BENCH_QUERIES).items()
    }

    total = round(sum(timings.values()), 3)
    payload = json.dumps(
        {
            "metric": "headline-query wall time (engine operator suite)",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
        }
    )
    print(payload)
    # the driver's capture truncates long stdout tails — also write the
    # full line next to the repo so per-query regression diffing never
    # depends on a truncated artifact (BENCH_LOCAL.json is committed each
    # round; see ROTATION.md round-4 plan)
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_LOCAL.json"),
            "w",
        ) as fh:
            fh.write(payload + "\n")
    except OSError:
        pass


if __name__ == "__main__":
    main()
