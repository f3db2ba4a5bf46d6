"""Optimization profiler: isolate per-key computation cost.

For each named bench key, times the query with the NOOP SINK (guide §1.4:
eagerly computes every column of every row, no sink cost, full plan in the
SQL tab) in addition to the bench's historical ``count()`` action, and dumps
``explain('formatted')`` to ``plans/$SPARK_GRAFT_PLANS_ROUND/<key>_<tag>.txt``
(default round dir: r10).

Usage: python tools/profile_keys.py <tag> [key ...]
  tag: 'before' / 'after' (plan file suffix)
  keys: default = the keys named in OPTIMIZATION_r09.md's target list

Prints one line per key: key, noop seconds (min of 2), count seconds
(min of 2), #Exchange, #BatchEvalPython/ArrowEvalPython nodes.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_KEYS = [
    "graph_components",
    "graph_pagerank",
    "graph_ppr",
    "graph_bfs_depth",
    "graph_kcore",
    "dedup_clusters",
    "embedding_clusters",
    "overlaps_prefix",
    "overlaps",
    "overlaps_sparse",
    "overlaps_incremental",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    keys = sys.argv[2:] or DEFAULT_KEYS
    if keys == ["all"]:
        from bench import BENCH_QUERIES

        keys = list(BENCH_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from assemblagedb_spark.harness import SPARK_QUERIES
    from assemblagedb_spark.session import get_spark

    from bench import reset_shared_caches, warmup

    spark = get_spark("assemblagedb-profile")
    spark.sparkContext.setLogLevel("ERROR")
    warmup(spark, sf_dir)

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r10"),
    )
    os.makedirs(out_dir, exist_ok=True)

    for name in keys:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        best_noop = float("inf")
        for _ in range(2):
            reset_shared_caches(name)
            t0 = time.time()
            df = SPARK_QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best_noop = min(best_noop, time.time() - t0)
        best_count = float("inf")
        for _ in range(2):
            reset_shared_caches(name)
            t0 = time.time()
            SPARK_QUERIES[name](spark, sf_dir).count()
            best_count = min(best_count, time.time() - t0)
        plan = SPARK_QUERIES[name](spark, sf_dir)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        n_py = len(re.findall(r"BatchEvalPython|ArrowEvalPython", plan))
        n_pd = len(re.findall(r"MapInPandas|FlatMapGroupsInPandas", plan))
        print(
            f"{name:28s} noop={best_noop:7.3f}s count={best_count:7.3f}s "
            f"exchanges={n_ex} pyeval={n_py} mapinpandas={n_pd}",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
