"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (ad-hoc similarity search over the
documents table — the reference's core analytics path, SURVEY §3.2).
``queries()``/``oracle_sql()`` expose the operator inventory from SURVEY §2
with DuckDB oracles; implementations live in ``assemblagedb_spark/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

_SHIPPED: set[str] = set()


def _ensure_worker_import(spark: SparkSession) -> None:
    """Ship ``assemblagedb_spark`` to Python workers via ``addPyFile``.

    Arrow-kernel queries pickle module-level functions BY REFERENCE, so
    each worker must be able to ``import assemblagedb_spark``. When the
    driver process happens to run from this repo the normal import path
    covers that; this makes the contract hold from ANY working directory
    by shipping the package source as a zip once per application (the
    same mechanism a real cluster submit would use for --py-files)."""
    app = spark.sparkContext.applicationId
    if app in _SHIPPED:
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "assemblagedb_spark"
    )
    fd, zpath = tempfile.mkstemp(suffix=".zip", prefix="assemblagedb_spark_")
    os.close(fd)
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(
                        full,
                        os.path.relpath(full, os.path.dirname(pkg_dir)),
                    )
    spark.sparkContext.addPyFile(zpath)
    _SHIPPED.add(app)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: gram-index the documents
    table and run a scored similarity search (reference search path,
    assemblage_db/src/index.rs:174-240)."""
    from assemblagedb_spark.harness import q_search

    _ensure_worker_import(spark)
    return q_search(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """All declared queries, ordered least-recently-driver-graded first.

    The driver grades the first 50 entries per round. The order is NOT
    hand-picked: ``grading_order()`` is a pure function of the committed
    CORRECTNESS_r*.json ledger — never-graded queries and queries whose
    gate changed since their last grade lead (declaration order), then
    everything else oldest-grade-first — so newly added or changed gates
    are always in the next driver window. The in-repo registries
    (``SPARK_QUERIES``/``ORACLES``) keep plain declaration order.
    """
    import functools

    from assemblagedb_spark.harness import SPARK_QUERIES, grading_order

    def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
        @functools.wraps(fn)
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_worker_import(spark)
            return fn(spark, sf_dir)

        return run

    return {k: _wrap(SPARK_QUERIES[k]) for k in grading_order()}


def oracle_sql() -> dict[str, str]:
    from assemblagedb_spark.harness import ORACLES, grading_order

    return {k: ORACLES[k] for k in grading_order() if k in ORACLES}
