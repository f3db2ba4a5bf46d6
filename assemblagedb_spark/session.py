"""SparkSession factory.

Defaults are tuned for the test harness (local[N], small SF) but every knob is
chosen to also be the right default on a large cluster:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting) — at
  100 TB the static ``spark.sql.shuffle.partitions`` is always wrong for some
  stage; AQE re-plans from runtime statistics.
- Arrow enabled for the few pandas-UDF paths (multimodal, markup).
- Broadcast threshold left at default; operators that KNOW a side is small
  (query gram sets, dimension tables) broadcast explicitly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "assemblagedb-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))
    # local[N,F]: F = task retries. Plain local[N] hardwires
    # maxTaskFailures=1 (SparkContext.createTaskScheduler), so ONE
    # transient storage race kills a whole job. The round-8 sfempty sweep
    # hit exactly one: `Block rdd_N does not exist`, whose only throw site
    # in spark-core 4.1.2 is BlockInfoManager.blockInfo() — reached when a
    # late lock release (e.g. a PythonRunner writer thread unlocking after
    # its task completed) races ContextCleaner's removeRdd for a
    # checkpointed frame whose last Python reference was just dropped.
    # removeBlock write-locks and waits for readers, so an IN-FLIGHT
    # consumer never loses its block — the race is pure end-of-life lock
    # bookkeeping inside Spark, harmless to recompute. Retries turn that
    # one-off into a retried task instead of a failed run; a genuinely
    # unrecomputable loss still fails (F is small). On a real cluster
    # maxFailures defaults to 4, so this also better mirrors production.
    failures = os.environ.get("SPARK_GRAFT_TASK_FAILURES", "2")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus},{failures}]"))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
