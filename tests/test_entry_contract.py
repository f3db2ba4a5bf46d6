"""The driver contract must hold from ANY working directory.

Arrow-kernel queries pickle module-level functions by reference, so Python
workers must be able to import ``assemblagedb_spark`` even when the driver
process does not run from this repo. ``__spark_entry__._ensure_worker_import``
ships the package via ``addPyFile``; this subprocess test pins it by running
an Arrow-kernel query from a neutral cwd with only ``sys.path`` pointing at
the repo (the exact failure mode: before the fix this died with
``ModuleNotFoundError: assemblagedb_spark`` in the worker).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
import __spark_entry__ as e
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
qs = e.queries()
# embedding_neardup's sketch kernel is a module-level pandas UDF — the
# by-reference pickle path that requires the worker-side import
n = qs["embedding_neardup"](spark, "/root/testdata/sf0.001").count()
assert n > 0, n
print("OK", n)
"""


def test_queries_run_from_foreign_cwd(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=REPO)],
        cwd=tmp_path,
        capture_output=True,
        text=True,
        timeout=600,
        env={k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "OK" in proc.stdout
