"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB against the same parquet dir, compare
row count + column names + order-insensitive values.

Usage: python tools/check_oracles.py [--vanilla] [--parts=N] [sf_dir] [query ...]

``--vanilla`` replicates the external driver's bare session; ``--parts=N``
additionally forces an arbitrary core/shuffle-partition count — running the
full sweep at an odd N (e.g. 7) is the sweep-level partition-invariance
check: any gate whose values depend on how rows happen to split across
tasks fails here instead of on a differently-sized cluster.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    args = sys.argv[1:]
    # --vanilla: replicate the external driver exactly — a bare
    # SparkSession with none of session.py's configs (UTC timezone,
    # Arrow, AQE...), so any result that silently depends on our session
    # tuning fails HERE, not in the driver's grading run.
    vanilla = "--vanilla" in args
    parts = None
    for a in list(args):
        if a.startswith("--parts="):
            parts = int(a.split("=", 1)[1])
            args.remove(a)
    args = [a for a in args if a != "--vanilla"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entry
    from assemblagedb_spark.sources.tpch import TABLES

    if vanilla or parts is not None:
        from pyspark.sql import SparkSession

        n = parts or 8
        spark = (
            SparkSession.builder.appName("oracle-check-vanilla")
            .master(f"local[{n}]")
            .config("spark.sql.shuffle.partitions", str(n))
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from assemblagedb_spark.session import get_spark

        spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"SKIP  {name}: no oracle (rows={len(sdf)}, {t_spark:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        if len(sdf) != len(odf):
            print(f"FAIL  {name}: rows spark={len(sdf)} duckdb={len(odf)}")
            failures.append(name)
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL  {name}: cols spark={sorted(sdf.columns)} duckdb={sorted(odf.columns)}")
            failures.append(name)
            continue
        # Raw-dtype drift (e.g. DuckDB HUGEINT from uncast windowed SUM ->
        # object/float64, or an int32 Spark column vs an int64 oracle)
        # breaks the driver's value hash / schema compare even when every
        # value matches after coercion — a drift is a FAILURE, not a
        # warning. Only datetime64[ns] vs [us] is tolerated (Spark
        # timestamps arrive as ns, DuckDB as us; both normalize to us and
        # the driver has graded such rows green).
        def _dt_ok(a: str, b: str) -> bool:
            return a == b or (
                a.startswith("datetime64") and b.startswith("datetime64")
            )

        dty = [
            (c, str(sdf[c].dtype), str(odf[c].dtype))
            for c in sorted(sdf.columns)
            if not _dt_ok(str(sdf[c].dtype), str(odf[c].dtype))
        ]
        if dty:
            print(f"FAIL  {name}: raw dtype drift {dty}")
            failures.append(name)
            continue
        a, b = normalize(sdf), normalize(odf)
        try:
            # floats compare with tolerance; everything else EXACTLY — the
            # driver's gate hashes values, so an int off by one sub-µs digit
            # is a real failure even if it's within any rtol
            floats = [c for c in a.columns if pd.api.types.is_float_dtype(a[c])]
            others = [c for c in a.columns if c not in floats]
            if floats:
                pd.testing.assert_frame_equal(
                    a[floats], b[floats], check_dtype=False, check_exact=False,
                    rtol=1e-9, atol=1e-12,
                )
            if others:
                pd.testing.assert_frame_equal(
                    a[others], b[others], check_dtype=False, check_exact=True
                )
            print(f"OK    {name}: rows={len(sdf)} spark={t_spark:.1f}s")
        except AssertionError as e:
            print(f"FAIL  {name}: value mismatch: {str(e)[:500]}")
            failures.append(name)
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
