"""Raw-corpus ingestion: JSONL / CSV / text-directory readers that land in
the engine's ``documents`` schema with explicit corrupt-record handling.

Ingest rules that matter at 100 TB:
- ALWAYS pass an explicit schema — schema inference is a full extra pass
  over the input (Spark reads every file once just to guess types).
- PERMISSIVE mode + a corrupt-record column: a single torn line in
  terabyte-scale JSONL must quarantine that ROW, not kill the job
  (FAILFAST) or silently drop it (DROPMALFORMED). :func:`split_corrupt`
  separates the quarantine stream so it can be written to a badlands path
  and re-driven later.
- Content-addressed ids for schemaless text: files arrive unordered and
  re-sharded, so ``monotonically_increasing_id`` (partition-dependent) is
  not reproducible; xxhash64(file, line) is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

DOC_FIELDS = "doc_id long, text string, lang string, source string, n_chars long"
CORRUPT = "_corrupt_record"


def _with_corrupt(schema: str) -> str:
    return f"{schema}, {CORRUPT} string"


def read_jsonl(
    spark: SparkSession,
    path: str,
    *,
    schema: str = DOC_FIELDS,
) -> DataFrame:
    """JSON-lines → documents + quarantine column (NULL for good rows)."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT)
        .json(path)
    )


def read_csv_docs(
    spark: SparkSession,
    path: str,
    *,
    schema: str = DOC_FIELDS,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV → documents + quarantine column."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT)
        .option("header", header)
        .option("sep", sep)
        .csv(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_quarantine_col, corrupt_rows). Write the second
    to a badlands path; never let it silently vanish."""
    # PERMISSIVE JSON leaves a row with the raw line in CORRUPT and NULLs
    # elsewhere. The cache is REQUIRED, not just an optimization: Spark
    # refuses to answer queries that reference only the internal corrupt
    # column of a raw file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — and it
    # also stops the two filters re-parsing the input twice.
    df = df.cache()
    clean = df.filter(F.col(CORRUPT).isNull()).drop(CORRUPT)
    bad = df.filter(F.col(CORRUPT).isNotNull()).select(CORRUPT)
    return clean, bad


def read_text_dir(
    spark: SparkSession,
    path: str,
    *,
    source_from_path: bool = True,
) -> DataFrame:
    """One document per line of every file under ``path``: (doc_id, text,
    source, n_chars) with a content-addressed reproducible id
    (xxhash64 of file path + line + occurrence index), lang left NULL for
    a downstream language-ID pass.

    ``doc_id`` is unique PER ROW: k identical lines in one file get
    occurrence indexes 1..k folded into the hash, so downstream per-doc
    joins/groupBys never silently merge them. Which physical line gets
    which index is arbitrary (identical lines are indistinguishable), but
    the emitted ROW SET is deterministic: the same k ids on every run and
    partitioning. Cost: one shuffle on (file, text) — only duplicate
    (file, line) pairs ever co-locate more than one row."""
    from pyspark.sql import Window

    raw = spark.read.text(path).select(
        F.col("value").alias("text"),
        F.input_file_name().alias("__file"),
    )
    w = Window.partitionBy("__file", "text").orderBy(F.lit(0))
    raw = raw.withColumn("__occ", F.row_number().over(w))
    return raw.select(
        F.xxhash64("__file", "text", "__occ").alias("doc_id"),
        "text",
        F.lit(None).cast("string").alias("lang"),
        (
            F.element_at(F.split("__file", "/"), -1)
            if source_from_path
            else F.lit(None).cast("string")
        ).alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )
