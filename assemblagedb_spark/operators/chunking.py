"""Document chunking: fixed-size token windows with overlap — the step
every LLM training-data pipeline runs between cleaning and tokenization.

Pure Catalyst: the token array is bound once per row (lambda-variable CSE
via ``transform(array(x), toks -> ...)``), chunk starts are a stride
sequence, each chunk is a slice + join — no Python, no shuffle; the
output explodes to one row per chunk, which is exactly the shape a
downstream ``repartition`` + tokenizer stage consumes. Deterministic and
SQL-replayable (the DuckDB oracle mirrors slice semantics: both engines
truncate the final short chunk rather than padding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_documents(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_text, n_tokens): whitespace-token windows
    of ``chunk_tokens`` starting every ``chunk_tokens - overlap`` tokens.

    The last chunk of a document may be shorter (slice truncates); empty
    documents yield no chunks. ``overlap`` tokens are shared between
    consecutive chunks so no span of ``overlap`` consecutive tokens is
    ever split across a chunk boundary without appearing whole in one of
    them.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks_sql = (
        f"filter(split(trim(coalesce({text_col}, '')), ' +'), t -> t <> '')"
    )
    chunks = (
        f"transform(array({toks_sql}), toks -> "
        f"transform(sequence(0, size(toks) - 1, {step}), s -> named_struct("
        f"'chunk_text', array_join(slice(toks, s + 1, {chunk_tokens}), ' '), "
        f"'n_tokens', CAST(size(slice(toks, s + 1, {chunk_tokens})) AS BIGINT)"
        f")))[0]"
    )
    return (
        docs.filter(F.expr(f"size({toks_sql})") > 0)
        .select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.expr(chunks)).alias("chunk_idx", "c"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.n_tokens").alias("n_tokens"),
        )
    )
