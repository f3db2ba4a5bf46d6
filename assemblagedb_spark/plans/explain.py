"""Plan inspection helpers: assert the physical plan is the one you want.

Used by tests and by the perf loop: a correct operator with a wrong plan
(missing pushdown, unnecessary shuffle, row-at-a-time Python in the hot
path) would still pass the oracle — these helpers make plan properties
checkable facts instead of hopes.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (counted from the
    formatted plan's numbered node sections, not the tree rendering)."""
    return len(re.findall(r"^\(\d+\) Exchange\b", formatted_plan(df), re.MULTILINE))


def has_pushed_filters(df: DataFrame) -> bool:
    """True if the parquet scan carries pushed filters."""
    plan = formatted_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column pruning check)."""
    plan = formatted_plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return []
    return [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def python_stages(df: DataFrame) -> list[str]:
    """Python-execution operators in the plan (should be empty for hot-path
    relational operators; Arrow-batched stages report as ArrowEvalPython /
    MapInPandas)."""
    plan = formatted_plan(df)
    return re.findall(r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)\b", plan)
