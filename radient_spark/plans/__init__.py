"""Plan-inspection helpers: assert the physical plans we designed for.

`explain("formatted")` is the feedback loop the build plan mandates —
these helpers turn the three properties that matter at 100 TB into
checkable predicates:
- filters/column pruning reached the parquet scan (PushedFilters /
  ReadSchema),
- small dimension joins went broadcast (BroadcastHashJoin),
- expressions stayed inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, fragment: str = "") -> bool:
    """True if the scan advertises pushed filters (optionally containing
    `fragment`)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and "[]" not in line:
            if fragment in line:
                return True
    return False


def reads_only_columns(df: DataFrame, allowed: set[str]) -> bool:
    """True if every parquet ReadSchema field is in `allowed` (column
    pruning worked)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            schema = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols = {c.split(":")[0].strip() for c in schema.split(",") if c}
            if not cols <= allowed:
                return False
    return True


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of real data shuffles (hash/range Exchange nodes).
    BroadcastExchange is excluded — broadcasting a dim is the cheap path
    we want, not a data shuffle."""
    import re

    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, flags=re.MULTILINE))
