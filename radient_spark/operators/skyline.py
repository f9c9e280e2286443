"""Distributed 2-D skyline (Pareto frontier) over a DataFrame.

The skyline of a set under (minimize x, minimize y) is every row not
dominated by another — no other row with x' <= x AND y' <= y and at
least one strict. The classic "cheap AND good" shortlist: price vs
quality, latency vs accuracy, cost vs freshness.

Naive dominance is an all-pairs theta join — O(n^2) and unusable at
scale. The 2-D structure admits an exact two-level plan:

  1. per-(group, x) summary: min(y) at each distinct x — one map-side-
     combined aggregate; the summary holds |distinct x| rows per group,
     orders of magnitude below row count;
  2. strict prefix-min over the summary per group, ordered by x — a
     window over SUMMARY rows only (the aggregate-then-window-over-
     summary discipline: the single-reducer window never sees raw
     rows);
  3. broadcast-size join back: a row survives iff its y equals the
     min at its own x AND beats the strict prefix min of every
     smaller x.

Correctness of the filter: a dominator has x' < x (then it must push
the strict prefix min to <= y: survive requires y < prefix) or x' = x
with y' < y (then y > min-at-x: survive requires y = min at x). Equal
(x, y) duplicates dominate neither way and both survive — the standard
skyline convention.

If distinct x per group ever rivals row count (continuous keys at
extreme scale), quantize x upstream (bucketed prefix-min) — same plan,
summary bounded by bucket count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
    maximize_x: bool = False,
    maximize_y: bool = False,
) -> DataFrame:
    """Exact Pareto frontier of (x_col, y_col) within each group.
    Defaults minimize both; flip with maximize_x / maximize_y.
    Returns the surviving input rows (all original columns)."""
    groups = list(group_cols or [])
    x = -F.col(x_col) if maximize_x else F.col(x_col)
    y = -F.col(y_col) if maximize_y else F.col(y_col)
    work = df.withColumn("__x", x).withColumn("__y", y)

    summary = work.groupBy(*groups, "__x").agg(F.min("__y").alias("__miny"))
    w = (
        Window.partitionBy(*groups)
        .orderBy("__x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    summary = summary.withColumn("__prefix", F.min("__miny").over(w))

    joined = work.join(summary, groups + ["__x"])
    survives = (F.col("__y") == F.col("__miny")) & (
        F.col("__prefix").isNull() | (F.col("__y") < F.col("__prefix"))
    )
    return joined.filter(survives).select(*df.columns)
