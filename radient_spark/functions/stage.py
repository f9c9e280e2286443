"""Materialization barrier for expensive per-row expressions.

Catalyst's CollapseProject inlines staged `withColumn` expressions into
their consumers; when the consumer is a higher-order-function lambda that
references the column once per array element (shingle windows, per-
centroid distance folds), the inlined lineage re-evaluates once per
reference — turning O(T) pipelines into O(T^2).

`stage(df, name=expr)` routes the expressions through a one-element
explode: the Generate node evaluates each expression exactly once per
row and emits real attributes, which downstream lambdas reference at
O(1). Zero shuffle, zero caching, survives the optimizer (Generate is
not a Project, so CollapseProject cannot reach through it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stage(df: DataFrame, **exprs: Column) -> DataFrame:
    """Append each named expression as a genuinely materialized column."""
    packed = F.explode(
        F.array(F.struct(*[e.alias(n) for n, e in exprs.items()]))
    )
    out = df.withColumn("__stage", packed)
    for n in exprs:
        out = out.withColumn(n, F.col("__stage")[n])
    return out.drop("__stage")
