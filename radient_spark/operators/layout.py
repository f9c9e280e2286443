"""Z-order (Morton) data layout for multi-column data skipping.

At 100 TB, scan cost is decided before the first task runs: parquet
row-group min/max statistics prune IO only if rows with nearby values
are physically nearby. Sorting clusters ONE column; interleaving the
bits of several columns (the Z-order curve Delta/Iceberg expose as
OPTIMIZE ... ZORDER BY) bounds the per-file span of EVERY participating
column simultaneously, so a filter on any of them skips most files.

Spark-first shape: the Morton code is a fully unrolled Catalyst integer
expression (shift/and/or — whole-stage codegen, zero Python, zero
shuffle); the layout step is one `repartitionByRange` on the code (a
range shuffle Spark must do for ANY global ordering) + an in-partition
sort that feeds parquet writer statistics. Nothing is collected; the
range boundaries come from Spark's own reservoir sampling.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton code of `cols` (non-negative integer expressions, each
    truncated to `bits` low bits): bit i of column j lands at position
    i * len(cols) + j. Pure unrolled Catalyst arithmetic — the
    bits * n_cols terms OR together disjoint bit positions.
    """
    m = len(cols)
    if m == 0:
        raise ValueError("z_value needs at least one column")
    if bits * m > 62:
        raise ValueError(f"bits*cols = {bits * m} exceeds signed-long range")
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        cl = c.cast("long")
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(cl, i).bitwiseAND(F.lit(1)), i * m + j)
            )
    return z


def scale_to_bits(col: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Affine-map a numeric column from [lo, hi] onto [0, 2^bits), the
    integer domain `z_value` interleaves. Callers obtain lo/hi from one
    cheap min/max aggregate (or domain knowledge); clamping makes
    out-of-range values safe."""
    span = float(hi) - float(lo)
    if span <= 0:
        return F.lit(0).cast("long")
    scaled = ((col.cast("double") - F.lit(float(lo))) / F.lit(span)) * F.lit(
        float((1 << bits) - 1)
    )
    return F.least(
        F.greatest(F.round(scaled, 0).cast("long"), F.lit(0).cast("long")),
        F.lit((1 << bits) - 1).cast("long"),
    )


def zorder_repartition(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    n_partitions: int | None = None,
    keep_zcol: bool = False,
) -> DataFrame:
    """Cluster `df` along the Z-curve of integer columns `cols`: range-
    partition + locally sort by the Morton code so a subsequent parquet
    write gets tight min/max stats on every listed column in every file.

    One range shuffle total. Use `scale_to_bits` upstream for float/
    date columns."""
    zc = z_value([F.col(c) for c in cols], bits=bits).alias("__z")
    staged = df.withColumn("__z", zc)
    parted = (
        staged.repartitionByRange(n_partitions, "__z")
        if n_partitions
        else staged.repartitionByRange("__z")
    )
    out = parted.sortWithinPartitions("__z")
    return out if keep_zcol else out.drop("__z")


def layout_span_stats(
    df: DataFrame, cols: Sequence[str], bucket_col: Column, n_buckets_hint: str = ""
) -> DataFrame:
    """Clustering-quality report: per bucket (a file/partition proxy),
    the min/max span of each layout column. Small average spans =
    row-group statistics will prune; the un-clustered baseline has
    span ≈ global range in every bucket."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            (F.max(c) - F.min(c)).alias(f"span_{c}"),
        ]
    return df.groupBy(bucket_col.alias("bucket")).agg(*aggs)
