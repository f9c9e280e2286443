"""Count-min sketch: bounded-memory frequency estimation at stream scale.

Complements the HLL++/quantile sketches surfaced in
q_approx_cardinalities (rows-only) with a sketch whose build AND
point-query are exact integer arithmetic — so a DuckDB oracle verifies
the whole path hash-for-hash, closing the "sketches are unverifiable"
gap.

Spark-first shape: the sketch IS a DataFrame of (row, slot, count)
cells — built with one explode + one groupBy whose result is d*w rows
regardless of corpus size (map-side combine does the heavy lifting).
Cells merge across batches by summing (the CMS merge property), which
is exactly a union + re-groupBy; estimates for a candidate set are a
broadcast join of candidates against d cells each, taking min(count)
over rows (the Cormode–Muthukrishnan bound: est >= true, with
overestimate bounded by eps * N at confidence 1 - delta).

Hashing: the portable md5 family used across the dedup module —
h_i(x) = str_hash(i || '_' || x) % w — reproducible bit-for-bit in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from radient_spark.operators.dedup import str_hash


def _slot(token, row: int, width: int):
    return str_hash(F.concat_ws("_", F.lit(row), token)) % width


def cms_build(
    df: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the (row, slot, c) cell table for one column of tokens.

    One explode to d rows per token (d is tiny), one groupBy with
    partial aggregation — the shuffle carries at most d*w cells per
    map task, independent of input size.
    """
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"), _slot(F.col(col), r, width).alias("slot")
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .select("c.row", "c.slot")
        .groupBy("row", "slot")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the same (depth, width): cell-wise
    sum — the property that makes CMS a distributed-aggregation citizen."""
    return (
        a.unionByName(b)
        .groupBy("row", "slot")
        .agg(F.sum("c").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    cand_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query estimates for a candidate-token DataFrame: for each
    candidate, min over the d cells it hashes to (empty cells count 0,
    though with N >> w every cell is occupied). Candidates are the small
    side — broadcast; the sketch is d*w rows, also tiny. Output:
    (cand_col, est)."""
    probes = candidates.select(
        F.col(cand_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _slot(F.col(cand_col), r, width).alias("slot"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p"),
    ).select(cand_col, "p.row", "p.slot")
    return (
        probes.join(sketch, ["row", "slot"], "left")
        .groupBy(cand_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )
