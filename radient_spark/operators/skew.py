"""Skew mitigation: salting helpers for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; these helpers are the explicit tools for the two shapes AQE
can't fix:

- a groupBy where ONE key dominates (AQE can split a skewed shuffle
  partition, but a single giant key still lands on one reducer):
  `salted_aggregate` does the classic two-phase trick — aggregate on
  (key, salt) first, then merge the partials.
- a join against a dimension with a few hot keys where the build side is
  too big to broadcast outright: `salted_join` explodes the small side
  `salt` ways and sprays the big side's hot keys across them.

Both preserve exact semantics (tests assert equality with the unsalted
plan); they trade one extra small shuffle for even reducer load.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: Callable[[], list[Column]],
    merge: Callable[[], list[Column]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    `aggs()` -> partial aggregate expressions (aliased);
    `merge()` -> expressions merging those partial columns (aliased the
    same way). Example:

        salted_aggregate(
            df, ["k"],
            aggs=lambda: [F.count(F.lit(1)).alias("cnt"),
                          F.sum("x").alias("s")],
            merge=lambda: [F.sum("cnt").alias("cnt"),
                           F.sum("s").alias("s")],
        )
    """
    salted = df.withColumn(
        "__salt", (F.abs(F.xxhash64(F.monotonically_increasing_id())) % salt)
    )
    partial = salted.groupBy(*keys, "__salt").agg(*aggs())
    return partial.groupBy(*keys).agg(*merge())


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: replicate the small side `salt` times,
    spread the big side's rows randomly across the replicas, join on
    (key, salt). Each hot key's rows now land on `salt` reducers instead
    of one. Exact same rows as the plain join — for inner/left only:
    right/full-outer would emit each unmatched small-side row once per
    replica, so those modes are rejected."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how in ('inner', 'left'); got {how!r} — "
            "outer-on-the-replicated-side would duplicate unmatched rows"
        )
    small_rep = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    big_salted = big.withColumn(
        "__salt",
        (F.abs(F.xxhash64(F.monotonically_increasing_id())) % salt).cast("int"),
    )
    return big_salted.join(small_rep, on=[key, "__salt"], how=how).drop("__salt")
