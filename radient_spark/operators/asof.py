"""As-of (point-in-time) join — a relational operator the reference lacks
(SURVEY.md §2.7 "Range / as-of / interval join: none").

Spark-first implementation: the union-and-window trick. Tag both sides,
union them, sort within each key by (timestamp, side-tag), and carry the
most recent right-side row forward as ONE struct with
`last(..., ignoreNulls=True)` — row-level fill, not per-column.

Scale profile: exactly ONE shuffle (by the join key) and one sort — the
same cost as a sort-merge join, with no range-condition row explosion.
Skewed keys are handled by AQE; there is no broadcast requirement on
either side. (The `merge_asof`-in-`applyInPandas` alternative would cross
the Python boundary; this stays entirely JVM-side.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts <= left_ts (or strictly < when `strict`) sharing key `on`.

    Payload columns come back null when no prior right row exists
    (left-join semantics, matching DuckDB's ASOF LEFT JOIN). Left and
    right payload column names must be disjoint.
    """
    payload_cols = payload_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    left_cols = [c for c in left.columns if c != on]
    ltypes, rtypes = dict(left.dtypes), dict(right.dtypes)

    lt = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(rtypes[c]).alias(c) for c in payload_cols],
    )
    rt = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in left_cols],
        *[F.col(c) for c in payload_cols],
    )
    unioned = lt.unionByName(rt)

    # At equal timestamps: non-strict must see the right row (right sorts
    # first); strict must not (right sorts after the left row).
    side_order = F.col("__side").asc() if not strict else F.col("__side").desc()
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # One struct carries ALL payload columns of the matched right row, so
    # the fill is row-level: a NULL payload value in the latest prior row
    # stays NULL (never backfilled from an older row), and every payload
    # column comes from the SAME right row — matching DuckDB ASOF LEFT
    # JOIN semantics exactly.
    filled = unioned.select(
        "*",
        F.last(
            F.when(
                F.col("__side") == 0,
                F.struct(*[F.col(c) for c in payload_cols]),
            ),
            ignorenulls=True,
        )
        .over(w)
        .alias("__f"),
    )
    return filled.filter(F.col("__side") == 1).select(
        F.col(on),
        *[F.col(c) for c in left_cols],
        *[F.col(f"__f.{c}").alias(c) for c in payload_cols],
    )
