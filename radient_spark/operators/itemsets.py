"""Frequent-itemset mining (market-basket association rules): the
distributed Apriori first stages — frequent items, frequent pairs, and
support/confidence/lift rule stats.

Spark-first shape: one groupBy(basket) collects each basket's sorted
item roster — dedup and roster from a single exchange — and ordered
pairs explode from the roster array (j > i), so there is no basket
self-join at all; the per-basket fan-out is the roster size squared,
the same bound the classic pruned self-join has.  Rule metrics are
exact integer ratios with one rounded IEEE division each, so DuckDB
oracles hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Frequent item PAIRS with association-rule stats.

    Pipeline: per-basket sorted item roster -> ordered pairs exploded
    from each roster -> pair support filter -> item-support metrics
    joins:

      support_a/support_b : item supports (baskets containing it)
      pair_support        : baskets containing both
      confidence          : pair/support_a  (P(b | a), a < b ordering)
      lift                : pair * n_baskets / (support_a * support_b)

    Scale shape (optimization r12, guide §2.3/§2.4): ONE
    groupBy(basket) with a sorted collect_set folds the (basket, item)
    dedup AND the per-basket roster into a single exchange; ordered
    pairs explode from each roster array (j > i, so item_a < item_b
    with no basket self-join at all), supports come from exploding the
    SAME persisted rosters, and n_baskets is the roster count. The
    per-basket pair fan-out is the roster size squared — identical to
    the old pruned self-join's bound, because Apriori's downward-
    closure prune can never change the RESULT here: pair_support <=
    min(support_a, support_b), so any pair that survives the
    pair_support >= min_support filter already has both item supports
    >= min_support, and the metrics joins against the unpruned support
    table reattach exactly the rows the pruned `frequent` table would
    have.  Metrics joins are item-count-sized.  Returns one row per
    qualifying (item_a, item_b), item_a < item_b.
    """
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    # No persist: the roster subtree appears under supports, pairs and
    # the basket count, and its exchange (which already carries the
    # map-side partial collect_set) is deduplicated by ReusedExchange
    # within the final plan — the same discipline the old items.distinct
    # shape relied on, without pinning executor memory past this call.
    rosters = (
        df.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .groupBy("basket")
        .agg(F.array_sort(F.collect_set("item")).alias("__its"))
    )
    n_baskets = rosters.count()
    supports = (
        rosters.select(F.explode("__its").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    pairs = (
        rosters.select(F.posexplode("__its").alias("__i", "item_a"), "__its")
        .select(
            "item_a",
            F.explode(
                F.slice("__its", F.col("__i") + 2, F.size("__its"))
            ).alias("item_b"),
        )
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_support"))
        .filter(F.col("pair_support") >= min_support)
    )
    sa = supports.select(
        F.col("item").alias("item_a"), F.col("support").alias("support_a")
    )
    sb = supports.select(
        F.col("item").alias("item_b"), F.col("support").alias("support_b")
    )
    return (
        pairs.join(sa, "item_a")
        .join(sb, "item_b")
        .select(
            "item_a",
            "item_b",
            "support_a",
            "support_b",
            "pair_support",
            F.round(
                F.col("pair_support").cast("double")
                / F.col("support_a").cast("double"),
                6,
            ).alias("confidence"),
            F.round(
                (F.col("pair_support") * F.lit(n_baskets)).cast("double")
                / (F.col("support_a") * F.col("support_b")).cast("double"),
                6,
            ).alias("lift"),
        )
    )
