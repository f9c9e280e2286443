"""Frequent-itemset mining (market-basket association rules): the
distributed Apriori first stages — frequent items, frequent pairs, and
support/confidence/lift rule stats.

Spark-first shape: the Apriori downward-closure prune runs BEFORE the
pair self-join (an item infrequent alone cannot appear in a frequent
pair), so the quadratic step only sees frequent items — the standard
trick that keeps basket self-joins tractable at scale.  Everything is
counts + one self-join keyed on the basket id; rule metrics are exact
integer ratios with one rounded IEEE division each, so DuckDB oracles
hash-match.
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

    Pipeline: distinct (basket, item) -> item support counts ->
    downward-closure prune (support >= min_support) -> ordered pair
    self-join on the basket -> pair support filter -> metrics:

      support_a/support_b : item supports (baskets containing it)
      pair_support        : baskets containing both
      confidence          : pair/support_a  (P(b | a), a < b ordering)
      lift                : pair * n_baskets / (support_a * support_b)

    Scale shape: the self-join shuffles only PRUNED (basket, item)
    rows and its fan-out per basket is bounded by that basket's
    frequent-item count squared — the Apriori guarantee; without the
    prune a hub basket explodes quadratically.  Metrics joins are
    item-count-sized.  Returns one row per qualifying (item_a,
    item_b), item_a < item_b.
    """
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    items = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    supports = items.groupBy("item").agg(F.count(F.lit(1)).alias("support"))
    frequent = supports.filter(F.col("support") >= min_support)
    pruned = items.join(frequent.select("item"), "item", "semi")
    a = pruned.select(F.col("basket"), F.col("item").alias("item_a"))
    b = pruned.select(F.col("basket"), F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_support"))
        .filter(F.col("pair_support") >= min_support)
    )
    n_baskets = items.select("basket").distinct().count()
    sa = frequent.select(
        F.col("item").alias("item_a"), F.col("support").alias("support_a")
    )
    sb = frequent.select(
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
