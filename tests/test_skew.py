"""Salting helpers must preserve exact semantics on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from radient_spark.operators import skew


def _skewed_df(spark):
    # one giant key (0) + a long tail
    rows = [(0, float(i % 7)) for i in range(5000)] + [
        (k, float(k)) for k in range(1, 200)
    ]
    return spark.createDataFrame(rows, "k long, x double")


def test_salted_aggregate_equals_plain(spark):
    df = _skewed_df(spark)
    plain = {
        (r["k"]): (r["cnt"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("x").alias("s"))
        .collect()
    }
    salted = {
        (r["k"]): (r["cnt"], r["s"])
        for r in skew.salted_aggregate(
            df,
            ["k"],
            aggs=lambda: [F.count(F.lit(1)).alias("cnt"), F.sum("x").alias("s")],
            merge=lambda: [F.sum("cnt").alias("cnt"), F.sum("s").alias("s")],
        ).collect()
    }
    assert plain.keys() == salted.keys()
    for k in plain:
        assert plain[k][0] == salted[k][0]
        assert abs(plain[k][1] - salted[k][1]) < 1e-6


def test_salted_join_equals_plain(spark):
    big = _skewed_df(spark)
    small = spark.createDataFrame(
        [(k, f"dim_{k}") for k in range(0, 200, 2)], "k long, name string"
    )
    plain = sorted(
        (r["k"], r["x"], r["name"]) for r in big.join(small, "k").collect()
    )
    salted = sorted(
        (r["k"], r["x"], r["name"])
        for r in skew.salted_join(big, small, "k", salt=4).collect()
    )
    assert plain == salted
