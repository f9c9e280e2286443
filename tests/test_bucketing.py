"""Bucketed co-located joins: the zero-shuffle fact-to-fact strategy."""

from __future__ import annotations

from pyspark.sql import functions as F

from radient_spark import plans
from radient_spark.catalog import load_tables
from radient_spark.sources import write_bucketed


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    import shutil

    t = load_tables(spark, sf_dir)
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
    write_bucketed(
        t["lineitem"].select("l_orderkey", "l_quantity", "l_extendedprice"),
        "b_lineitem",
        bucket_col="l_orderkey",
        n_buckets=8,
    )
    write_bucketed(
        t["orders"].select("o_orderkey", "o_totalprice"),
        "b_orders",
        bucket_col="o_orderkey",
        n_buckets=8,
    )
    li = spark.table("b_lineitem")
    o = spark.table("b_orders")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q")
    )
    # co-located: the join itself requires NO Exchange; only the final
    # aggregate may shuffle (and even that is bucket-aligned here)
    n_shuffles = plans.shuffle_count(joined)
    assert n_shuffles == 0, plans.formatted_plan(joined)

    # same join without bucketing shuffles both sides
    plain = (
        t["lineitem"]
        .select("l_orderkey", "l_quantity")
        .join(
            t["orders"].select("o_orderkey", "o_totalprice").hint("merge"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    assert plans.shuffle_count(plain) >= 2

    # correctness: bucketed join result equals plain join result
    got = joined.agg(F.sum("q")).collect()[0][0]
    want = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .agg(F.sum("l_quantity"))
        .collect()[0][0]
    )
    assert got == want
