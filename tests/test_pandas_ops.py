"""applyInPandas UDAF + Python UDTF surfaces."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from radient_spark.catalog import load_tables
from radient_spark.operators import pandas_ops


def test_grouped_quantiles_match_numpy(spark, sf_dir):
    orders = load_tables(spark, sf_dir)["orders"]
    got = {
        r["o_orderstatus"]: (r["q25"], r["q50"], r["q75"], r["n"])
        for r in pandas_ops.grouped_exact_quantiles(
            orders, ["o_orderstatus"], "o_totalprice"
        ).collect()
    }
    rows = orders.select("o_orderstatus", "o_totalprice").collect()
    by_status: dict = {}
    for r in rows:
        by_status.setdefault(r["o_orderstatus"], []).append(r["o_totalprice"])
    assert set(got) == set(by_status)
    for status, vals in by_status.items():
        v = np.array(vals)
        q25, q50, q75, n = got[status]
        assert n == len(vals)
        assert abs(q50 - np.quantile(v, 0.5)) < 1e-9
        assert abs(q25 - np.quantile(v, 0.25)) < 1e-9
        assert abs(q75 - np.quantile(v, 0.75)) < 1e-9


def test_shingle_udtf(spark):
    udtf_cls = pandas_ops.make_shingle_udtf()
    spark.udtf.register("shingles", udtf_cls)
    rows = spark.sql(
        "SELECT s.shingle, s.pos FROM shingles('a b c d', 3) AS s"
    ).collect()
    assert [(r["shingle"], r["pos"]) for r in rows] == [
        ("a b c", 0),
        ("b c d", 1),
    ]
    # lateral join over a table
    df = spark.createDataFrame([(1, "x y"), (2, "")], "id long, text string")
    df.createOrReplaceTempView("udtf_docs")
    out = spark.sql(
        "SELECT id, s.shingle FROM udtf_docs, "
        "LATERAL shingles(text, 3) AS s"
    ).collect()
    assert [(r["id"], r["shingle"]) for r in out] == [(1, "x y")]
