"""Vector-metadata map ops (≡ radient Vector.putmeta/popmeta/todict)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from radient_spark.functions import meta as M


def test_put_get_pop_roundtrip(spark):
    df = spark.createDataFrame([(1,)], "id long").withColumn("meta", M.empty_meta())
    df = df.withColumn("meta", M.putmeta("meta", "source", F.lit("local")))
    df = df.withColumn("meta", M.putmeta("meta", "batch", F.lit(7)))
    row = df.collect()[0]
    assert row["meta"] == {"source": "local", "batch": "7"}

    # overwrite
    df2 = df.withColumn("meta", M.putmeta("meta", "source", F.lit("s3")))
    assert df2.collect()[0]["meta"]["source"] == "s3"

    # pop
    df3 = df.withColumn("meta", M.popmeta("meta", "batch"))
    assert df3.collect()[0]["meta"] == {"source": "local"}

    assert df.withColumn("v", M.getmeta("meta", "source")).collect()[0]["v"] == "local"


def test_stamp_and_todict(spark):
    df = (
        spark.createDataFrame(
            [(1, "hello", [0.5, 0.5])], "id long, text string, vec array<float>"
        )
        .withColumn("meta", M.empty_meta())
        .withColumn("meta", M.stamp("meta", F.col("text"), F.lit("text")))
    )
    row = df.collect()[0]
    assert row["meta"] == {"data": "hello", "type": "text"}
    d = json.loads(df.withColumn("j", M.todict("meta", "vec")).collect()[0]["j"])
    assert d["vector"] == [0.5, 0.5]
    assert d["meta"]["type"] == "text"
