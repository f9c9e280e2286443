"""Catalog: load the driver's parquet tables and register temp views.

Mirrors the reference's source layer (radient/tasks/sources/local.py:7-26 —
a directory walk yielding file paths) done Spark-style: `spark.read.parquet`
gives us distributed scans with predicate pushdown and column pruning for
free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The driver's parquet stores timestamps as TIMESTAMP(NANOS), which Spark's
# vectorized reader rejects. We read them as raw nanos (legacy conf below)
# and truncate to microsecond timestamps — exactly what DuckDB's reader does,
# so oracle comparisons agree. Integer `div` (not double /) preserves full
# precision: nanos exceed 2^53.
TIMESTAMP_NANOS_COLS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Read every driver table as a DataFrame (lazy scans, nothing cached)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The driver may hand us a vanilla session: pin UTC so collected
    # timestamps agree with the (naive-UTC) parquet/DuckDB values.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        dtypes = dict(df.dtypes)
        for c in TIMESTAMP_NANOS_COLS.get(name, ()):
            if dtypes.get(c) == "bigint":
                df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        out[name] = df
    return out


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register all tables as temp views so `spark.sql` sees them."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
