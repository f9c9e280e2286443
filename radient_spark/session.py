"""SparkSession builder tuned for the driver's local[N] harness.

On a real cluster the same builder is used with master/memory supplied by
spark-submit; only the local-mode fallbacks below differ.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(app_name: str = "radient_spark") -> SparkSession:
    """Build (or reuse) a SparkSession with scale-oriented defaults.

    - AQE on: runtime coalescing, skew-join splitting, dynamic join strategy.
    - Arrow on: every Pandas-UDF boundary is columnar.
    - shuffle.partitions sized to the local core count (driver harness);
      a cluster deployment overrides via spark-submit conf.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
