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
        # Join strategy (optimization r12, guide §3.1): let the planner
        # pick shuffled-hash over sort-merge when its size conditions
        # hold, and let AQE rewrite SMJ->SHJ when every post-shuffle
        # partition is under the local-map threshold. Measured at sf0.1
        # (interleaved min-of-3, 12 join-heavy queries): 50.5s -> 47.5s,
        # no regressions (q21 2.69->2.25, q_entity_resolution
        # 5.10->4.36, q_kcore_suppliers 3.57->3.13). At cluster scale
        # the threshold bounds build-side memory per task; both knobs
        # are env-overridable for deployments with tighter executors.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_LOCALMAP_THRESHOLD", "64m"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
    )
    # Free-form conf passthrough for deployments and A/B measurement:
    # "k1=v1;k2=v2". Applied last, so it can override any default above.
    extra = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for kv in extra.split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
