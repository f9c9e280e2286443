"""Partition-pruned layout: date-partitioned writes must limit reads to
matching partitions — the dominant data-skipping lever at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from radient_spark.catalog import load_tables
from radient_spark.plans import formatted_plan


def test_date_partitioned_scan_prunes(spark, sf_dir, tmp_path):
    ev = load_tables(spark, sf_dir)["events"]
    out = str(tmp_path / "events_by_day")
    ev.withColumn("day", F.to_date("ts")).write.partitionBy("day").parquet(out)

    one_day = spark.read.parquet(out).filter(F.col("day") == "2024-01-05")

    # the scan must carry the partition filter (pruning happens at the
    # file index, before any data is read)
    plan = formatted_plan(one_day)
    pf_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf_lines and any("2024-01-05" in l for l in pf_lines), plan

    # correctness: partition-pruned result equals row-filtered original
    want = ev.filter(F.to_date("ts") == "2024-01-05").count()
    got = one_day.count()
    assert got == want and got > 0
