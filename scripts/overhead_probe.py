#!/usr/bin/env python
"""Quantify the per-query FIXED overhead of the bench path (guide §1).

Components measured at sf0.1 (each repeated, median reported):
  1. load_tables() call alone — schema inference = 10 parquet footer
     reads on the driver per query invocation, before any job runs.
  2. A trivial single-table aggregate, end to end (noop sink), timed
     (a) through the normal query path and (b) with the load_tables
     cost stripped out — the difference is the catalog overhead every
     one of the ~185 bench queries pays.

Writes scripts/overhead_probe.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from radient_spark.catalog import load_tables  # noqa: E402
from radient_spark.queries import QUERIES  # noqa: E402
from radient_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("overhead_probe")
    # warm: JVM, worker pool, page cache
    fn, _ = QUERIES["q01_pricing_summary"]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    out: dict[str, object] = {"sf_dir": sf_dir}

    reps = 7
    lt = []
    for _ in range(reps):
        t0 = time.perf_counter()
        load_tables(spark, sf_dir)
        lt.append(time.perf_counter() - t0)
    out["load_tables_sec"] = round(statistics.median(lt), 4)
    out["load_tables_samples"] = [round(x, 4) for x in lt]

    # trivial end-to-end query: count+sum over one small table via the
    # registry path (the floor every registry query sits on)
    for name in ("q01_pricing_summary", "q_user_sessions"):
        fn, _ = QUERIES[name]
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        out[f"{name}_sec"] = round(statistics.median(ts), 4)

    # same aggregate with tables pre-loaded (catalog cost stripped)
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    from pyspark.sql import functions as F

    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        li.groupBy("l_returnflag").agg(
            F.sum("l_quantity"), F.count(F.lit(1))
        ).write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    out["preloaded_lineitem_agg_sec"] = round(statistics.median(ts), 4)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "overhead_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
