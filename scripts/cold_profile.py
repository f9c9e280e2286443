#!/usr/bin/env python
"""Decompose per-query cost: DataFrame CONSTRUCTION (python + analysis)
vs first noop EXECUTION (cold: codegen + jobs) vs warm re-execution.

Usage: python scripts/cold_profile.py [--runs N] q_a q_b ...
Writes scripts/cold_profile.json. Guide §1: find where the cold-sweep
floor (~1.0 s median over 130 cheap queries) actually goes before
touching anything.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from radient_spark.queries import QUERIES  # noqa: E402
from radient_spark.session import get_session  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    runs = 2
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("cold_profile")
    sc = spark.sparkContext

    # identical warmup to bench.py: JVM, python worker pool, page cache
    fn, _ = QUERIES["q01_pricing_summary"]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def _warm_workers(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from batches

    spark.range(0, 64, 1, 64).mapInPandas(_warm_workers, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    tracker = sc.statusTracker()
    out: dict[str, dict] = {}
    for name in names:
        fn, _ = QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        # force analysis so construction includes the analyzer
        _ = df.schema
        t1 = time.perf_counter()
        jobs_before = len(tracker.getJobIdsForGroup() or [])
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        warm = []
        for _r in range(runs):
            tw = time.perf_counter()
            df2 = fn(spark, sf_dir)
            df2.write.format("noop").mode("overwrite").save()
            warm.append(round(time.perf_counter() - tw, 3))
        njobs = len(sc._jsc.sc().statusTracker().getJobIdsForGroup(None))
        out[name] = {
            "construct_s": round(t1 - t0, 3),
            "cold_exec_s": round(t2 - t1, 3),
            "warm_total_s": warm,
            # per-query job count for the cold noop write (round-12
            # advice: report the delta, not just the cumulative total)
            "jobs_cold": njobs - jobs_before,
            "jobs_cum": njobs,
        }
        print(
            f"{name}: construct {out[name]['construct_s']}s, "
            f"cold exec {out[name]['cold_exec_s']}s, warm {warm}",
            flush=True,
        )
    with open(os.path.join(os.path.dirname(__file__), "cold_profile.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
