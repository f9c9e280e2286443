#!/usr/bin/env python
"""Interleaved micro-bench for a subset of registry queries (guide §1).

Usage: python scripts/ab_bench.py [--runs N] [--tag LABEL] q_a q_b ...

Times each named query end-to-end with the noop sink, interleaving the
passes (A,B,C,...,A,B,C,...) so a transient host-load spike cannot
poison all samples of one query. Reports per-query min and median and
writes scripts/ab_bench_<tag>.json. The bench.py sweep methodology is
unchanged; this is the fast inner loop for optimize/re-measure cycles.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from radient_spark.queries import QUERIES  # noqa: E402
from radient_spark.session import get_session  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    runs = 4
    tag = "run"
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i : i + 2]
    names = args
    unknown = [n for n in names if n not in QUERIES]
    assert not unknown, f"unknown queries: {unknown}"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("ab_bench")

    # warm: JVM, worker pool, page cache
    fn, _ = QUERIES["q01_pricing_summary"]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def _warm_workers(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from batches

    spark.range(0, 64, 1, 64).mapInPandas(_warm_workers, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    samples: dict[str, list[float]] = {n: [] for n in names}
    for p in range(runs):
        for name in names:
            fn, _ = QUERIES[name]
            spark.sparkContext.setJobDescription(f"{tag}:{name}:pass{p}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()

    out = {
        "tag": tag,
        "sf_dir": sf_dir,
        "runs": runs,
        "min": {n: round(min(s), 3) for n, s in samples.items()},
        "median": {n: round(statistics.median(s), 3) for n, s in samples.items()},
        "samples": {n: [round(x, 3) for x in s] for n, s in samples.items()},
        "total_min": round(sum(min(s) for s in samples.values()), 3),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), f"ab_bench_{tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    for n in names:
        print(f"{out['min'][n]:7.3f}  (med {out['median'][n]:7.3f})  {n}")
    print(f"total(min): {out['total_min']:.3f}  -> {path}")


if __name__ == "__main__":
    main()
