#!/usr/bin/env python
"""Forest-metadata growth probe (round-11 VERDICT task 3 companion).

scripts/scale_probe.py now emits ann_forest_meta lines inside the full
5-family sweep; this standalone probe answers ONLY the forest-bytes
question so it can run without claiming a quiet-timing window: the
broadcast forest's size is deterministic in (rows, dim, leaf), so the
bytes/nodes columns are valid under any host load (build seconds ride
along flagged with the pre-run loadavg).

Builds AnnIndex on k x sf0.1 embeddings (id-offset copies, per-copy
deterministic element-wise perturbation as in scale_probe._synth) for
k in SPARK_GRAFT_PROBE_SCALES (default 1,3,10), reports measured
forest_nbytes()/n_nodes() next to the forest_crossover_rows estimate,
and writes forest_bytes_probe.json next to this script.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from radient_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scales = [
        int(s)
        for s in os.environ.get("SPARK_GRAFT_PROBE_SCALES", "1,3,10").split(",")
    ]
    spark = get_session("radient_spark_forest_probe")
    spark.sparkContext.setLogLevel("ERROR")

    from scale_probe import COPY_STRIDE  # shared stride, ADVICE r10

    from radient_spark.ann import AnnIndex, forest_crossover_rows

    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    )
    dim = len(base.select("vector").first()[0])
    try:
        load1 = os.getloadavg()[0]
    except OSError:
        load1 = None

    results = []
    for k in scales:
        copies = [
            base.select(
                (F.col("id") + F.lit(c * COPY_STRIDE)).alias("id"),
                F.transform(
                    "vector",
                    lambda x, i: (
                        x + F.sin((i + 1).cast("double") * F.lit(float(c) * 1.7))
                    ).cast("float"),
                ).alias("vector"),
            )
            for c in range(k)
        ]
        df = copies[0]
        for p in copies[1:]:
            df = df.unionByName(p)
        df = df.localCheckpoint(eager=True)
        n = df.count()
        t0 = time.perf_counter()
        index = AnnIndex.build(df, n_trees=2, max_leaf_size=100, spill=0.1, seed=42)
        sec = round(time.perf_counter() - t0, 2)
        row = {
            "probe": "forest_bytes",
            "scale": k,
            "rows": n,
            "dim": dim,
            "forest_bytes": index.forest_nbytes(),
            "forest_nodes": index.n_nodes(),
            "build_sec_load_noisy": sec,
            "loadavg1_at_start": load1,
        }
        results.append(row)
        print(json.dumps(row))
        spark.catalog.clearCache()

    est = {
        f"crossover_rows_dim{d}": forest_crossover_rows(d)
        for d in (64, 128, 768)
    }
    # extrapolate measured bytes/row to the estimator's crossover check
    last = results[-1]
    bytes_per_row = last["forest_bytes"] / last["rows"]
    measured_crossover = int((512 << 20) / bytes_per_row)
    summary = {
        "probe": "forest_bytes_summary",
        "bytes_per_row_at_leaf100": round(bytes_per_row, 3),
        "measured_crossover_rows_at_leaf100": measured_crossover,
        **est,
    }
    print(json.dumps(summary))
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "forest_bytes_probe.json"
    )
    with open(out, "w") as f:
        json.dump({"rows": results, "summary": summary}, f, indent=1)


if __name__ == "__main__":
    main()
