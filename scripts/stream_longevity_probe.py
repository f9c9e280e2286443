#!/usr/bin/env python
"""Streaming-state longevity probe (round-11 VERDICT task 4).

The LSH first-arrival gate's ownership state grows monotonically with
distinct band keys seen. This probe runs N micro-batches (default 50)
of disjoint documents through lsh_dedup_sink as ONE continuous query
(maxFilesPerTrigger=1) and records, from Spark's own progress events,
per-batch trigger latency, plus the on-disk claim-log layout at the
end. The question it answers with numbers: is per-batch cost O(batch)
(flat slope, compaction spikes every _COMPACT_EVERY batches) or
O(state) (linear climb — the pre-round-11 full-rewrite layout)?

Output: one JSON line per batch + a summary line + stream_longevity.json
next to this script (SCALING.md cites the summary).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from radient_spark.session import get_session  # noqa: E402


def main() -> None:
    n_batches = int(os.environ.get("SPARK_GRAFT_LONGEVITY_BATCHES", "50"))
    docs_per_batch = int(os.environ.get("SPARK_GRAFT_LONGEVITY_DOCS", "200"))
    spark = get_session("radient_spark_longevity_probe")
    spark.sparkContext.setLogLevel("ERROR")

    from radient_spark import streaming

    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "spark-warehouse",
        "longevity_probe",
    )
    shutil.rmtree(base, ignore_errors=True)
    in_dir = f"{base}/in"
    dd = f"{base}/dedup"
    ck = f"{base}/ck"

    # Disjoint texts per batch: every batch contributes ~docs*bands NEW
    # band keys, so total state grows linearly while per-batch input is
    # constant — the exact regime where O(state) per-batch cost shows as
    # a linear latency climb. ~10% near-dup rows keep the flag path hot.
    schema = "doc_id bigint, text string"
    for e in range(n_batches):
        rows = []
        for i in range(docs_per_batch):
            if i % 10 == 9:
                rows.append(
                    (e * docs_per_batch + i, f"batch {e} shared near dup body "
                     f"{i % 3} with a long common tail of words")
                )
            else:
                rows.append(
                    (e * docs_per_batch + i,
                     f"unique document {e} {i} " + " ".join(
                         f"w{e}_{i}_{j}" for j in range(12)))
                )
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    # ONE continuous query, one file per trigger: per-batch latencies
    # come from Spark's progress events, not wall-clock bracketing.
    from radient_spark.operators.dedup import lsh_buckets, with_minhash  # noqa: F401

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    t0 = time.perf_counter()
    q = streaming.lsh_dedup_sink(
        stream, dd, ck, num_hashes=16, shingle_k=3, bands=4
    )
    progress = []
    idle = 0
    while idle < 10:
        time.sleep(1.0)
        seen = {p["batchId"] for p in progress}
        for p in q.recentProgress:
            if p["batchId"] not in seen and p["numInputRows"] > 0:
                progress.append(
                    {
                        "batchId": p["batchId"],
                        "rows": p["numInputRows"],
                        "ms": p["durationMs"]["triggerExecution"],
                    }
                )
                seen.add(p["batchId"])
        if len(progress) >= n_batches or not q.status["isDataAvailable"]:
            idle += 1
        else:
            idle = 0
    q.stop()
    wall = round(time.perf_counter() - t0, 1)
    progress.sort(key=lambda p: p["batchId"])
    for p in progress:
        print(json.dumps({"probe": "first_arrival_batch", **p}))

    # slope: least-squares ms-per-batch over the steady region (skip the
    # first 3 warmup batches); compaction batches ride along — they ARE
    # the amortized cost.
    steady = progress[3:]
    xs = [p["batchId"] for p in steady]
    ys = [p["ms"] for p in steady]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / max(
        1e-9, sum((x - mx) ** 2 for x in xs)
    )
    med = statistics.median(ys)

    def du(d):
        total = 0
        for root, _, files in os.walk(d):
            total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        return total

    state_dir = f"{dd}/state"
    parts = sorted(os.listdir(state_dir)) if os.path.isdir(state_dir) else []
    summary = {
        "probe": "first_arrival_longevity",
        "batches": len(progress),
        "docs_per_batch": docs_per_batch,
        "median_batch_ms": med,
        "slope_ms_per_batch": round(slope, 2),
        "slope_pct_of_median": round(100.0 * slope / med, 2),
        "wall_sec": wall,
        "state_bytes": du(state_dir),
        "flags_bytes": du(f"{dd}/flags"),
        "state_parts": {
            "base": sum(1 for p in parts if p == "base"),
            "deltas": sum(1 for p in parts if p.startswith("delta-")),
            "epoch_markers": sum(1 for p in parts if p.startswith("_EPOCH-")),
        },
    }
    print(json.dumps(summary))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "stream_longevity.json")
    with open(out, "w") as f:
        json.dump({"summary": summary, "batches": progress}, f, indent=1)
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
