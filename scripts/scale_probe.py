#!/usr/bin/env python
"""Empirical scale-slope probe (round-9 VERDICT task 3): SCALING.md
argues the workhorse operators have linear / n·log n shapes — this
script MEASURES the slope instead of arguing it.

It synthesizes k x sf0.1 inputs (k in $SPARK_GRAFT_PROBE_SCALES,
default "1,3,10") by unioning id-offset copies whose content is
deterministically perturbed so copies are NOT near-duplicates of each
other (a naive copy would add k^2 cross-copy LSH pairs and fake a
superlinear slope where the operator is linear):

  * documents.text — per-copy letter-permutation via translate(): most
    3-shingles change, so cross-copy Jaccard collapses below threshold
    while token counts / lengths / vocabulary statistics stay corpus-like.
  * embeddings.embedding — per-copy deterministic element-wise offset
    (index- and copy-dependent sinusoid), so copies land in different
    regions of the space.
  * events.value — per-copy multiplicative + additive nudge (group keys
    stay FIXED: at 100 TB the group count grows far slower than rows,
    so per-group row counts are what must scale).

Each scale's tables are WRITTEN to parquet (32 splits) and read back,
so every probe times a realistic scan -> shuffle pipeline, not an
in-memory union lineage.

Probes (the five 100 TB workhorses):
  1. minhash_pairs   — signatures + LSH banding + estimate verify
                       (queries._minhash_pairs_from, the registry path)
  2. prefix_filter   — PPJoin prefix-filtered candidates
                       (operators/dedup.prefix_filter_candidates)
  3. cc_star         — large/small-star connected components over the
                       scale's own LSH pairs (pairs are checkpointed
                       OUTSIDE the timed section)
  4. ann_build/search— AnnIndex.build + partition-pruned batch search
  5. hist_quantiles  — histogram build (groupBy lattice) + order
                       statistics (operators/dataset.histogram_order_statistic)

Output: one JSON line per (probe, scale) to stdout + a markdown table
(for SCALING.md) + scale_probe.json next to this script. Timings are
median of $SPARK_GRAFT_PROBE_RUNS (default 2) end-to-end noop writes.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from radient_spark.session import get_session  # noqa: E402

ALPHA = "aeiourstln"  # letters whose per-copy permutation perturbs text
SPLITS = 32  # constant write parallelism: slope measures data, not layout
# One id-offset stride shared by the copy generator AND every consumer
# that re-derives the copy from an id (the PageRank edge generator):
# diverging constants would silently collapse offsets and let edges
# cross copies, invalidating the constant-degree shape (ADVICE r10).
COPY_STRIDE = 10_000_000


def _perturb_text(col, copy: int):
    if copy == 0:
        return col
    rot = ALPHA[copy % len(ALPHA):] + ALPHA[: copy % len(ALPHA)]
    return F.translate(col, ALPHA, rot)


def _synth(spark, sf_dir: str, k: int, out_dir: str) -> dict[str, str]:
    """Write k x {documents, embeddings, events} to out_dir; return paths."""
    from radient_spark.catalog import load_tables

    t = load_tables(spark, sf_dir)
    max_ids = t["documents"].agg(
        F.max("doc_id").alias("d"),
    ).unionByName(
        t["embeddings"].agg(F.max("vec_id").alias("d"))
    ).agg(F.max("d")).first()[0]
    assert max_ids < COPY_STRIDE, (
        f"base corpus ids reach {max_ids} >= COPY_STRIDE {COPY_STRIDE}: "
        "copies would overlap and edges would cross copies"
    )
    paths = {}
    docs = [
        t["documents"].select(
            (F.col("doc_id") + F.lit(c * COPY_STRIDE)).alias("doc_id"),
            "source",
            "lang",
            _perturb_text(F.col("text"), c).alias("text"),
        )
        for c in range(k)
    ]
    embs = [
        t["embeddings"].select(
            (F.col("vec_id") + F.lit(c * COPY_STRIDE)).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: (
                    x + F.sin((i + 1).cast("double") * F.lit(float(c) * 1.7))
                ).cast("float"),
            ).alias("embedding"),
        )
        for c in range(k)
    ]
    evs = [
        t["events"].select(
            "event_type",
            (
                F.col("value") * F.lit(1.0 + c * 0.001) + F.lit(c * 0.01)
            ).alias("value"),
        )
        for c in range(k)
    ]
    for name, parts in [("documents", docs), ("embeddings", embs), ("events", evs)]:
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        path = os.path.join(out_dir, f"x{k}", name)
        df.repartition(SPLITS).write.mode("overwrite").parquet(path)
        paths[name] = path
    return paths


def _timed(fn, runs: int) -> float:
    samples = []
    for _ in range(runs):
        start = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - start)
    return round(statistics.median(samples), 3)


def _noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scales = [
        int(s)
        for s in os.environ.get("SPARK_GRAFT_PROBE_SCALES", "1,3,10").split(",")
    ]
    runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "2"))
    spark = get_session("radient_spark_scale_probe")
    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "spark-warehouse",
        "scale_probe",
    )

    from radient_spark.ann import AnnIndex
    from radient_spark.operators.dataset import histogram_order_statistic
    from radient_spark.operators.dedup import prefix_filter_candidates
    from radient_spark.operators.graph import connected_components_star
    from radient_spark.queries import _minhash_pairs_from

    results: dict[str, dict[int, float]] = {}
    rows: dict[str, dict[int, int]] = {}

    def record(probe: str, k: int, sec: float, n: int) -> None:
        results.setdefault(probe, {})[k] = sec
        rows.setdefault(probe, {})[k] = n
        print(json.dumps({"probe": probe, "scale": k, "sec": sec, "rows": n}))

    for k in scales:
        paths = _synth(spark, sf_dir, k, base)
        docs = spark.read.parquet(paths["documents"])
        embs = spark.read.parquet(paths["embeddings"])
        evs = spark.read.parquet(paths["events"])
        n_docs, n_embs, n_evs = docs.count(), embs.count(), evs.count()

        # 1. MinHash signatures + LSH banding + estimate verify
        record(
            "minhash_pairs",
            k,
            _timed(lambda: _noop(_minhash_pairs_from(docs)), runs),
            n_docs,
        )
        spark.catalog.clearCache()

        # 2. PPJoin prefix-filtered candidates
        toks = docs.filter(F.length(F.trim("text")) > 0).select(
            "doc_id",
            "source",
            F.array_distinct(F.split(F.trim("text"), r"\s+")).alias("toks"),
        )
        record(
            "prefix_filter",
            k,
            _timed(
                lambda: _noop(
                    prefix_filter_candidates(
                        toks,
                        id_col="doc_id",
                        tokens_col="toks",
                        t_num=3,
                        t_den=5,
                        part_col="source",
                    )
                ),
                runs,
            ),
            n_docs,
        )

        # 3. connected components over this scale's own LSH pairs
        # (pair generation is checkpointed OUTSIDE the timed section)
        pairs = (
            _minhash_pairs_from(docs)
            .select("id_a", "id_b")
            .localCheckpoint(eager=True)
        )
        n_pairs = pairs.count()
        spark.catalog.clearCache()
        record(
            "cc_star",
            k,
            _timed(lambda: _noop(connected_components_star(pairs)), runs),
            n_pairs,
        )
        spark.catalog.clearCache()

        # 4. ANN build + batch search
        emb_iv = embs.select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
        )
        qrows = emb_iv.orderBy("id").limit(10).collect()
        queries = [(int(r["id"]), [float(x) for x in r["vector"]]) for r in qrows]
        start = time.perf_counter()
        index = AnnIndex.build(
            emb_iv, n_trees=2, max_leaf_size=100, spill=0.1, seed=42
        )
        ann_path = os.path.join(base, f"x{k}", "ann_index")
        index.save(ann_path)
        record("ann_build", k, round(time.perf_counter() - start, 3), n_embs)
        # Forest-metadata growth (VERDICT r10 watch item / r11 task 3):
        # the broadcast forest + per-level driver cut collect scale with
        # leaf count (~n/leaf), so report the measured bytes alongside
        # seconds — SCALING.md's crossover table is pinned to these.
        print(
            json.dumps(
                {
                    "probe": "ann_forest_meta",
                    "scale": k,
                    "forest_bytes": index.forest_nbytes(),
                    "forest_nodes": index.n_nodes(),
                    "rows": n_embs,
                }
            )
        )
        index = AnnIndex.load(spark, ann_path)
        record(
            "ann_search",
            k,
            _timed(lambda: _noop(index.search(queries, k=10)), runs),
            n_embs,
        )
        shutil.rmtree(ann_path, ignore_errors=True)

        # 4b. the round-10 lattice kernels (SQL-replayable build paths):
        # levels sized like production (leaf ~200) so depth grows with n
        lat_levels = max(2, math.ceil(math.log2(max(2, n_embs / 200))))
        start = time.perf_counter()
        lat = AnnIndex.build_lattice(
            emb_iv, n_trees=2, levels=lat_levels, spill_pm=100, seed=42
        )
        lat.index_df.write.format("noop").mode("overwrite").save()
        record(
            "lattice_build",
            k,
            round(time.perf_counter() - start, 3),
            n_embs,
        )
        print(json.dumps({"probe": "lattice_build", "scale": k,
                          "levels": lat_levels}))
        record(
            "lattice_search",
            k,
            _timed(
                lambda: _noop(lat.search(queries, k=10, metric="cosine")),
                runs,
            ),
            n_embs,
        )

        # 5. histogram build + exact order statistics on the lattice
        vals = evs.select(
            "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
        )
        hist = vals.groupBy("event_type", "cents").agg(
            F.count(F.lit(1)).alias("c")
        )
        record(
            "hist_quantiles",
            k,
            _timed(
                lambda: _noop(
                    histogram_order_statistic(
                        hist, "event_type", "cents", qs=[0.5, 0.9, 0.99]
                    )
                ),
                runs,
            ),
            n_evs,
        )
        # 6. integer PageRank over a synthetic 3-out-regular digraph on
        # the scaled doc ids: every copy keeps its edges internal
        # (targets hash back into the same copy's id range), so nodes
        # AND edges grow k x at constant degree — the shape that
        # isolates the per-round shuffle slope from graph densification
        from radient_spark.operators.graph import pagerank_integer

        per_copy = max(1, n_docs // k)
        orig = F.col("doc_id") % COPY_STRIDE
        offset = F.col("doc_id") - orig
        pr_edges = docs.select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.array(
                    *[
                        (
                            offset
                            + F.abs(F.xxhash64("doc_id", F.lit(j)))
                            % per_copy
                        ).alias(f"t{j}")
                        for j in range(3)
                    ]
                )
            ).alias("dst"),
        ).localCheckpoint(eager=True)  # edge gen outside the timed fold
        record(
            "pagerank_int",
            k,
            _timed(lambda: _noop(pagerank_integer(pr_edges, iters=2)), runs),
            n_docs * 3,
        )
        spark.catalog.clearCache()

        shutil.rmtree(os.path.join(base, f"x{k}"), ignore_errors=True)

    # markdown table for SCALING.md
    print()
    header = "| probe | " + " | ".join(
        f"{k}x sec (rows)" for k in scales
    ) + " | slope {}x/{}x |".format(scales[-1], scales[0])
    print(header)
    print("|" + "---|" * (len(scales) + 2))
    for probe, per_k in results.items():
        slope = per_k[scales[-1]] / per_k[scales[0]] if per_k[scales[0]] else 0
        cells = " | ".join(
            f"{per_k[k]} ({rows[probe][k]})" for k in scales
        )
        print(f"| {probe} | {cells} | {slope:.2f}x |")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scale_probe.json")
    with open(out, "w") as f:
        json.dump({"scales": scales, "results": results, "rows": rows}, f, indent=1)
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
