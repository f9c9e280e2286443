"""ANN index property tests (SURVEY.md §5.2 item 3): recall vs exact
brute force, leaf balance, persistence round-trip."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from radient_spark.ann import AnnIndex
from radient_spark.catalog import load_tables


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return (
        load_tables(spark, sf_dir)["embeddings"]
        .select(F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))
        .cache()
    )


@pytest.fixture(scope="module")
def index(emb):
    return AnnIndex.build(emb, n_trees=4, max_leaf_size=100, seed=42)


def _exact_topk(emb_rows, queries, k):
    ids = np.array([r["id"] for r in emb_rows])
    M = np.array([r["vector"] for r in emb_rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    out = {}
    for qid, vec in queries:
        q = np.asarray(vec, dtype=np.float64)
        s = Mn @ (q / np.linalg.norm(q))
        order = np.lexsort((ids, -np.round(s, 6)))
        out[qid] = set(ids[order[:k]].tolist())
    return out


def test_leaf_balance(index, emb):
    n = emb.count()
    sizes = [
        r["cnt"]
        for r in index.index_df.groupBy("tree_id", "leaf_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    ]
    # every tree covers all rows (spill duplicates boundary rows)
    total = sum(sizes)
    assert total >= n * len(index.trees)
    # median split keeps leaves within ~2.5x of the ideal size
    n_leaves_per_tree = len(sizes) / len(index.trees)
    ideal = n / n_leaves_per_tree
    assert max(sizes) <= max(2.5 * ideal, 16), (max(sizes), ideal)


def test_recall_vs_exact(spark, index, emb):
    rows = emb.collect()
    rng = np.random.RandomState(0)
    qidx = rng.choice(len(rows), 20, replace=False)
    queries = [(int(i), list(rows[i]["vector"])) for i in qidx]
    exact = _exact_topk(rows, queries, k=10)
    got = index.search(queries, k=10)
    ann = {}
    for r in got.collect():
        ann.setdefault(r["qid"], set()).add(r["id"])
    recalls = [len(ann.get(q, set()) & exact[q]) / 10 for q, _ in queries]
    mean_recall = float(np.mean(recalls))
    # 4 random-bisection trees on near-orthogonal data: recall well above
    # the single-leaf chance level; self-hit must always be found
    assert mean_recall >= 0.5, recalls
    for qid, _ in queries:
        assert qid in ann[qid]  # the query vector itself is always hit


def test_search_candidates_bounded(index, emb):
    n = emb.count()
    rows = emb.take(5)
    queries = [(int(r["id"]), list(r["vector"])) for r in rows]
    got = index.search(queries, k=10).collect()
    assert len(got) == 5 * 10
    # scores sorted desc per query
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append(r["score"])
    for scores in by_q.values():
        assert scores == sorted(scores, reverse=True)


def test_ivf_recall(spark, emb):
    from radient_spark.ann import IvfIndex

    idx = IvfIndex.build(emb, n_cells=16, seed=42)
    rows = emb.collect()
    rng = np.random.RandomState(1)
    qidx = rng.choice(len(rows), 15, replace=False)
    queries = [(int(i), list(rows[i]["vector"])) for i in qidx]
    exact = _exact_topk(rows, queries, k=10)
    ann = {}
    for r in idx.search(queries, k=10, n_probes=8).collect():
        ann.setdefault(r["qid"], set()).add(r["id"])
    recalls = [len(ann.get(q, set()) & exact[q]) / 10 for q, _ in queries]
    assert float(np.mean(recalls)) >= 0.6, recalls
    # probing all cells must give exact results
    ann_full = {}
    for r in idx.search(queries[:5], k=10, n_probes=16).collect():
        ann_full.setdefault(r["qid"], set()).add(r["id"])
    for q, _ in queries[:5]:
        assert ann_full[q] == exact[q]


def test_ivf_cells_cover_everything(spark, emb):
    from radient_spark.ann import IvfIndex

    idx = IvfIndex.build(emb, n_cells=16, seed=42)
    assert idx.index_df.count() == emb.count()
    assert idx.index_df.select("id").distinct().count() == emb.count()


def test_save_load_roundtrip(spark, index, emb, tmp_path):
    path = str(tmp_path / "ann_index")
    index.save(path)
    loaded = AnnIndex.load(spark, path)
    assert loaded.dim == index.dim
    assert len(loaded.trees) == len(index.trees)
    rows = emb.take(3)
    queries = [(int(r["id"]), list(r["vector"])) for r in rows]
    a = {(r["qid"], r["id"]) for r in index.search(queries, k=5).collect()}
    b = {(r["qid"], r["id"]) for r in loaded.search(queries, k=5).collect()}
    assert a == b

def test_search_df_matches_list_search(spark, index, emb):
    rows = emb.take(8)
    queries = [(int(r["id"]), list(r["vector"])) for r in rows]
    qdf = spark.createDataFrame(queries, "qid long, qvec array<float>").repartition(3)
    a = {(r["qid"], r["id"]) for r in index.search(queries, k=10).collect()}
    b = {(r["qid"], r["id"]) for r in index.search_df(qdf, k=10).collect()}
    assert a == b


def test_ivf_search_df_matches_list_search(spark, emb):
    from radient_spark.ann import IvfIndex

    idx = IvfIndex.build(emb, n_cells=16, seed=42)
    rows = emb.take(8)
    queries = [(int(r["id"]), list(r["vector"])) for r in rows]
    qdf = spark.createDataFrame(queries, "qid long, qvec array<float>").repartition(3)
    # probe every cell so the comparison is exact regardless of fp-level
    # centroid-distance tie ordering between the two assignment paths
    a = {(r["qid"], r["id"]) for r in idx.search(queries, k=10, n_probes=16).collect()}
    b = {(r["qid"], r["id"]) for r in idx.search_df(qdf, k=10, n_probes=16).collect()}
    assert a == b


def test_search_df_query_side_not_collected(spark, index, emb):
    qdf = emb.limit(4).select(F.col("id").alias("qid"), F.col("vector").alias("qvec"))
    plan = index.search_df(qdf, k=5)._jdf.queryExecution().executedPlan().toString()
    # descent runs as an executor-side Pandas UDF over the query table
    assert "MapInPandas" in plan


def test_ivf_save_load_roundtrip(spark, emb, tmp_path):
    from radient_spark.ann import IvfIndex

    idx = IvfIndex.build(emb, n_cells=8, seed=42)
    path = str(tmp_path / "ivf")
    idx.save(path)
    loaded = IvfIndex.load(spark, path)
    assert np.allclose(loaded.centroids, idx.centroids)
    assert loaded.index_df.count() == emb.count()
    rows = emb.take(4)
    queries = [(int(r["id"]), list(r["vector"])) for r in rows]
    a = {(r["qid"], r["id"]) for r in idx.search(queries, k=5, n_probes=8).collect()}
    b = {(r["qid"], r["id"]) for r in loaded.search(queries, k=5, n_probes=8).collect()}
    assert a == b
    # probed cells reach the partitioned scan as a literal filter
    plan = loaded.search(queries, k=5, n_probes=2)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1][:200]
    assert "cell_id" in pf, pf


def test_ivf_incremental_add_and_append_save(spark, emb, tmp_path):
    from radient_spark.ann import IvfIndex

    first = emb.filter(F.col("id") % 2 == 0)
    rest = emb.filter(F.col("id") % 2 == 1)
    idx = IvfIndex.build(first, n_cells=8, seed=42)
    grown = idx.add(rest)
    # frozen coarse quantizer, complete coverage, no row lost or duplicated
    assert np.allclose(grown.centroids, idx.centroids)
    assert grown.index_df.count() == emb.count()
    assert grown.index_df.select("id").distinct().count() == emb.count()
    # full-probe search over the grown index is exact over ALL rows,
    # including ones the centroids never saw
    rows = emb.collect()
    queries = [(int(r["id"]), list(r["vector"])) for r in rows[:5]]
    exact = _exact_topk(rows, queries, k=5)
    got = {}
    for r in grown.search(queries, k=5, n_probes=8).collect():
        got.setdefault(r["qid"], set()).add(r["id"])
    for q, _ in queries:
        assert got[q] == exact[q]

    # on-disk append: only assignment runs; reload sees the union
    path = str(tmp_path / "ivf_inc")
    idx.save(path)
    idx.append_save(rest, path)
    loaded = IvfIndex.load(spark, path)
    assert loaded.index_df.count() == emb.count()
    got2 = {}
    for r in loaded.search(queries, k=5, n_probes=8).collect():
        got2.setdefault(r["qid"], set()).add(r["id"])
    for q, _ in queries:
        assert got2[q] == exact[q]


def test_cosine_build_kernel_recall_unnormalized(spark, emb):
    """Round-5 item: angular (spherical 2-means) build kernel. Scale
    each corpus vector by a per-row magnitude so euclidean and angular
    geometry disagree, build with metric="cosine", and check cosine
    recall holds the same floor as the euclidean kernel holds on the
    unscaled corpus — descent must normalize queries (the forest cuts
    live in unit space)."""
    rows = emb.collect()
    rng = np.random.RandomState(3)
    scales = rng.uniform(0.1, 50.0, size=len(rows))
    scaled = [
        (int(r["id"]), [float(x * s) for x in r["vector"]])
        for r, s in zip(rows, scales)
    ]
    df = spark.createDataFrame(scaled, "id long, vector array<float>")
    idx = AnnIndex.build(
        df, n_trees=4, max_leaf_size=100, seed=42, metric="cosine"
    )
    assert idx.build_metric == "cosine"
    qidx = rng.choice(len(scaled), 15, replace=False)
    queries = [(int(i), scaled[i][1]) for i in qidx]
    exact = _exact_topk(df.collect(), queries, k=10)
    ann = {}
    for r in idx.search(queries, k=10, metric="cosine").collect():
        ann.setdefault(r["qid"], set()).add(r["id"])
    recalls = [len(ann.get(q, set()) & exact[q]) / 10 for q, _ in queries]
    assert float(np.mean(recalls)) >= 0.5, recalls
    # round-trip keeps the metric (old indexes load as euclidean)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        idx.save(f"{d}/ix")
        loaded = AnnIndex.load(spark, f"{d}/ix")
        assert loaded.build_metric == "cosine"


def test_ivf_delete_and_tombstones(spark, emb, tmp_path):
    """Round-5: IVF deletion — in-memory anti-join, lazy tombstones on
    a saved index, and compaction that rewrites only touched cells."""
    from radient_spark.ann import IvfIndex, _local_parquet_exists

    idx = IvfIndex.build(emb, n_cells=8, seed=42)
    n = emb.count()
    gone = emb.select("id").orderBy("id").limit(5)

    # in-memory delete
    idx2 = idx.delete(gone)
    assert idx2.index_df.count() == n - 5
    qrow = emb.orderBy(F.col("id").desc()).first()
    hits = idx2.search([(0, list(qrow["vector"]))], k=5, n_probes=8).collect()
    gone_ids = {r["id"] for r in gone.collect()}
    assert not ({r["id"] for r in hits} & gone_ids)

    # tombstones on a saved index: load applies them lazily
    p = str(tmp_path / "ivf")
    idx.save(p)
    idx.tombstone_save(gone, p)
    loaded = IvfIndex.load(spark, p)
    assert loaded.index_df.count() == n - 5

    # compaction folds them in and drops the sidecar
    IvfIndex.compact(spark, p)
    assert not _local_parquet_exists(f"{p}/tombstones")
    again = IvfIndex.load(spark, p)
    assert again.index_df.count() == n - 5
    assert not (
        {r["id"] for r in again.index_df.select("id").collect()} & gone_ids
    )


def test_ivf_compact_emptied_cell_no_resurrection(spark, emb, tmp_path):
    """Round-6 (ADVICE): tombstoning EVERY row of a cell then compacting
    must not resurrect them — dynamic partition overwrite skips cells
    absent from the kept frame, so compact must delete those partition
    directories explicitly before dropping the sidecar."""
    from radient_spark.ann import IvfIndex, _local_parquet_exists

    idx = IvfIndex.build(emb, n_cells=8, seed=42)
    p = str(tmp_path / "ivf_empty_cell")
    idx.save(p)
    # pick one whole cell and tombstone all of its rows
    cell = idx.index_df.select("cell_id").first()["cell_id"]
    gone = idx.index_df.filter(F.col("cell_id") == cell).select("id")
    gone_ids = {r["id"] for r in gone.collect()}
    assert gone_ids  # non-empty cell
    n = emb.count()
    idx.tombstone_save(gone, p)
    IvfIndex.compact(spark, p)
    assert not _local_parquet_exists(f"{p}/tombstones")
    again = IvfIndex.load(spark, p)
    assert again.index_df.count() == n - len(gone_ids)
    live = {r["id"] for r in again.index_df.select("id").collect()}
    assert not (live & gone_ids)


def test_lp_build_kernel_splits(spark):
    """metric='lp' with p=1 must produce a valid unit split direction
    and differ from the euclidean kernel on heavy-tailed data."""
    from radient_spark.ann import _two_means_hyperplane

    rng = np.random.RandomState(5)
    X = rng.standard_cauchy((200, 16))  # heavy tails: p=1 vs p=2 differ
    w_l1 = _two_means_hyperplane(X, seed=1, metric="lp", p=1.0)
    w_l2 = _two_means_hyperplane(X, seed=1, metric="euclidean")
    for w in (w_l1, w_l2):
        assert abs(np.linalg.norm(w) - 1.0) < 1e-9
    assert not np.allclose(w_l1, w_l2)


def test_ivf_recall_curve_monotone(spark, emb):
    """Recall@10 must be non-decreasing in n_probes and reach 1.0 at
    full probing — the recall/latency trade the IVF index sells."""
    from radient_spark.ann import IvfIndex

    idx = IvfIndex.build(emb, n_cells=16, seed=42)
    rows = emb.collect()
    rng = np.random.RandomState(2)
    qidx = rng.choice(len(rows), 10, replace=False)
    queries = [(int(i), list(rows[i]["vector"])) for i in qidx]
    exact = _exact_topk(rows, queries, k=10)
    recalls = []
    for probes in (1, 4, 16):
        ann = {}
        for r in idx.search(queries, k=10, n_probes=probes).collect():
            ann.setdefault(r["qid"], set()).add(r["id"])
        recalls.append(
            float(
                np.mean(
                    [len(ann.get(q, set()) & exact[q]) / 10 for q, _ in queries]
                )
            )
        )
    assert recalls == sorted(recalls), recalls
    assert recalls[-1] == 1.0


def test_metric_defaults_aligned_and_mismatch_warns(spark, emb):
    """Round-6: build defaults to the search default's geometry (cosine),
    metric=None resolves from build_metric, and an explicit
    cross-geometry metric warns instead of silently degrading recall."""
    import warnings

    idx = AnnIndex.build(emb, n_trees=1, max_leaf_size=200, seed=7)
    assert idx.build_metric == "cosine"
    assert idx._resolve_metric(None) == "cosine"

    eidx = AnnIndex.build(
        emb, n_trees=1, max_leaf_size=200, seed=7, metric="euclidean"
    )
    assert eidx._resolve_metric(None) == "l2"

    qrow = emb.orderBy("id").first()
    q = [(0, list(qrow["vector"]))]
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        eidx.search(q, k=3, metric="cosine").collect()
    assert any("geometry" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        idx.search(q, k=3).collect()  # aligned default: no warning
    assert not [x for x in w if "geometry" in str(x.message)]


def test_lattice_build_deterministic_across_partitionings(spark, emb):
    """Round-10: build_lattice (the SQL-replayable kernel behind
    q_ann_search's value oracle) must be bit-identical under any input
    partitioning — every decision is integer arithmetic with pinned tie
    orders, so there is nothing for shuffle order to perturb."""
    a = AnnIndex.build_lattice(emb, n_trees=2, levels=2, seed=42)
    b = AnnIndex.build_lattice(
        emb.repartition(13), n_trees=2, levels=2, seed=42
    )
    assert all(x.nodes == y.nodes for x, y in zip(a.trees, b.trees))
    rows = emb.orderBy("id").limit(5).collect()
    qs = [(int(r["id"]), list(r["vector"])) for r in rows]
    ra = sorted(map(tuple, a.search(qs, k=5, metric="cosine").collect()))
    rb = sorted(map(tuple, b.search(qs, k=5, metric="cosine").collect()))
    assert ra == rb


def test_lattice_search_is_pruned_and_recalls(spark, emb):
    """The lattice forest must genuinely prune (each query touches one
    leaf per tree, not the corpus) while spill keeps recall@10 usable;
    self-queries must always find themselves (they sit in their own
    leaf by construction)."""
    index = AnnIndex.build_lattice(
        emb, n_trees=2, levels=2, spill_pm=100, seed=42
    )
    rows = emb.collect()
    n = len(rows)
    qs = [(int(r["id"]), list(r["vector"])) for r in rows[:20]]
    res = index.search(qs, k=10, metric="cosine").collect()
    by_q: dict = {}
    for r in res:
        by_q.setdefault(r["qid"], set()).add(r["id"])
    # self-hit: the query vector is in the corpus
    assert all(qid in ids for qid, ids in by_q.items())
    exact = _exact_topk(rows, qs, 10)
    hit = sum(len(by_q[q] & exact[q]) for q, _ in qs)
    recall = hit / (10 * len(qs))
    assert recall >= 0.5, recall
    # pruned: candidate rows per (query, tree) bounded by the largest
    # leaf, far below the corpus
    sizes = [
        r["cnt"]
        for r in index.index_df.groupBy("tree_id", "leaf_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    ]
    assert len(sizes) == 8  # 2 trees x 4 leaves at 2 levels
    assert max(sizes) < n, (max(sizes), n)


def test_lattice_save_load_roundtrip(spark, emb, tmp_path):
    """build_metric='lattice' must survive save/load: descent after load
    quantizes queries exactly like the in-memory index."""
    index = AnnIndex.build_lattice(emb, n_trees=2, levels=2, seed=42)
    path = str(tmp_path / "lattice_idx")
    index.save(path)
    loaded = AnnIndex.load(spark, path)
    assert loaded.build_metric == "lattice"
    rows = emb.orderBy("id").limit(5).collect()
    qs = [(int(r["id"]), list(r["vector"])) for r in rows]
    ra = sorted(map(tuple, index.search(qs, k=5, metric="cosine").collect()))
    rb = sorted(map(tuple, loaded.search(qs, k=5, metric="cosine").collect()))
    assert ra == rb


def test_lattice_rejects_underfilled_nodes(spark):
    """A node with < 2 rows cannot seed a 2-means split (and the SQL
    replay would silently drop its rows) — the build must refuse.
    Note the spill rule keeps every CHILD at >= 2 rows whenever its
    parent has >= 2 (left >= hi_rank >= ceil(n/2) >= 1 and right >=
    n - lo_rank + 1 >= 2 for n = 2 at spill_pm=100), so the guard can
    only fire on a 1-row input — which is exactly what it must catch."""
    import pytest as _pytest

    one = spark.createDataFrame(
        [(1, [1.0, -1.0])], "id long, vector array<float>"
    )
    with _pytest.raises(ValueError, match="2 rows"):
        AnnIndex.build_lattice(one, n_trees=1, levels=1, seed=1)
    # and a 3-row input SURVIVES deep levels: spill floors nodes at 2
    tiny = spark.createDataFrame(
        [(i, [float(i), float(-i)]) for i in range(3)],
        "id long, vector array<float>",
    )
    idx = AnnIndex.build_lattice(tiny, n_trees=1, levels=4, seed=1)
    assert len(idx.trees[0].nodes) == 1 + 2 + 4 + 8


def test_lattice_search_df_matches_list_search(spark, emb):
    """search_df descends with the same micro quantization as search()."""
    index = AnnIndex.build_lattice(emb, n_trees=2, levels=2, seed=42)
    rows = emb.orderBy("id").limit(5).collect()
    qs = [(int(r["id"]), list(r["vector"])) for r in rows]
    qdf = spark.createDataFrame(
        [(q, v) for q, v in qs], "qid long, qvec array<float>"
    )
    ra = sorted(map(tuple, index.search(qs, k=5, metric="cosine").collect()))
    rb = sorted(
        map(tuple, index.search_df(qdf, k=5, metric="cosine").collect())
    )
    assert ra == rb


def test_ivf_search_df_probe_vec_split(spark, emb):
    """probe_vec routes cell selection through a different column than
    scoring: probing with the micro-lattice query (shifted L2 space)
    must yield the same cells as probing with micro values passed as the
    main query vector, while scores come from the original floats."""
    import numpy as np

    from radient_spark.ann import IvfIndex
    from radient_spark.operators.cluster import (
        assign_clusters,
        kmeans_fit,
        micro_vec,
    )

    cents = kmeans_fit(emb, "vector", "id", k=8, iters=1, seed=42)
    index = IvfIndex(
        assign_clusters(emb, "vector", cents, out_col="cell_id").select(
            "id", "vector", "cell_id"
        ),
        np.asarray(cents, dtype=np.float64),
    )
    qdf = (
        emb.orderBy("id")
        .limit(5)
        .select(
            F.col("id").alias("qid"),
            F.col("vector").alias("qvec"),
            micro_vec(F.col("vector")).cast("array<float>").alias("pvec"),
        )
    )
    out = index.search_df(qdf, k=5, n_probes=2, probe_vec="pvec").collect()
    assert len(out) == 25
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append(r)
    for qid, rs in by_q.items():
        # scores are cosine of ORIGINAL vectors: self-hit scores 1.0
        assert any(r["id"] == qid and r["score"] == 1.0 for r in rs)


def test_ivf_build_lattice_roundtrip_and_incremental(spark, emb, tmp_path):
    """IvfIndex.build_lattice: the lattice flag survives save/load,
    probes auto-quantize, and incremental `add` assigns new rows with
    the SAME integer argmin as the build (so the combined index equals
    a from-scratch build over the union)."""
    from radient_spark.ann import IvfIndex

    old = emb.filter(F.col("id") % 5 != 0)
    new = emb.filter(F.col("id") % 5 == 0)
    idx = IvfIndex.build_lattice(old, n_cells=8, iters=1, seed=7)
    assert idx.lattice
    combined = idx.add(new)
    # frozen-quantizer contract: every row of the union is present and
    # new rows landed in cells chosen by the same lattice argmin
    from radient_spark.operators.cluster import assign_clusters

    cents = [[int(x) for x in c] for c in idx.centroids.tolist()]
    expected = assign_clusters(new, "vector", cents, out_col="cell_id")
    got = combined.index_df.join(
        new.select("id"), "id", "left_semi"
    ).select("id", "cell_id")
    mism = (
        got.join(
            expected.select("id", F.col("cell_id").alias("exp")), "id"
        )
        .filter(F.col("cell_id") != F.col("exp"))
        .count()
    )
    assert mism == 0
    path = str(tmp_path / "ivf_lat")
    idx.save(path)
    loaded = IvfIndex.load(spark, path)
    assert loaded.lattice
    rows = emb.orderBy("id").limit(3).collect()
    qs = [(int(r["id"]), list(r["vector"])) for r in rows]
    a = sorted(map(tuple, idx.search(qs, k=3, n_probes=2).collect()))
    b = sorted(map(tuple, loaded.search(qs, k=3, n_probes=2).collect()))
    assert a == b


def test_build_partition_width_bounded(spark, emb):
    """Round-12: the per-level reassignment union must NOT double the
    partition count each level — a depth-D build would otherwise run
    P0 * 2^D tasks in its last GEMM stage (the forest-bytes probe hit
    102,400 two-row tasks at 200k rows before the coalesce fix). The
    index_df is the loop's final `cur`, so its partition count pins the
    last level's stage width: bounded by the coalesce target, never
    input_parts * 2^depth."""
    wide = emb.repartition(8)
    # depth = ceil(log2(n / leaf)) >= 4 at sf0.001+ (n >= 600, leaf 32)
    idx = AnnIndex.build(wide, n_trees=2, max_leaf_size=32, seed=7)
    target = max(
        2 * spark.sparkContext.defaultParallelism,
        wide.rdd.getNumPartitions(),
    )
    got = idx.index_df.rdd.getNumPartitions()
    assert got <= target, (got, target)

    lat = AnnIndex.build_lattice(emb.repartition(8), n_trees=2, levels=2, seed=42)
    got_lat = lat.index_df.rdd.getNumPartitions()
    assert got_lat <= target, (got_lat, target)
