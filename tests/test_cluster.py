"""Integer-lattice k-means + SemDeDup (operators/cluster.py).

Correctness beyond the DuckDB oracle (tests/test_oracle.py covers the
registry queries): recovery on separated data, the empty-cluster rule,
plan shape (assignment must be shuffle-free), and the SemDeDup
subset-of-exact-pairs containment.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from radient_spark import plans
from radient_spark.catalog import load_tables
from radient_spark.operators.cluster import (
    MICRO,
    MICRO_SHIFT,
    assign_clusters,
    kmeans_fit,
    micro_vec,
    semdedup_pairs,
)
from radient_spark.operators.topk import similarity_self_join


def _toy(spark):
    # two tight blobs far apart in 3-d
    rows = [
        (1, [0.00, 0.01, 0.00]),
        (2, [0.01, 0.00, 0.01]),
        (3, [0.00, 0.00, 0.02]),
        (4, [0.90, 0.91, 0.90]),
        (5, [0.91, 0.90, 0.89]),
        (6, [0.92, 0.92, 0.91]),
    ]
    return spark.createDataFrame(rows, "id long, v array<float>")


def test_micro_vec_quantization(spark):
    df = spark.createDataFrame([([0.5, -0.5, 0.0],)], "v array<float>")
    [row] = df.select(micro_vec(F.col("v")).alias("m")).collect()
    assert row["m"] == [
        MICRO_SHIFT + MICRO // 2,
        MICRO_SHIFT - MICRO // 2,
        MICRO_SHIFT,
    ]


def test_kmeans_recovers_separated_blobs(spark):
    df = _toy(spark)
    cents = kmeans_fit(df, "v", "id", k=2, iters=2, seed=7)
    out = assign_clusters(df, "v", cents).select("id", "cluster_id").collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["id"])
    assert sorted(map(sorted, by_cluster.values())) == [[1, 2, 3], [4, 5, 6]]


def test_kmeans_deterministic_across_runs(spark):
    df = _toy(spark)
    a = kmeans_fit(df, "v", "id", k=2, iters=2, seed=7)
    b = kmeans_fit(df, "v", "id", k=2, iters=2, seed=7)
    assert a == b


def test_empty_cluster_keeps_previous_centroid(spark):
    # all points identical -> every point lands on cluster 0 (tie breaks
    # low), the other centroid is never updated and must survive intact
    df = spark.createDataFrame(
        [(i, [0.5, 0.5]) for i in range(1, 5)], "id long, v array<float>"
    )
    cents = kmeans_fit(df, "v", "id", k=2, iters=2, seed=7)
    assert len(cents) == 2
    expect = [MICRO_SHIFT + MICRO // 2] * 2
    assert cents[0] == expect and cents[1] == expect


def test_assignment_is_shuffle_free(spark, sf_dir):
    emb = load_tables(spark, sf_dir)["embeddings"]
    cents = kmeans_fit(emb, "embedding", "vec_id", k=4, iters=1)
    df = assign_clusters(emb, "embedding", cents).select(
        "vec_id", "cluster_id"
    )
    assert plans.shuffle_count(df) == 0, plans.formatted_plan(df)


def test_semdedup_pairs_subset_of_exact(spark, sf_dir):
    emb = load_tables(spark, sf_dir)["embeddings"]
    cents = kmeans_fit(emb, "embedding", "vec_id", k=8, iters=1)
    sem = {
        (r["id_a"], r["id_b"], r["score"])
        for r in semdedup_pairs(
            emb, "embedding", "vec_id", cents, threshold=0.4
        ).collect()
    }
    exact = {
        (r["id_a"], r["id_b"], r["score"])
        for r in similarity_self_join(
            emb, vec_col="embedding", id_col="vec_id", threshold=0.4,
            metric="cosine",
        ).collect()
    }
    assert sem <= exact
    # same-cluster exact pairs must all be found (no false negatives
    # beyond the cross-cluster trade)
    assigned = {
        r["vec_id"]: r["cluster_id"]
        for r in assign_clusters(emb, "embedding", cents)
        .select("vec_id", "cluster_id")
        .collect()
    }
    cocluster = {
        (a, b, s) for a, b, s in exact if assigned[a] == assigned[b]
    }
    assert sem == cocluster


def test_kmeans_rejects_too_few_rows(spark):
    df = spark.createDataFrame([(1, [0.1, 0.2])], "id long, v array<float>")
    try:
        kmeans_fit(df, "v", "id", k=3, iters=1)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_cluster_balanced_sample_caps_and_keeps_rare(spark):
    from pyspark.sql import functions as F2
    from radient_spark.operators.cluster import (
        cluster_balanced_sample,
        kmeans_fit,
    )

    # two well-separated modes: a dominant one (50 rows) and a rare one (3)
    rows = [(i, [10.0, 10.0]) for i in range(50)] + [
        (100 + i, [-10.0, -10.0]) for i in range(3)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F2.col("embedding").cast("array<float>")
    )
    cents = kmeans_fit(df, "embedding", "vec_id", k=2, iters=2, seed=42)
    kept = cluster_balanced_sample(
        df, "embedding", "vec_id", cents, cap=10
    ).collect()
    by_cluster: dict[int, int] = {}
    for r in kept:
        by_cluster[r["cluster_id"]] = by_cluster.get(r["cluster_id"], 0) + 1
    counts = sorted(by_cluster.values())
    # dominant mode capped at 10, rare mode survives whole
    assert counts == [3, 10]


def test_embedding_gram_matches_numpy(spark, sf_dir):
    """The Arrow-GEMM Gram partials must sum to the exact numpy Gram of
    the micro-quantized matrix, regardless of partitioning."""
    import numpy as np

    from radient_spark.catalog import load_tables
    from radient_spark.operators.cluster import embedding_gram

    emb = load_tables(spark, sf_dir)["embeddings"].limit(500).repartition(7)
    got = {
        (r["dim_i"], r["dim_j"]): (r["n"], int(r["sxy"]))
        for r in embedding_gram(emb, "embedding").collect()
    }
    M = np.round(
        np.array(
            [r["embedding"] for r in emb.select("embedding").collect()],
            dtype=np.float64,
        )
        * 1e6
    ).astype(np.int64)
    G = M.T @ M
    iu = np.triu_indices(M.shape[1])
    for i, j in zip(*iu):
        n, sxy = got[(int(i), int(j))]
        assert n == len(M)
        assert sxy == int(G[i, j]), (i, j)
