"""Forest-metadata scale ceiling (VERDICT r10 watch item #4 / r11 task 3).

The ANN forest's driver/broadcast state grows with leaf count (~n/leaf
nodes per tree), unlike IVF whose broadcast is ~sqrt(n) centroids. These
tests pin (a) the measured per-node byte cost that the
`forest_crossover_rows` estimator assumes, against a real built index,
and (b) the estimator's shape, so SCALING.md's crossover table cannot
silently drift from the code.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from radient_spark.ann import AnnIndex, forest_crossover_rows


def test_forest_nbytes_matches_estimator_assumption(spark, sf_dir):
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))
    )
    dim = len(emb.select("vector").first()[0])
    index = AnnIndex.build(
        emb, n_trees=2, max_leaf_size=50, spill=0.1, seed=42
    )
    nodes = index.n_nodes()
    assert nodes > 10  # deep enough for the per-node cost to dominate
    per_node = index.forest_nbytes() / nodes
    # estimator assumes dim*8 weight floats + ~120 B structure per node;
    # allow generous slack, but fail if pickle cost drifts past the
    # assumption (which would push the real crossover BELOW the
    # documented one — the dangerous direction)
    assumed = dim * 8 + 120
    assert per_node <= assumed * 1.25, (
        f"measured {per_node:.0f} B/node exceeds the estimator's "
        f"{assumed} B/node: regenerate SCALING.md's crossover table"
    )


def test_crossover_shape():
    # more dims -> heavier nodes -> lower crossover
    assert forest_crossover_rows(768) < forest_crossover_rows(128)
    assert forest_crossover_rows(128) < forest_crossover_rows(64)
    # bigger leaves -> fewer nodes per row -> higher crossover
    assert forest_crossover_rows(128, max_leaf_size=400) > forest_crossover_rows(
        128, max_leaf_size=200
    )
    # the documented regime: for realistic embedding dims the forest
    # outgrows a 512 MB broadcast budget somewhere in 10^6.9 - 10^8 rows
    # — far below the 10^9+ corpus SCALING.md targets, hence the pinned
    # recommendation to switch to IVF / lattice-IVF above the crossover
    assert 5_000_000 < forest_crossover_rows(768) < 100_000_000
    assert forest_crossover_rows(64) < 1_000_000_000


def test_build_warns_and_auto_routes_over_budget(spark, sf_dir):
    """VERDICT r11 #3: the crossover measurement is wired into the API.
    With a synthetically tiny broadcast budget, a plain build() WARNS
    (forest would outgrow the budget) and build(auto=True) routes to
    IvfIndex — same search contract, O(sqrt(n)*dim) broadcast state."""
    import warnings

    from radient_spark.ann import IvfIndex

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))
    )
    tiny = 1024  # bytes: any real forest exceeds this

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        index = AnnIndex.build(
            emb, n_trees=2, max_leaf_size=50,
            broadcast_budget_bytes=tiny,
        )
    assert isinstance(index, AnnIndex)  # no silent rerouting
    assert any("crossover" in str(x.message) for x in w), [
        str(x.message) for x in w
    ]

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        routed = AnnIndex.build(
            emb, auto=True, broadcast_budget_bytes=tiny,
        )
    assert isinstance(routed, IvfIndex)
    assert any("auto-routing" in str(x.message) for x in w)
    # the routed index searches: top-1 of a corpus vector is itself
    first = emb.first()
    qdf = spark.createDataFrame(
        [(int(first["id"]), list(first["vector"]))],
        "qid long, qvec array<float>",
    )
    got = routed.search_df(qdf, k=1, n_probes=routed.centroids.shape[0])
    row = got.collect()[0]
    assert row["id"] == first["id"]

    # under budget: no warning, normal forest
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ok = AnnIndex.build(emb, n_trees=2, max_leaf_size=50)
    assert isinstance(ok, AnnIndex)
    assert not any("crossover" in str(x.message) for x in w)
