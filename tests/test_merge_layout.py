"""Merge/upsert (operators/merge.py) and Z-order layout
(operators/layout.py) unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from radient_spark.operators.layout import (
    scale_to_bits,
    z_value,
    zorder_repartition,
)
from radient_spark.operators.merge import merge_report, merge_summary, merge_upsert


# ---------------------------------------------------------------- merge


def _corpus(spark):
    return spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three"), (4, None)],
        "doc_id long, text string",
    )


def _delta(spark):
    return spark.createDataFrame(
        [(2, "two v2"), (3, "three"), (4, "four"), (9, "nine")],
        "doc_id long, text string",
    )


def test_merge_upsert_source_wins(spark):
    merged = merge_upsert(_corpus(spark), _delta(spark), ["doc_id"])
    got = {r["doc_id"]: r["text"] for r in merged.collect()}
    assert got == {1: "one", 2: "two v2", 3: "three", 4: "four", 9: "nine"}


def test_merge_report_actions_null_safe(spark):
    rep = merge_report(_corpus(spark), _delta(spark), ["doc_id"], ["text"])
    got = {r["doc_id"]: r["action"] for r in rep.collect()}
    # doc 4: NULL -> 'four' must read as update, not unchanged
    assert got == {1: "keep", 2: "update", 3: "unchanged", 4: "update", 9: "insert"}


def test_merge_summary_counts(spark):
    s = merge_summary(_corpus(spark), _delta(spark), ["doc_id"], ["text"])
    got = {r["action"]: r["n_rows"] for r in s.collect()}
    assert got == {"keep": 1, "update": 2, "unchanged": 1, "insert": 1}


def test_merge_schema_mismatch_rejected(spark):
    bad = spark.createDataFrame([(1, "x", 0)], "doc_id long, text string, extra int")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(_corpus(spark), bad, ["doc_id"])


# ---------------------------------------------------------------- layout


def _py_morton(vals: list[int], bits: int) -> int:
    z = 0
    m = len(vals)
    for j, v in enumerate(vals):
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * m + j)
    return z


def test_z_value_matches_python_interleave(spark):
    rows = [(3, 5), (0, 0), (1023, 1023), (7, 1000), (512, 1)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = df.select(
        "x", "y", z_value([F.col("x"), F.col("y")], bits=10).alias("z")
    ).collect()
    for r in out:
        assert r["z"] == _py_morton([r["x"], r["y"]], 10)


def test_z_value_guards(spark):
    with pytest.raises(ValueError, match="at least one"):
        z_value([], bits=8)
    with pytest.raises(ValueError, match="signed-long"):
        z_value([F.col("a"), F.col("b")], bits=32)


def test_scale_to_bits_clamps(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (50.0,), (100.0,), (200.0,)], "v double")
    out = [
        r["s"]
        for r in df.select(
            scale_to_bits(F.col("v"), 0.0, 100.0, bits=8).alias("s")
        ).collect()
    ]
    assert out == [0, 0, 128, 255, 255]  # round(50/100*255)=128 (127.5 → half-up)


def test_zorder_repartition_bounds_both_spans(spark):
    # A 64x64 grid: after Z-clustering into 16 range partitions, each
    # partition's span in BOTH dimensions must be far below the global
    # span (the un-clustered baseline: any row-id split has span ~63 in
    # at least one dimension for most partitions).
    pts = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(pts, "x long, y long").repartition(8)
    parts = (
        zorder_repartition(df, ["x", "y"], bits=6, n_partitions=16)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert sum(p["n"] for p in parts) == 64 * 64
    weighted_sx = sum(p["sx"] * p["n"] for p in parts) / (64 * 64)
    weighted_sy = sum(p["sy"] * p["n"] for p in parts) / (64 * 64)
    # Z-curve guarantee: a contiguous 1/16 slice of a 12-bit Morton
    # space touches a bounded sub-grid; both spans stay well under the
    # global 63 (a single-column sort would leave the other span at 63).
    assert weighted_sx < 32
    assert weighted_sy < 32


def test_zorder_keep_zcol_is_sorted_within_partitions(spark):
    df = spark.createDataFrame([(i % 17, (i * 7) % 13) for i in range(200)], "x long, y long")
    out = zorder_repartition(df, ["x", "y"], bits=5, n_partitions=4, keep_zcol=True)

    def check(it):
        import pandas as pd  # noqa: F401

        for pdf in it:
            zs = pdf["__z"].tolist()
            assert zs == sorted(zs)
            yield pdf[["x"]]

    out.mapInPandas(check, "x long").count()


def test_scd2_history_collapses_runs_and_chains_windows(spark):
    """A A B A per key -> 3 versions; valid_to chains to the next
    valid_from; only the last version is current."""
    from radient_spark.operators.merge import scd2_history

    rows = [
        (1, "A", 10, 100),
        (1, "A", 20, 101),
        (1, "B", 30, 102),
        (1, "A", 40, 103),
        (2, "X", 15, 200),
    ]
    df = spark.createDataFrame(rows, ["k", "attr", "ts", "seq"])
    out = {
        (r.k, r.version): r
        for r in scd2_history(df, "k", "attr", "ts", "seq").collect()
    }
    assert len(out) == 4
    v1, v2, v3 = out[(1, 1)], out[(1, 2)], out[(1, 3)]
    assert (v1.attr, v1.valid_from, v1.valid_to, v1.n_rows) == ("A", 10, 30, 2)
    assert (v2.attr, v2.valid_from, v2.valid_to) == ("B", 30, 40)
    assert (v3.attr, v3.valid_to, bool(v3.is_current)) == ("A", None, True)
    assert not v1.is_current and not v2.is_current
    assert bool(out[(2, 1)].is_current)


def test_scd2_history_null_attr_versions(spark):
    """NULL attribute observations are versions of their own (null-safe
    change detection): A, NULL, A must produce three versions, and a
    NULL re-observation must not fork (round-4 ADVICE)."""
    from radient_spark.operators.merge import scd2_history

    rows = [
        (1, "A", 10, 1),
        (1, None, 20, 2),
        (1, None, 30, 3),
        (1, "A", 40, 4),
        (2, None, 10, 1),
        (2, None, 20, 2),
    ]
    df = spark.createDataFrame(rows, "k long, attr string, ts long, seq long")
    got = sorted(
        (r["k"], r["version"], r["attr"], r["n_rows"], r["is_current"])
        for r in scd2_history(df, "k", "attr", "ts", "seq").collect()
    )
    assert got == [
        (1, 1, "A", 1, False),
        (1, 2, None, 2, False),
        (1, 3, "A", 1, True),
        (2, 1, None, 2, True),
    ]


def test_scd2_merge_equals_full_recompute(spark):
    """Incremental merge ≡ scd2_history(all), including a key that only
    appears in the new batch, a key untouched by it, and a same-attr
    continuation that must extend (not fork) the last version."""
    from radient_spark.operators.merge import scd2_history, scd2_merge

    old = [
        (1, "A", 10, 1), (1, "B", 20, 2),        # touched key
        (2, "X", 10, 1), (2, "X", 30, 2),        # untouched key
    ]
    new = [
        (1, "B", 40, 3),                          # continuation: no fork
        (1, "C", 50, 4),                          # change: new version
        (3, "Z", 5, 1),                           # brand-new key
    ]
    schema = "k long, attr string, ts long, seq long"
    old_df = spark.createDataFrame(old, schema)
    new_df = spark.createDataFrame(new, schema)
    hist = scd2_history(old_df, "k", "attr", "ts", "seq")
    merged = scd2_merge(hist, new_df, "k", "attr", "ts", "seq")
    full = scd2_history(
        old_df.unionByName(new_df), "k", "attr", "ts", "seq"
    )
    key = lambda r: (r["k"], r["version"])  # noqa: E731
    got = sorted((tuple(r) for r in merged.collect()), key=lambda t: t[:2])
    want = sorted((tuple(r) for r in full.collect()), key=lambda t: t[:2])
    assert got == want


def test_golden_record_strategies(spark):
    from radient_spark.operators.merge import golden_record

    rows = [
        (1, 10, 1, "new", 5, "b"),
        (1, 20, 2, "newest", 9, "a"),
        (1, 5, 3, "old", 7, "a"),
        (2, 1, 1, "only", 3, "c"),
    ]
    df = spark.createDataFrame(
        rows, "c long, ts long, seq long, status string, price long, pri string"
    )
    got = {
        r["c"]: r
        for r in golden_record(
            df,
            "c",
            {"status": "most_recent", "price": "max", "pri": "mode"},
            "ts",
            "seq",
        ).collect()
    }
    assert got[1]["status"] == "newest"
    assert got[1]["price"] == 9
    assert got[1]["pri"] == "a"  # 2 x 'a' beats 1 x 'b'
    assert got[2]["status"] == "only" and got[2]["pri"] == "c"


def test_join_view_delta_identity(spark):
    """old view ∪ join_view_delta == full recompute, including rows
    produced by delta×delta (a key present only in both deltas)."""
    from radient_spark.operators.merge import join_view_delta

    base_a = spark.createDataFrame([(1, "a1"), (2, "a2")], "k long, a string")
    delta_a = spark.createDataFrame([(3, "a3")], "k long, a string")
    base_b = spark.createDataFrame([(1, "b1"), (3, "b3x")], "k long, b string")
    delta_b = spark.createDataFrame(
        [(2, "b2"), (3, "b3y")], "k long, b string"
    )
    old = base_a.join(base_b, ["k"])
    got = sorted(
        tuple(r)
        for r in old.unionByName(
            join_view_delta(base_a, delta_a, base_b, delta_b, ["k"])
        ).collect()
    )
    full = sorted(
        tuple(r)
        for r in base_a.unionByName(delta_a)
        .join(base_b.unionByName(delta_b), ["k"])
        .collect()
    )
    assert got == full


def test_scd2_merge_randomized_equals_recompute(spark):
    """Randomized in-order batches (per-key split points chosen at
    random, NULL attrs included) — incremental merge must equal the
    full recompute for every seed."""
    import random

    from radient_spark.operators.merge import scd2_history, scd2_merge

    schema = "k long, attr string, ts long, seq long"
    for seed in (3, 11, 29):
        rng = random.Random(seed)
        old_rows, new_rows = [], []
        for k in range(12):
            n = rng.randrange(1, 9)
            obs = [
                (k, rng.choice(["A", "B", "C", None]), 10 * (t + 1), t + 1)
                for t in range(n)
            ]
            cut = rng.randrange(0, n + 1)  # in-order split per key
            old_rows += obs[:cut]
            new_rows += obs[cut:]
        old_df = spark.createDataFrame(old_rows or [(99, "X", 1, 1)], schema)
        new_df = spark.createDataFrame(new_rows or [(98, "Y", 1, 1)], schema)
        hist = scd2_history(old_df, "k", "attr", "ts", "seq")
        merged = scd2_merge(hist, new_df, "k", "attr", "ts", "seq")
        full = scd2_history(
            old_df.unionByName(new_df), "k", "attr", "ts", "seq"
        )
        skey = lambda t: tuple(  # noqa: E731 - None-safe tuple sort
            (v is None, v) for v in t
        )
        got = sorted((tuple(r) for r in merged.collect()), key=skey)
        want = sorted((tuple(r) for r in full.collect()), key=skey)
        assert got == want, f"seed {seed}"
