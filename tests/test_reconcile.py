"""Table fingerprints (operators/reconcile.py): order insensitivity,
single-row sensitivity, NULL canonicalization, and the Spark<->DuckDB
agreement that makes it a cross-system check (the registry oracle
exercises the same at table scale)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from radient_spark.operators.reconcile import fingerprint_sql, table_fingerprint


def _fp(df, cols):
    return table_fingerprint(df, cols).collect()[0]


def test_fingerprint_is_order_insensitive(spark):
    rows = [(i, f"name-{i}") for i in range(50)]
    a = spark.createDataFrame(rows, "id long, name string")
    b = spark.createDataFrame(list(reversed(rows)), "id long, name string").repartition(7)
    cols = [F.col("id"), F.col("name")]
    assert _fp(a, cols) == _fp(b, cols)


def test_fingerprint_detects_single_row_change(spark):
    rows = [(i, f"name-{i}") for i in range(50)]
    mutated = rows[:25] + [(25, "name-25x")] + rows[26:]
    a = spark.createDataFrame(rows, "id long, name string")
    b = spark.createDataFrame(mutated, "id long, name string")
    cols = [F.col("id"), F.col("name")]
    fa, fb = _fp(a, cols), _fp(b, cols)
    assert fa["n_rows"] == fb["n_rows"] and fa["checksum"] != fb["checksum"]


def test_fingerprint_null_does_not_collide_with_empty(spark):
    a = spark.createDataFrame([("x", None)], "k string, v string")
    b = spark.createDataFrame([("x", "")], "k string, v string")
    cols = [F.col("k"), F.col("v")]
    assert _fp(a, cols)["checksum"] != _fp(b, cols)["checksum"]


def test_fingerprint_empty_table_is_zero(spark):
    a = spark.createDataFrame([], "k string, v string")
    fp = _fp(a, [F.col("k"), F.col("v")])
    assert fp["n_rows"] == 0 and fp["checksum"] == 0


def test_fingerprint_matches_duckdb_on_mixed_types(spark):
    rows = [(i, f"s{i}" if i % 3 else None) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, s string")
    got = _fp(df, [F.col("id"), F.col("s")])
    con = duckdb.connect()
    con.sql("CREATE TABLE t (id BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    exp = con.sql(fingerprint_sql("t", ["id", "s"])).fetchall()[0]
    con.close()
    assert (got["n_rows"], got["checksum"]) == exp


def test_snapshot_diff_statuses(spark):
    from radient_spark.operators.reconcile import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "CHANGED"), (4, "d")], "k long, v string"
    )
    got = {
        r["k"]: r["status"]
        for r in snapshot_diff(old, new, ["k"], [F.col("v")]).collect()
    }
    assert got == {1: "removed", 3: "changed", 4: "added"}


def test_sequence_gaps_crosses_bucket_boundaries(spark):
    from radient_spark.operators.reconcile import sequence_gaps

    # bucket_width=4: keys 1..3 | gap of 6 spanning buckets | 10,11 |
    # huge gap spanning several EMPTY buckets | 30
    keys = [1, 2, 3, 10, 11, 30]
    df = spark.createDataFrame([(k,) for k in keys], "id long")
    got = {
        (r["gap_len"], r["n_gaps"])
        for r in sequence_gaps(df, "id", bucket_width=4).collect()
    }
    assert got == {(6, 1), (18, 1)}


def test_sequence_gaps_matches_naive_on_random_keys(spark):
    import random

    from radient_spark.operators.reconcile import sequence_gaps

    rng = random.Random(3)
    keys = sorted(rng.sample(range(0, 3000), 400))
    df = spark.createDataFrame([(k,) for k in keys], "id long")
    got = {(r["gap_len"], r["n_gaps"])
           for r in sequence_gaps(df, "id", bucket_width=64).collect()}
    from collections import Counter
    gaps = Counter(b - a - 1 for a, b in zip(keys, keys[1:]) if b > a + 1)
    assert got == set(gaps.items())


def test_sequence_gaps_recursive_boundaries_multi_level(spark):
    """Round-6: with a tiny bucket_width the recursion runs 3+ levels
    (keys -> buckets -> superbuckets); the gap histogram must still be
    exact, including gaps spanning MANY empty buckets."""
    from radient_spark.operators.reconcile import sequence_gaps

    # keys with gaps of len 1, 5, and 1000 (the last spans ~250 empty
    # width-4 buckets and several empty superbuckets)
    ks = [0, 1, 3, 4, 10, 11, 12, 1013, 1014]
    df = spark.createDataFrame([(k,) for k in ks], "id long")
    got = {
        r["gap_len"]: r["n_gaps"]
        for r in sequence_gaps(df, "id", bucket_width=4).collect()
    }
    srt = sorted(ks)
    want = {}
    for a, b in zip(srt, srt[1:]):
        g = b - a - 1
        if g > 0:
            want[g] = want.get(g, 0) + 1
    assert got == want, (got, want)

    # empty input
    assert sequence_gaps(
        spark.createDataFrame([], "id long"), "id"
    ).count() == 0
