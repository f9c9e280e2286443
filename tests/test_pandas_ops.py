"""applyInPandas UDAF + Python UDTF surfaces."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from radient_spark.catalog import load_tables
from radient_spark.operators import pandas_ops


def test_grouped_quantiles_match_numpy(spark, sf_dir):
    orders = load_tables(spark, sf_dir)["orders"]
    got = {
        r["o_orderstatus"]: (r["q25"], r["q50"], r["q75"], r["n"])
        for r in pandas_ops.grouped_exact_quantiles(
            orders, ["o_orderstatus"], "o_totalprice"
        ).collect()
    }
    rows = orders.select("o_orderstatus", "o_totalprice").collect()
    by_status: dict = {}
    for r in rows:
        by_status.setdefault(r["o_orderstatus"], []).append(r["o_totalprice"])
    assert set(got) == set(by_status)
    for status, vals in by_status.items():
        v = np.array(vals)
        q25, q50, q75, n = got[status]
        assert n == len(vals)
        assert abs(q50 - np.quantile(v, 0.5)) < 1e-9
        assert abs(q25 - np.quantile(v, 0.25)) < 1e-9
        assert abs(q75 - np.quantile(v, 0.75)) < 1e-9


def test_shingle_udtf(spark):
    udtf_cls = pandas_ops.make_shingle_udtf()
    spark.udtf.register("shingles", udtf_cls)
    rows = spark.sql(
        "SELECT s.shingle, s.pos FROM shingles('a b c d', 3) AS s"
    ).collect()
    assert [(r["shingle"], r["pos"]) for r in rows] == [
        ("a b c", 0),
        ("b c d", 1),
    ]
    # lateral join over a table
    df = spark.createDataFrame([(1, "x y"), (2, "")], "id long, text string")
    df.createOrReplaceTempView("udtf_docs")
    out = spark.sql(
        "SELECT id, s.shingle FROM udtf_docs, "
        "LATERAL shingles(text, 3) AS s"
    ).collect()
    assert [(r["id"], r["shingle"]) for r in out] == [(1, "x y")]


def test_winnowing_selection_matches_pure_python(spark):
    """The numpy rightmost-argmin selection must equal a literal
    transcription of the winnowing paper's rule on adversarial
    tie-heavy hash streams."""
    from radient_spark.operators.pandas_ops import winnowing_fingerprints

    docs = [(1, "aaaaaaaaaaaaaaaaaaaaaaaa"), (2, "abcabcabcabcabcabcabc"),
            (3, "xy"), (4, "the quick brown fox jumps over the lazy dog")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["pos"], r["fp"])
        for r in winnowing_fingerprints(df, k=4, w=3).collect()
    }

    def ref(text, k=4, w=3, base=31, mod=1_000_003):
        codes = [ord(ch) for ch in text]
        kk = min(k, len(codes))
        hs = []
        for i in range(len(codes) - kk + 1):
            a = 0
            for cc in codes[i:i + kk]:
                a = (a * base + cc) % mod
            hs.append(a)
        ww = min(w, len(hs))
        sel = set()
        for j in range(len(hs) - ww + 1):
            sub = hs[j:j + ww]
            m = min(sub)
            arg = max(i for i, v in enumerate(sub) if v == m)
            sel.add((j + arg, hs[j + arg]))
        return sel

    want = {(d, p, f) for d, t in docs for p, f in ref(t)}
    assert got == want


def test_winnowing_shared_substring_guarantee(spark):
    """The paper's guarantee: two documents sharing any substring of
    length >= w + k - 1 select at least one common fingerprint value —
    the property that makes winnowing a LOCAL near-dup join key."""
    from radient_spark.operators.pandas_ops import winnowing_fingerprints

    shared = "this exact shared passage is long enough to be caught"
    docs = [
        (1, "prefix junk AAA " + shared + " suffix one"),
        (2, "totally different opening words " + shared + " and ending"),
        (3, "no overlap with the others at all, none whatsoever here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = winnowing_fingerprints(df, k=16, w=8).collect()
    by_doc: dict = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared passage must share a fingerprint"
    assert len(shared) >= 8 + 16 - 1  # the guarantee's precondition
