"""Property tests for the Catalyst function layer (SURVEY.md §5.2 item 3)
against numpy on randomized inputs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from radient_spark.functions import text as X
from radient_spark.functions import vector as V


def _vec_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in a], [float(x) for x in b]) for i, (a, b) in enumerate(rows)],
        "id long, a array<float>, b array<float>",
    )


def test_vector_identities_match_numpy(spark):
    rng = np.random.RandomState(3)
    rows = [(rng.randn(16), rng.randn(16)) for _ in range(50)]
    df = _vec_df(spark, rows).select(
        "id",
        V.dot("a", "b").alias("dot"),
        V.cosine_similarity("a", "b").alias("cos"),
        V.l2_distance("a", "b").alias("l2"),
        V.sq_norm("a").alias("na2"),
    )
    got = {r["id"]: r for r in df.collect()}
    for i, (a, b) in enumerate(rows):
        a32, b32 = a.astype(np.float32).astype(np.float64), b.astype(np.float32).astype(np.float64)
        assert abs(got[i]["dot"] - a32 @ b32) < 1e-9
        assert abs(got[i]["cos"] - (a32 @ b32) / (np.linalg.norm(a32) * np.linalg.norm(b32))) < 1e-9
        assert abs(got[i]["l2"] - np.linalg.norm(a32 - b32)) < 1e-9
        assert abs(got[i]["na2"] - a32 @ a32) < 1e-9
        assert -1.0 - 1e-9 <= got[i]["cos"] <= 1.0 + 1e-9


def test_normalize_idempotent_and_unit(spark):
    rng = np.random.RandomState(4)
    rows = [(rng.randn(8) * rng.uniform(0.1, 100), np.zeros(8)) for _ in range(20)]
    df = _vec_df(spark, rows)
    once = df.select("id", V.l2_normalize("a").alias("n1"))
    twice = once.select("id", V.l2_normalize("n1").alias("n2"), "n1")
    for r in twice.collect():
        n1, n2 = np.array(r["n1"]), np.array(r["n2"])
        assert abs(np.linalg.norm(n1) - 1.0) < 1e-5
        assert np.allclose(n1, n2, atol=1e-6)  # normalize(normalize(x)) == normalize(x)
    # zero vector passes through unchanged
    z = df.select(V.l2_normalize("b").alias("z")).collect()[0]["z"]
    assert list(z) == [0.0] * 8


def test_jaccard_bool_properties(spark):
    rng = np.random.RandomState(5)
    rows = [
        (list(map(bool, rng.randint(0, 2, 32))), list(map(bool, rng.randint(0, 2, 32))))
        for _ in range(30)
    ]
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)],
        "id long, a array<boolean>, b array<boolean>",
    )
    got = {
        r["id"]: (r["jab"], r["jba"], r["jaa"])
        for r in df.select(
            "id",
            V.jaccard_bool("a", "b").alias("jab"),
            V.jaccard_bool("b", "a").alias("jba"),
            V.jaccard_bool("a", "a").alias("jaa"),
        ).collect()
    }
    for i, (a, b) in enumerate(rows):
        jab, jba, jaa = got[i]
        assert jab == jba  # symmetric
        assert 0.0 <= jab <= 1.0
        assert jaa == (1.0 if any(a) else 0.0)  # self-similarity
        inter = sum(x and y for x, y in zip(a, b))
        union = sum(x or y for x, y in zip(a, b))
        assert abs(jab - (inter / union if union else 0.0)) < 1e-12


def test_shingles_count_and_content(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b"), (2, ""), (3, "solo")],
        "id long, text string",
    )
    rows = {
        r["id"]: r["sh"]
        for r in df.select(
            "id", X.word_shingles("text", k=3).alias("sh")
        ).collect()
    }
    assert rows[0] == ["a b c", "b c d", "c d e"]
    assert rows[1] == ["a b"]  # fewer than k tokens -> whole text
    assert rows[2] == []
    assert rows[3] == ["solo"]


def test_char_ngrams(spark):
    df = spark.createDataFrame([(0, "abcd"), (1, "ab"), (2, "")], "id long, t string")
    rows = {
        r["id"]: r["g"]
        for r in df.select("id", X.char_ngrams("t", n=3).alias("g")).collect()
    }
    assert rows[0] == ["abc", "bcd"]
    assert rows[1] == ["ab"]
    assert rows[2] == []


def test_approx_sketches_within_bounds(spark, sf_dir):
    from radient_spark.queries import QUERIES

    rows = QUERIES["q_approx_cardinalities"][0](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        # the query now emits error-bound certificates directly (round-5:
        # oracle-checkable instead of rows-only)
        assert r["hll_within_5pct"], r["l_returnflag"]
        assert r["median_within_1pct"], r["l_returnflag"]
        assert r["exact_orders"] > 0 and r["n_rows"] > 0


def test_rolling_fingerprint_paths_agree(spark):
    """The Catalyst-expression and vectorized-numpy rolling hashes must
    produce identical integers (the oracle contract)."""
    from radient_spark.functions.text import rolling_hash_fingerprint
    from radient_spark.operators.pandas_ops import rolling_fingerprints

    texts = ["short", "x" * 15, "y" * 16, "the quick brown fox jumps over it", "a b c d e f g h i j k l m"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    expr = {
        r["doc_id"]: r["fp"]
        for r in df.select(
            "doc_id", rolling_hash_fingerprint("text", k=16).alias("fp")
        ).collect()
    }
    vec = {r["doc_id"]: r["fp"] for r in rolling_fingerprints(df).collect()}
    assert expr == vec


def test_quality_score_monotone_band(spark):
    texts = ["", "word", "the quick brown fox jumps over the lazy dog " * 5, "1234 5678 !!!"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = {
        r["id"]: r["q"]
        for r in df.select("id", X.quality_score("text").alias("q")).collect()
    }
    assert all(0.0 <= v <= 1.0 for v in got.values())
    assert got[2] > got[1] > got[0]  # longer fluent text scores higher
    assert got[2] > got[3]  # digits/punctuation score lower than prose


def test_sparse_count_vectors_and_conversions(spark):
    from pyspark.ml.linalg import SparseVector

    from radient_spark.operators import sparse as S

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b c"), (3, "c c c")], "doc_id long, text string"
    )
    vecs, vocab = S.sparse_count_vectors(docs, out_col="tf")
    assert sorted(vocab) == ["a", "b", "c"]
    rows = {r["doc_id"]: r["tf"] for r in vecs.collect()}
    assert all(isinstance(v, SparseVector) for v in rows.values())
    slot = {t: i for i, t in enumerate(vocab)}
    assert rows[1][slot["a"]] == 2.0 and rows[1][slot["b"]] == 1.0
    assert rows[3][slot["c"]] == 3.0 and rows[3].numNonzeros() == 1

    # long view matches collections.Counter ground truth
    long = {
        (r["doc_id"], r["term"]): r["value"]
        for r in S.sparse_terms_long(vecs, vocab, vec_col="tf").collect()
    }
    assert long == {
        (1, "a"): 2.0, (1, "b"): 1.0, (2, "b"): 1.0,
        (2, "c"): 1.0, (3, "c"): 3.0,
    }

    # dense roundtrip: sparse -> array -> dense vector -> sparse
    arr = vecs.select(
        "doc_id", S.sparse_to_array(F.col("tf")).alias("a")
    )
    back = arr.select("doc_id", S.array_to_sparse_vector(F.col("a")).alias("v"))
    got = {r["doc_id"]: r["v"] for r in back.collect()}
    for d in (1, 2, 3):
        assert got[d] == rows[d], (d, got[d], rows[d])


def test_sparse_tfidf_formula(spark):
    import math

    from radient_spark.operators import sparse as S

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a c"), (3, "a d")], "doc_id long, text string"
    )
    vecs, vocab = S.sparse_tfidf(docs, out_col="tfidf")
    long = {
        (r["doc_id"], r["term"]): r["value"]
        for r in S.sparse_terms_long(vecs, vocab, vec_col="tfidf").collect()
    }
    # 'a' in all 3 docs: idf = ln(4/4) = 0 -> filtered from long view
    assert not any(t == "a" for _, t in long)
    # 'b' in 1 doc: tf=1, idf = ln(4/2)
    assert abs(long[(1, "b")] - math.log(4 / 2)) < 1e-9


def test_truncate_normalize_unit_norm_and_prefix(spark):
    from radient_spark.functions import vector as V

    df = spark.createDataFrame(
        [(1, [3.0, 4.0, 100.0, -7.0])], "id long, v array<double>"
    )
    out = df.select(V.truncate_normalize("v", 2).alias("t")).collect()[0]["t"]
    assert out == pytest.approx([0.6, 0.8], abs=1e-6)  # prefix, renormalized (float32 canon)


def test_binary_quantize_and_hamming_match_numpy(spark):
    import numpy as np

    from radient_spark.functions import vector as V

    rng = np.random.RandomState(9)
    vecs = [[float(x) for x in rng.randn(64)] for _ in range(20)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id long, v array<double>"
    )
    q = [float(x) for x in rng.randn(64)]

    def pack(v):
        words = []
        for w in range(2):
            word = 0
            for i in range(32):
                if v[w * 32 + i] > 0:
                    word |= 1 << i
            words.append(word)
        return words

    qw = pack(q)
    got = {
        r["id"]: (r["codes"], r["ham"])
        for r in df.select(
            "id",
            V.binary_quantize("v", 64, 32).alias("codes"),
            V.hamming_distance_words(
                V.binary_quantize("v", 64, 32),
                F.array(*[F.lit(w).cast("long") for w in qw]),
            ).alias("ham"),
        ).collect()
    }
    for i, v in enumerate(vecs):
        pw = pack(v)
        assert got[i][0] == pw
        exp_ham = sum(bin(a ^ b).count("1") for a, b in zip(pw, qw))
        assert got[i][1] == exp_ham


def test_binary_quantize_partial_last_word(spark):
    from radient_spark.functions import vector as V

    df = spark.createDataFrame([(1, [1.0, -1.0, 1.0])], "id long, v array<double>")
    out = df.select(V.binary_quantize("v", 3, 32).alias("c")).collect()[0]["c"]
    assert out == [0b101]  # 3 dims pack into one word, high bits zero


def test_normalize_text_folds_unicode_and_whitespace(spark):
    from radient_spark.functions.text import normalize_text

    rows = [
        ("“Hello” — World…  extra space",),
        ("hello  world",),
    ]
    df = spark.createDataFrame(rows, ["t"])
    got = [r["c"] for r in df.select(normalize_text("t").alias("c")).collect()]
    assert got[0] == '"hello" - world... extra space'
    assert got[1] == "hello world"


def test_normalize_text_exposes_dup_collisions(spark):
    """Cosmetic variants must collapse to one canonical form — the
    pre-hash-dedup contract."""
    from pyspark.sql import functions as F
    from radient_spark.functions.text import normalize_text

    rows = [("Same   doc",), ("same doc",), ("SAME DOC",)]
    df = spark.createDataFrame(rows, ["t"])
    n = df.select(normalize_text("t").alias("c")).distinct().count()
    assert n == 1
