"""BM25 + RRF hybrid retrieval (operators/retrieval.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from radient_spark.operators.retrieval import bm25_scores, rank_by, rrf_fuse


def test_bm25_matches_hand_formula(spark):
    corpus = [
        (1, "spark join spark filter"),
        (2, "join window"),
        (3, "nothing relevant here"),
        (4, "spark spark spark spark window"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(df, ["spark", "window"], "text", "doc_id").collect()
    }
    assert 3 not in got  # no matching term -> never scored
    # hand computation (same rounding discipline)
    n, avgdl = 4, (4 + 2 + 3 + 5) / 4
    dls = {1: 4, 2: 2, 4: 5}
    tfs = {1: {"spark": 2}, 2: {"window": 1}, 4: {"spark": 4, "window": 1}}
    dfreq = {"spark": 2, "window": 2}
    k1, b = 1.2, 0.75
    for d, terms in tfs.items():
        exp = 0.0
        for t, tf in terms.items():
            idf = round(math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5)), 6)
            norm = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dls[d] / avgdl))
            exp += round(idf * norm, 6)
        assert got[d] == pytest.approx(exp, abs=1e-9), d


def test_bm25_empty_query_rejected(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(df, [])


def test_rrf_fusion_missing_side_counts_zero(spark):
    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank_a int")
    b = spark.createDataFrame([(2, 1), (9, 2)], "doc_id long, rank_b int")
    got = {
        r["doc_id"]: (r["rank_a"], r["rank_b"], r["rrf"])
        for r in rrf_fuse(a, b, "doc_id", "rank_a", "rank_b", k=60).collect()
    }
    assert got[1] == (1, None, round(1 / 61, 6))
    assert got[2] == (2, 1, round(1 / 62 + 1 / 61, 6))
    assert got[9] == (None, 2, round(1 / 62, 6))


def test_rank_by_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [(3, 1.0), (1, 1.0), (2, 2.0)], "doc_id long, s double"
    )
    ranks = {r["doc_id"]: r["rank"] for r in rank_by(df, "s", "doc_id").collect()}
    assert ranks == {2: 1, 1: 2, 3: 3}


def test_mmr_greedy_skips_redundant_runner_up():
    from radient_spark.operators.retrieval import mmr_greedy

    # id 2 has the 2nd-best relevance but duplicates id 1; id 3 is
    # orthogonal with lower relevance — MMR must pick 3 over 2.
    items = [
        (1, 100, [10, 0]),
        (2, 99, [10, 0]),
        (3, 50, [0, 10]),
    ]
    out = mmr_greedy(items, k=2)
    assert [(r, i) for r, i, _ in out] == [(1, 1), (2, 3)]
    # marginals: first pick = rel; second = rel - dot([0,10],[10,0]) = 50.
    assert out[0][2] == 100 and out[1][2] == 50


def test_mmr_greedy_tiebreaks_toward_smaller_id():
    from radient_spark.operators.retrieval import mmr_greedy

    items = [(7, 10, [1]), (3, 10, [1]), (9, 10, [1])]
    out = mmr_greedy(items, k=3)
    assert [i for _, i, _ in out] == [3, 7, 9]


def test_srp_pairs_sound_and_recall_floor(spark, sf_dir):
    """SRP-LSH candidates are verified exact cosines (soundness), and
    the angle blocking recovers a reasonable fraction of the truly
    near-identical pairs (cos >= 0.9 -> expected Hamming ~2 of 16)."""
    from pyspark.sql import functions as F
    from radient_spark.operators.topk import similarity_self_join
    from radient_spark.queries import QUERIES

    srp = {
        (r.id_a, r.id_b): r.score
        for r in QUERIES["q_embedding_srp_pairs"][0](spark, sf_dir).collect()
    }
    from radient_spark.catalog import load_tables

    emb = load_tables(spark, sf_dir)["embeddings"].select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    exact = {
        (r.id_a, r.id_b): r.score
        for r in similarity_self_join(emb, "vec", "id", threshold=0.9).collect()
    }
    # soundness: every reported score is a real >= 0.4 cosine
    assert all(s >= 0.4 for s in srp.values())
    if exact:
        hits = sum(1 for p in exact if p in srp)
        assert hits / len(exact) >= 0.3, (hits, len(exact))


def test_retrieval_metrics_hand_case(spark):
    from radient_spark.operators.topk import retrieval_metrics

    cand = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 20, 1), (2, 21, 2), (2, 22, 3)],
        "qid long, id long, rank long",
    )
    truth = spark.createDataFrame(
        [(1, 11), (1, 12), (1, 99),      # 2 of 3 found, first at rank 2
         (2, 77), (2, 88), (2, 99)],     # nothing found
        "qid long, id long",
    )
    got = {r["qid"]: r for r in retrieval_metrics(cand, truth, k=3).collect()}
    assert got[1]["recall_at_k"] == round(2 / 3, 6)
    assert got[1]["mrr"] == 0.5
    assert got[2]["recall_at_k"] == 0.0 and got[2]["mrr"] == 0.0


def test_sq8_topk_batch_matches_single(spark, sf_dir):
    """The broadcast-weights batch ADC must score identically to the
    single-query sq8_topk for each query."""
    from radient_spark.catalog import load_tables
    from radient_spark.operators.quantize import (
        sq8_minmax,
        sq8_topk,
        sq8_topk_batch,
    )

    emb = load_tables(spark, sf_dir)["embeddings"]
    stats = sq8_minmax(emb, "embedding")
    rows = emb.orderBy("vec_id").limit(3).collect()
    queries = [(int(r["vec_id"]), list(r["embedding"])) for r in rows]
    batch = sq8_topk_batch(emb, stats, queries, k=5).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["qid"], []).append((r["id"], r["qscore"]))
    for qid, vec in queries:
        single = [
            (r["vec_id"], r["qscore"])
            for r in sq8_topk(emb, stats, vec, k=5).collect()
        ]
        assert sorted(by_q[qid]) == sorted(single), qid


def test_inverted_index_topk_matches_bruteforce(spark):
    import itertools

    from pyspark.sql import functions as F2

    from radient_spark.operators.retrieval import inverted_index_topk

    # small sparse corpus with controlled overlaps
    post = [
        (d, t, w)
        for d, tws in {
            1: [("a", 3), ("b", 1)],
            2: [("a", 2), ("c", 5)],
            3: [("b", 4), ("c", 1), ("d", 2)],
            4: [("d", 7)],
        }.items()
        for t, w in tws
    ]
    postings = spark.createDataFrame(post, "doc_id long, term string, wt long")
    qpost = spark.createDataFrame(
        [(10, "a", 2), (10, "d", 1), (11, "c", 3)],
        "q_id long, term string, qwt long",
    )
    got = {
        (r["q_id"], r["rank"]): (r["doc_id"], r["dot"])
        for r in inverted_index_topk(postings, qpost, k=2).collect()
    }
    # brute force
    docs = {1: {"a": 3, "b": 1}, 2: {"a": 2, "c": 5}, 3: {"b": 4, "c": 1, "d": 2}, 4: {"d": 7}}
    queries = {10: {"a": 2, "d": 1}, 11: {"c": 3}}
    for q, qv in queries.items():
        scored = sorted(
            (
                (-sum(w * qv.get(t, 0) for t, w in dv.items()), d)
                for d, dv in docs.items()
                if any(t in qv for t in dv)
            ),
        )
        for rank, (neg, d) in enumerate(scored[:2], start=1):
            assert got[(q, rank)] == (d, -neg)
