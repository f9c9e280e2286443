"""Keyword retrieval (BM25) and hybrid rank fusion (RRF).

The reference's search surface is vector-only (Milvus/Mongo sinks +
the local GANN index, /root/reference/radient/tasks/sinks/milvus.py:
122-127); production RAG stacks pair that with lexical BM25 and fuse
the two rankings — Milvus itself exposes exactly this as "hybrid
search with RRF ranker". This module supplies both halves DataFrame-
natively so the engine covers the full retrieval story.

Scale shape (BM25): corpus statistics are two broadcast-sized sides —
a 1-row (N, avgdl) aggregate cross-joined in, and a |query|-row df(t)
aggregate — so scoring is scan → explode-to-matched-terms →
per-doc sum. The corpus shuffles only (doc_id, term-match) rows for
documents containing ≥1 query term; documents with no hits never
reach the aggregation. No collect, no driver state.

Determinism contract: idf is rounded to 6 decimals before use (the
DSIR discipline — ln() is the one implementation-defined operation);
per-term scores are rounded then summed through DECIMAL(18,6), so
aggregation order cannot change the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from radient_spark.functions import text as X


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    score_col: str = "bm25",
) -> DataFrame:
    """BM25 (Lucene/Robertson formula) of one query against the corpus:

      score(d) = Σ_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
      idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))

    Returns (id_col, score_col) for documents matching ≥1 term.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = docs.select(
        F.col(id_col), X.tokens(F.col(text_col)).alias("__toks")
    ).filter(F.size("__toks") > 0)
    toks = toks.withColumn("__dl", F.size("__toks"))

    # corpus stats: 1-row (N, avgdl) — broadcast cross join, no collect
    stats = toks.agg(
        F.count(F.lit(1)).alias("__n_docs"),
        F.sum("__dl").alias("__tot_dl"),
    )
    qlit = F.array(*[F.lit(t) for t in query_terms])
    hits = (
        toks.select(
            id_col,
            "__dl",
            F.explode(
                F.filter(F.col("__toks"), lambda t: F.array_contains(qlit, t))
            ).alias("__term"),
        )
        .groupBy(id_col, "__dl", "__term")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    # df(t): distinct docs per matched term — at most |query| rows
    dfreq = hits.groupBy("__term").agg(
        F.countDistinct(id_col).alias("__df")
    )
    joined = (
        hits.join(F.broadcast(dfreq), "__term")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("__tot_dl").cast("double") / F.col("__n_docs")
    idf = F.round(
        F.log(
            F.lit(1.0)
            + (F.col("__n_docs") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
        ),
        6,
    )
    tf = F.col("__tf").cast("double")
    norm = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * F.col("__dl") / avgdl))
    term_score = F.round(idf * norm, 6)
    return (
        joined.withColumn("__ts", term_score)
        .groupBy(id_col)
        .agg(
            F.sum(F.col("__ts").cast("decimal(18,6)"))
            .cast("double")
            .alias(score_col)
        )
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    rank_a: str = "rank_a",
    rank_b: str = "rank_b",
    k: int = 60,
    out_col: str = "rrf",
) -> DataFrame:
    """Reciprocal-rank fusion of two rankings (the Milvus hybrid-search
    RRFRanker): rrf = Σ 1/(k + rank), missing list counts 0. Full-outer
    join on id — one key shuffle, list sizes are already top-k bounded
    upstream."""
    a = ranked_a.select(F.col(id_col), F.col(rank_a))
    bdf = ranked_b.select(F.col(id_col), F.col(rank_b))
    fused = a.join(bdf, id_col, "full_outer")
    score = F.round(
        F.coalesce(1.0 / (F.lit(k) + F.col(rank_a)), F.lit(0.0))
        + F.coalesce(1.0 / (F.lit(k) + F.col(rank_b)), F.lit(0.0)),
        6,
    )
    return fused.withColumn(out_col, score)


def mmr_greedy(
    items: list[tuple[int, int, list[int]]], k: int, pair_sim=None
) -> list[tuple[int, int, int]]:
    """Greedy maximal-marginal-relevance selection over a SHORTLIST.

    items: (id, rel, vec) with integer rel scores and integer-quantized
    vectors; sim(a, b) = exact integer dot product. lambda is fixed at
    1/2, so argmax of lam*rel - (1-lam)*maxsim == argmax of
    (rel - maxsim) — pure integer comparisons, bit-reproducible in the
    DuckDB recursive-CTE oracle. Ties break toward the smaller id.

    Returns [(rank, id, marginal)] with marginal = rel - maxsim (first
    pick's marginal = rel).
    """

    def dot(a: list[int], b: list[int]) -> int:
        return sum(x * y for x, y in zip(a, b))

    sim = pair_sim or dot
    remaining = {i: (rel, vec) for i, rel, vec in items}
    chosen: list[tuple[int, int, int]] = []
    selected_vecs: list[list[int]] = []
    for rank in range(1, min(k, len(items)) + 1):
        best = None
        for i, (rel, vec) in remaining.items():
            marginal = (
                rel
                if not selected_vecs
                else rel - max(sim(vec, s) for s in selected_vecs)
            )
            key = (-marginal, i)
            if best is None or key < best[0]:
                best = (key, i, marginal)
        _, bid, marg = best
        chosen.append((rank, bid, marg))
        selected_vecs.append(remaining.pop(bid)[1])
    return chosen


def mmr_rerank(
    shortlist: DataFrame,
    qvec_milli: list[int],
    vec_col: str = "v",
    id_col: str = "vec_id",
    rel_col: str = "rel",
    k: int = 10,
) -> list[tuple[int, int, int]]:
    """MMR re-rank a top-n shortlist down to k diverse results.

    MMR is inherently sequential (each pick conditions on the selected
    set), so the re-rank runs on the driver over the COLLECTED shortlist
    — a documented small-side contract identical to knn_join's query
    collect: the distributed work (scoring + TakeOrderedAndProject
    truncation) happens upstream; this epilogue touches <= n rows.
    """
    rows = shortlist.select(id_col, rel_col, vec_col).collect()
    items = [(int(r[id_col]), int(r[rel_col]), list(r[vec_col])) for r in rows]
    return mmr_greedy(items, k)


def rank_by(
    df: DataFrame, score_col: str, id_col: str = "doc_id", rank_col: str = "rank"
) -> DataFrame:
    """Dense deterministic ranking (score desc, id asc). Top-k bound the
    input FIRST at scale (TakeOrderedAndProject) — the window here is a
    single-partition sort and is meant for already-truncated lists."""
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    return df.withColumn(rank_col, F.row_number().over(w))


def inverted_index_topk(
    postings: DataFrame,
    qpostings: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    q_col: str = "q_id",
    term_col: str = "term",
    wt_col: str = "wt",
    qwt_col: str = "qwt",
    score_col: str = "dot",
) -> DataFrame:
    """Batch sparse dot-product retrieval over an inverted index — the
    document-at-a-time (DAAT) evaluation every lexical search engine
    runs, expressed relationally: postings (doc, term, weight) join the
    broadcast query postings on term, and a map-side-combined groupBy
    sums the per-term weight products into the dot score.

    Scale shape: the corpus side never shuffles whole documents — only
    (query, doc, product) rows for terms the query actually contains,
    and the per-query top-k window partitions by query. Weights are
    caller-supplied integers (e.g. tf * floor(1e6/df)), so the score is
    exact integer arithmetic in any summation order: the product sum
    rides DECIMAL(38,0) and lands as BIGINT. Ties break on doc id.

    Returns (q_col, id_col, score_col, rank) with rank <= k.
    """
    prod = (
        postings.join(F.broadcast(qpostings), term_col)
        .groupBy(q_col, id_col)
        .agg(
            F.sum(
                F.col(wt_col).cast("decimal(38,0)") * F.col(qwt_col)
            ).alias("__s")
        )
        .select(
            q_col, id_col, F.col("__s").cast("long").alias(score_col)
        )
    )
    w = Window.partitionBy(q_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return (
        prod.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
