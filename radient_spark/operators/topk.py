"""Top-k vector search and similarity joins (exact baselines + BLAS path).

Reference behavior being re-expressed (see SURVEY.md §2.5/§2.7):
- GANN search: per-leaf candidate scan -> bounded max-heap of size k ->
  sorted (id, distance) output (/root/reference/radient/tasks/sinks/local/
  _gann_c_src/gann.c:999-1080).
- The AVX2 dot-product kernel (gann.c:460-492): our equivalent is BLAS
  matmul over Arrow batches inside `mapInPandas` — the same SIMD, reached
  through NumPy instead of hand-written intrinsics.
- Drug-discovery brute force: pairwise Jaccard `cdist` + `argsort[:10]`
  (/root/reference/examples/drug_discovery.md:42-48).

Spark-first shapes:
- Single query -> Catalyst HOF score + `orderBy().limit(k)`: compiles to
  TakeOrderedAndProject — a per-partition bounded heap + driver merge,
  exactly the C max-heap but distributed. Stays fully JVM-side; O(n·d)
  work, no shuffle of the data.
- Query batch (kNN join) -> the query matrix is broadcast; each corpus
  Arrow batch computes an (n_batch x n_query) GEMM and emits only its
  per-query top-k candidates, so the corpus is scanned once, never
  shuffled, and the global window sees ~k rows per query per partition.
- All-pairs threshold join -> distributed block GEMM: rows hash into
  buckets, each unordered bucket pair is one applyInPandas task, nothing
  is collected to the driver or broadcast. At cluster scale the
  LSH-bucketed variant (operators/dedup.py) replaces the O(n^2) scan.

Determinism contract: scores are float64 and rounded (4 decimals for the
GEMM paths — reassociation error ~1e-14 makes 6-decimal rounding unsafe
against the sequential-fold oracle; 6 decimals for the sequential HOF
path). Per-batch and global top-k use the same (rounded score desc, id
asc) criterion, so candidate pruning can never drop a row the global
ordering would keep.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from radient_spark.functions import vector as V

_METRICS = {
    "cosine": lambda a, b: V.cosine_similarity(a, b),
    "dot": lambda a, b: V.dot(a, b),
    "l2": lambda a, b: -V.l2_distance(a, b),  # negated: higher is better
}

PAIR_SCORE_DECIMALS = 4


def _score(metric: str, a, b):
    try:
        return _METRICS[metric](a, b)
    except KeyError:
        raise ValueError(f"unknown metric {metric!r}; one of {sorted(_METRICS)}")


def topk(
    df: DataFrame,
    vec_col: str,
    query: Sequence[float],
    k: int = 10,
    metric: str = "cosine",
    score_col: str = "score",
    tiebreak: str | None = None,
) -> DataFrame:
    """Exact top-k rows most similar to a single literal query vector.

    Physical plan: scan -> project(score) -> TakeOrderedAndProject(k).
    """
    q = V.lit_doubles(query)
    scored = df.withColumn(score_col, F.round(_score(metric, F.col(vec_col), q), 6))
    order = [F.col(score_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    return scored.orderBy(*order).limit(k)


def _batch_scores(M, Q, metric: str):
    """(n x d) corpus batch vs (q x d) query matrix -> (n x q) scores,
    higher = more similar. float64 GEMM (BLAS — the SIMD path)."""
    import numpy as np

    if metric == "cosine":
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
        Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)
        return Mn @ Qn.T
    if metric == "dot":
        return M @ Q.T
    if metric == "l2":
        sq = (M * M).sum(1)[:, None] + (Q * Q).sum(1)[None, :] - 2.0 * (M @ Q.T)
        import numpy as np

        return -np.sqrt(np.maximum(sq, 0.0))
    raise ValueError(f"unknown metric {metric!r}")


def _topk_flat_candidates(S, ids, kk):
    """Per-query-column top-kk of an (n x q) score matrix, vectorized
    across ALL queries (no per-query Python loop) and tie-exact: every
    row whose score ties the per-query kk-th largest stays a candidate
    (a fixed slice could cut a tied smaller-id row the global window
    would keep), then one flattened lexsort applies the window's exact
    (score desc, id asc) criterion per query and rank < kk trims.

    Returns (row_idx, col_idx, score) flat arrays into S.
    """
    import numpy as np

    n, nq = S.shape
    if n > kk:
        thr = -np.partition(-S, kk - 1, axis=0)[kk - 1]
        ii, jj = np.nonzero(S >= thr[None, :])
    else:
        ii, jj = np.nonzero(np.ones_like(S, dtype=bool))
    s_c = S[ii, jj]
    order = np.lexsort((ids[ii], -s_c, jj))
    jj_sorted = jj[order]
    starts = np.searchsorted(jj_sorted, np.arange(nq))
    rank = np.arange(len(jj_sorted)) - starts[jj_sorted]
    keep = order[rank < kk]
    return ii[keep], jj[keep], s_c[keep]


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_vec: str = "vec",
    query_vec: str = "vec",
    k: int = 10,
    metric: str = "cosine",
    query_id: str = "qid",
    corpus_id: str = "id",
    score_col: str = "score",
) -> DataFrame:
    """Exact k-nearest-neighbors of every query row against the corpus.

    The query side must fit on the driver (it is the small side by
    contract); it is shipped to executors as a Spark broadcast. Each
    corpus Arrow batch computes one GEMM and emits its per-query top-k, so
    the corpus is never shuffled and the final per-query window runs over
    ~k * n_partitions candidate rows, not n_corpus.
    """
    import numpy as np

    q_rows = queries.select(query_id, query_vec).collect()
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    bc = corpus.sparkSession.sparkContext.broadcast((qids, Q))
    id_type = dict(corpus.dtypes)[corpus_id]
    out_schema = f"{corpus_id} {id_type}, {query_id} long, {score_col} double"

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        qids_, Q_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.array(pdf[corpus_vec].tolist(), dtype=np.float64)
            S = np.round(_batch_scores(M, Q_, metric), PAIR_SCORE_DECIMALS)
            ids = pdf[corpus_id].to_numpy()
            kk = min(k, len(pdf))
            ii, jj, sc = _topk_flat_candidates(S, ids, kk)
            yield pd.DataFrame(
                {
                    corpus_id: ids[ii],
                    query_id: qids_[jj],
                    score_col: sc,
                }
            )

    cand = corpus.select(corpus_id, corpus_vec).mapInPandas(gen, out_schema)
    w = Window.partitionBy(query_id).orderBy(
        F.col(score_col).desc(), F.col(corpus_id).asc()
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def knn_join_blocked(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_vec: str = "vec",
    query_vec: str = "vec",
    k: int = 10,
    metric: str = "cosine",
    query_id: str = "qid",
    corpus_id: str = "id",
    score_col: str = "score",
    corpus_blocks: int = 8,
    query_blocks: int = 4,
    score_band: tuple[float, float] | None = None,
) -> DataFrame:
    """Exact kNN join where BOTH sides are DataFrames at data scale —
    nothing is collected to the driver and nothing is broadcast.

    `score_band=(lo, hi)` restricts candidates to lo <= score < hi
    BEFORE the per-query top-k — the hard-negative-mining contract
    (contrastive training wants the closest non-duplicates: the band
    ceiling excludes near-dups/self, the floor excludes easy negatives).
    The band applies to the rounded score, so it is oracle-exact.

    Bipartite block GEMM: corpus rows hash into `corpus_blocks` buckets,
    queries into `query_blocks`; every (corpus bucket, query bucket)
    pair is one applyInPandas task computing its score block and emitting
    per-query top-k candidates (exact within the corpus block, so the
    global per-query window over corpus_blocks*k candidates is exact).

    Shuffle: corpus rows replicate query_blocks times, query rows
    corpus_blocks times; per-task memory is one block pair. Use the
    broadcast-contract knn_join when the query side fits the driver —
    it scans the corpus exactly once with no replication.
    """
    import numpy as np

    c = (
        corpus.select(
            F.col(corpus_id).alias("__rid"), F.col(corpus_vec).alias("__vec")
        )
        .withColumn("__side", F.lit(0))
        .withColumn(
            "__cb", F.pmod(F.xxhash64("__rid"), F.lit(corpus_blocks)).cast("int")
        )
        .withColumn(
            "__qb", F.explode(F.array(*[F.lit(j) for j in range(query_blocks)]))
        )
    )
    q = (
        queries.select(
            F.col(query_id).alias("__rid"), F.col(query_vec).alias("__vec")
        )
        .withColumn("__side", F.lit(1))
        .withColumn(
            "__qb", F.pmod(F.xxhash64("__rid"), F.lit(query_blocks)).cast("int")
        )
        .withColumn(
            "__cb", F.explode(F.array(*[F.lit(i) for i in range(corpus_blocks)]))
        )
    )
    cols = ["__side", "__rid", "__vec", "__cb", "__qb"]
    both = c.select(*cols).unionByName(q.select(*cols))
    out_schema = f"{corpus_id} long, {query_id} long, {score_col} double"

    def gen(key, pdf):
        import pandas as pd

        cor = pdf[pdf["__side"] == 0]
        qs = pdf[pdf["__side"] == 1]
        if len(cor) == 0 or len(qs) == 0:
            return pd.DataFrame(
                {corpus_id: pd.Series(dtype="int64"),
                 query_id: pd.Series(dtype="int64"),
                 score_col: pd.Series(dtype="float64")}
            )
        M = np.array(cor["__vec"].tolist(), dtype=np.float64)
        Q = np.array(qs["__vec"].tolist(), dtype=np.float64)
        S = np.round(_batch_scores(M, Q, metric), PAIR_SCORE_DECIMALS)
        if score_band is not None:
            lo, hi = score_band
            S = np.where((S >= lo) & (S < hi), S, -np.inf)
        ids = cor["__rid"].to_numpy()
        qids = qs["__rid"].to_numpy()
        kk = min(k, len(cor))
        ii, jj, sc = _topk_flat_candidates(S, ids, kk)
        if score_band is not None:
            keep = np.isfinite(sc)
            ii, jj, sc = ii[keep], jj[keep], sc[keep]
        return pd.DataFrame(
            {corpus_id: ids[ii], query_id: qids[jj], score_col: sc}
        )

    cand = both.groupBy("__cb", "__qb").applyInPandas(gen, out_schema)
    w = Window.partitionBy(query_id).orderBy(
        F.col(score_col).desc(), F.col(corpus_id).asc()
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def similarity_self_join(
    df: DataFrame,
    vec_col: str = "vec",
    id_col: str = "id",
    threshold: float = 0.95,
    metric: str = "cosine",
    score_col: str = "score",
    blocks: int = 8,
) -> DataFrame:
    """All pairs (a,b), a.id < b.id, with similarity >= `threshold`.

    Exact distributed block GEMM — NO driver-side collect and NO corpus
    broadcast: rows hash into `blocks` buckets, every unordered bucket
    pair (i <= j) is one applyInPandas group, and each group computes its
    (n_i x n_j) BLAS score block and emits only above-threshold pairs.

    Scale profile: one shuffle of n*blocks (id, vec) rows fanned across
    blocks*(blocks+1)/2 independent tasks; per-task memory is
    (2n/blocks)*d floats + the emitted pairs, so raising `blocks` trades
    shuffle volume for peak memory — nothing ever concentrates on the
    driver or a single executor. The O(n^2) compute is inherent to the
    exact join; at corpus scale the LSH-bucketed candidate path
    (operators/dedup.py) replaces the exact scan entirely.
    """
    import numpy as np

    tagged = df.select(id_col, vec_col).withColumn(
        "__blk", F.pmod(F.xxhash64(F.col(id_col)), F.lit(blocks)).cast("int")
    )
    pair_keys = F.array(
        *[
            F.struct(
                F.least(F.col("__blk"), F.lit(j)).alias("pi"),
                F.greatest(F.col("__blk"), F.lit(j)).alias("pj"),
            )
            for j in range(blocks)
        ]
    )
    expanded = tagged.withColumn("__pk", F.explode(pair_keys)).select(
        id_col,
        vec_col,
        "__blk",
        F.col("__pk.pi").alias("__pi"),
        F.col("__pk.pj").alias("__pj"),
    )
    out_schema = f"id_a long, id_b long, {score_col} double"

    def gen(key, pdf):
        import pandas as pd

        pi, pj = key
        if pi == pj:
            ids = pdf[id_col].to_numpy()
            M = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            S = np.round(_batch_scores(M, M, metric), PAIR_SCORE_DECIMALS)
            ii, jj = np.nonzero((S >= threshold) & (ids[:, None] < ids[None, :]))
            id_a, id_b, sc = ids[ii], ids[jj], S[ii, jj]
        else:
            a = pdf[pdf["__blk"] == pi]
            b = pdf[pdf["__blk"] == pj]
            if len(a) == 0 or len(b) == 0:
                return pd.DataFrame(
                    {"id_a": pd.Series(dtype="int64"),
                     "id_b": pd.Series(dtype="int64"),
                     score_col: pd.Series(dtype="float64")}
                )
            ids_a = a[id_col].to_numpy()
            ids_b = b[id_col].to_numpy()
            Ma = np.array(a[vec_col].tolist(), dtype=np.float64)
            Mb = np.array(b[vec_col].tolist(), dtype=np.float64)
            S = np.round(_batch_scores(Ma, Mb, metric), PAIR_SCORE_DECIMALS)
            ii, jj = np.nonzero(S >= threshold)
            la, lb = ids_a[ii], ids_b[jj]
            # each unordered cross-block pair appears in exactly one
            # group; normalize to the id_a < id_b output contract
            id_a, id_b = np.minimum(la, lb), np.maximum(la, lb)
            sc = S[ii, jj]
        return pd.DataFrame({"id_a": id_a, "id_b": id_b, score_col: sc})

    return expanded.groupBy("__pi", "__pj").applyInPandas(gen, out_schema)


def srp_signs(dim: int, n_bits: int = 16, seed: int = 7) -> list[list[int]]:
    """The +-1 hyperplane matrix for sign-random-projection LSH,
    derived from md5 so BOTH engines (and the SQL oracle generator)
    materialize the identical literal matrix from the seed."""
    import hashlib

    return [
        [
            1
            if int(
                hashlib.md5(f"{seed}_{j}_{i}".encode()).hexdigest()[:8], 16
            )
            % 2
            == 1
            else -1
            for i in range(dim)
        ]
        for j in range(n_bits)
    ]


def srp_signature(
    vec_col: str, dim: int, n_bits: int = 16, seed: int = 7
) -> F.Column:
    """Sign-random-projection (SRP) LSH code of an embedding (Charikar
    2002, SimHash for vectors): bit j = [<v, h_j> >= 0] for md5-seeded
    +-1 hyperplanes — Hamming distance between codes estimates the
    ANGLE between vectors, so pigeonhole banding over the code blocks
    candidate pairs for cosine similarity exactly like text SimHash
    blocks token sets.

    Exactness: the vector quantizes to unshifted integer micro-units
    (round(x * 1e6)); dots against +-1 are integer sums far below
    2^53, so the bit pattern is engine-independent. Zero shuffle —
    pure per-row Catalyst expressions over a literal sign matrix.
    """
    signs = srp_signs(dim, n_bits, seed)
    micro = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * 1_000_000, 0).cast("long"),
    )
    books = V.lit_long_matrix(signs)
    bits = F.transform(
        books,
        lambda srow: (
            F.aggregate(
                F.zip_with(micro, srow, lambda x, s: x * s),
                F.lit(0).cast("long"),
                lambda acc, z: acc + z,
            )
            >= 0
        ).cast("long"),
    )
    powers = V.lit_longs(1 << j for j in range(n_bits))
    return F.aggregate(
        F.zip_with(bits, powers, lambda b, p: b * p),
        F.lit(0).cast("long"),
        lambda acc, z: acc + z,
    )


def retrieval_metrics(
    cand: DataFrame,
    truth: DataFrame,
    k: int,
) -> DataFrame:
    """Retrieval-quality scorecard: grade a RANKED candidate list
    against a ground-truth relevant set, per query — the recall@k /
    MRR evaluation an ANN or quantized index runs against exact
    brute-force results before shipping a recall/latency trade-off.

    cand:  (qid, id, rank) — 1-based rank, k rows per query
    truth: (qid, id)       — the relevant set (e.g. exact top-k)

    recall_at_k = |cand ∩ truth| / k; mrr = 1/rank of the FIRST
    relevant candidate (0.0 when none).  Both are one IEEE division
    rounded to 6 — oracle-exact.  One broadcast-joinable key join +
    one groupBy; metrics tables are query-batch-sized."""
    rel = truth.select("qid", "id").withColumn("__rel", F.lit(1))
    joined = cand.join(rel, ["qid", "id"], "left")
    return (
        joined.groupBy("qid")
        .agg(
            F.round(
                F.sum(F.coalesce(F.col("__rel"), F.lit(0))).cast("double")
                / F.lit(float(k)),
                6,
            ).alias("recall_at_k"),
            F.coalesce(
                F.round(
                    F.lit(1.0)
                    / F.min(
                        F.when(F.col("__rel") == 1, F.col("rank"))
                    ).cast("double"),
                    6,
                ),
                F.lit(0.0),
            ).alias("mrr"),
        )
    )
