"""Top-k vector search and similarity joins (exact / brute-force baselines).

Reference behavior being re-expressed (see SURVEY.md §2.5/§2.7):
- GANN search: per-leaf candidate scan -> bounded max-heap of size k ->
  sorted (id, distance) output (/root/reference/radient/tasks/sinks/local/
  _gann_c_src/gann.c:999-1080).
- Drug-discovery brute force: pairwise Jaccard `cdist` + `argsort[:10]`
  (/root/reference/examples/drug_discovery.md:42-48).

Spark-first shapes:
- Single query -> `orderBy(score).limit(k)`: Spark compiles this to
  TakeOrderedAndProject — a per-partition bounded heap + driver merge,
  exactly the C max-heap but distributed. No full sort, no shuffle of the
  data, scales to any number of partitions.
- Query batch -> broadcast the (small) query side, compute scores in a
  single narrow stage, then per-query top-k via window `row_number`.
  The big corpus side is never shuffled.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from radient_spark.functions import vector as V

_METRICS = {
    "cosine": lambda a, b: V.cosine_similarity(a, b),
    "dot": lambda a, b: V.dot(a, b),
    "l2": lambda a, b: -V.l2_distance(a, b),  # negated: higher is better
}


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
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = df.withColumn(score_col, F.round(_score(metric, F.col(vec_col), q), 6))
    order = [F.col(score_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    return scored.orderBy(*order).limit(k)


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

    The query side is broadcast (it is the small side by construction), so
    the corpus is scanned once with no shuffle; per-query top-k is a window
    over (query_id) — the only shuffle is on the (tiny) scored pairs.
    """
    q = queries.select(
        F.col(query_id).alias("__qid"), F.col(query_vec).alias("__qvec")
    )
    pairs = corpus.crossJoin(F.broadcast(q))
    scored = pairs.withColumn(
        score_col, F.round(_score(metric, F.col(corpus_vec), F.col("__qvec")), 6)
    )
    w = Window.partitionBy("__qid").orderBy(
        F.col(score_col).desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__qvec", "__rn")
        .withColumnRenamed("__qid", query_id)
    )


def similarity_self_join(
    df: DataFrame,
    vec_col: str = "vec",
    id_col: str = "id",
    threshold: float = 0.95,
    metric: str = "cosine",
    score_col: str = "score",
) -> DataFrame:
    """All pairs (a,b), a.id < b.id, with similarity above `threshold`.

    This is the exact O(n^2) baseline used as the correctness oracle for the
    LSH-bucketed scale path (operators/dedup.py). At cluster scale use the
    LSH variant; this one is for modest n or per-bucket verification.
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn(
            score_col, F.round(_score(metric, F.col("vec_a"), F.col("vec_b")), 6)
        )
        .filter(F.col(score_col) >= threshold)
        .select("id_a", "id_b", score_col)
    )
