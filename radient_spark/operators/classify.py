"""fastText-style linear text classifiers: hashed bag-of-tokens
features scored by a linear layer, trained with MLlib, served as a
pure-Catalyst expression.

This is the standard pretraining-corpus quality/language classifier
shape (fastText's architecture: mean of hashed token embeddings ->
linear layer; the CCNet / LLM-curation stacks run exactly this model
over every document). The reference has no classifier surface — this
extends the engine the way its vectorizers extend text processing
(reference vectorizer contract: /root/reference/radient/tasks/
vectorizers/_base.py:13-103).

Spark-first split:
  * TRAIN — `fit_linear_classifier`: MLlib LogisticRegression over
    hashed count features. Distributed L-BFGS; one fit, coefficients
    come back to the driver (dim floats — the model IS small by
    construction, that's the point of feature hashing).
  * SERVE — `linear_classifier_score`: the coefficient vector is
    inlined as a literal Catalyst array, so scoring 100 TB of text is a
    map-only whole-stage-codegen pass: tokens -> md5 slot -> one fold
    accumulating w[slot] -> mean (+ bias). Zero shuffle, zero Python,
    zero model distribution problem (the "model" travels inside the
    query plan).

A gated `fasttext_scorer` wires a real fastText .bin when the package
exists (absent in this container).

Determinism contract (for DuckDB oracles): with integer-valued weights
the fold accumulates integers exactly (doubles are exact for |x| <
2^53), so the score is order-independent and reproducible in ANSI SQL
via the same md5-slot arithmetic used by `q_hashing_vectorizer_slots`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from radient_spark.functions.vector import lit_doubles

from radient_spark.functions import text as X
from radient_spark.operators.dedup import str_hash


def hashed_slot(token: Column, dim: int) -> Column:
    """Feature-hashing slot for a token: md5-based portable hash mod dim
    (same formula as the hashing vectorizer, so oracles share the SQL)."""
    return str_hash(token) % dim


def linear_classifier_score(
    df: DataFrame,
    weights: list[float],
    bias: float = 0.0,
    text_col: str = "text",
    out_col: str = "score",
    sigmoid: bool = False,
    mean: bool = True,
) -> DataFrame:
    """Score text with a linear bag-of-hashed-tokens model.

    score = mean_t(weights[h(t)]) + bias   (optionally sigmoid'd);
    `mean=False` skips the 1/n normalization and returns the raw fold
    sum + bias (exact when weights are integer-valued — the oracle
    contract).

    The weight vector is a LITERAL array in the plan — broadcast-free
    model serving: every executor scores rows inside whole-stage
    codegen with no shuffle and no Python worker. Empty text scores
    `bias` (sum/mean over zero tokens defined as 0).
    """
    dim = len(weights)
    if dim == 0:
        raise ValueError("weights must be non-empty")
    warr = lit_doubles(weights)
    toks = X.tokens(F.col(text_col))
    total = F.aggregate(
        F.transform(toks, lambda t: hashed_slot(t, dim)),
        F.lit(0.0),
        lambda acc, s: acc + F.element_at(warr, s.cast("int") + 1),
    )
    n = F.size(toks)
    base = (F.when(n > 0, total / n).otherwise(F.lit(0.0))) if mean else total
    logit = base + F.lit(float(bias))
    score = (F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))) if sigmoid else logit
    return df.withColumn(out_col, score)


def fit_linear_classifier(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    dim: int = 256,
    reg_param: float = 0.0,
    max_iter: int = 50,
) -> tuple[list[float], float]:
    """Train a binary linear classifier on hashed token-count features
    with MLlib LogisticRegression (distributed L-BFGS over the corpus —
    no driver-side feature matrix). Returns (weights, bias) ready for
    `linear_classifier_score`.

    Note the train/serve feature split: training uses raw slot COUNTS
    (LogisticRegression's native shape), serving uses the fastText
    mean-of-weights form. To keep fit == serve semantics we train on
    count/n_tokens (i.e. the mean formulation) by normalizing the
    feature vector per row.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.linalg import Vectors, VectorUDT

    toks = F.transform(X.tokens(F.col(text_col)), lambda t: hashed_slot(t, dim))
    staged = df.select(
        F.col(label_col).cast("double").alias("label"),
        F.col(text_col),
        toks.alias("__slots"),
    ).filter(F.size("__slots") > 0)

    # slot counts / n_tokens as a SparseVector — built per-row from the
    # slot array via a map-side fold; VectorUDT has no Arrow path, so
    # this single edge conversion is a plain UDF (bounded: train-time
    # only, never the serving path).
    @F.udf(returnType=VectorUDT())
    def to_mean_vec(slots):
        n = len(slots)
        counts: dict[int, float] = {}
        for s in slots:
            counts[int(s)] = counts.get(int(s), 0.0) + 1.0 / n
        items = sorted(counts.items())
        return Vectors.sparse(dim, [i for i, _ in items], [v for _, v in items])

    feats = staged.withColumn("features", to_mean_vec(F.col("__slots")))
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        regParam=reg_param,
        maxIter=max_iter,
    )
    model = lr.fit(feats)
    return [float(w) for w in model.coefficients], float(model.intercept)


def fasttext_scorer(
    df: DataFrame,
    model_path: str,
    text_col: str = "text",
    out_col: str = "score",
    label_index: int = 0,
) -> DataFrame:
    """Real fastText model serving (gated: the `fasttext` package is not
    in this container). Per-executor model load + Arrow-batched scoring —
    the standard CCNet language-ID / quality-filter deployment shape.
    """
    try:
        import fasttext  # noqa: F401
    except ImportError as exc:  # pragma: no cover - package absent in CI
        raise ImportError(
            "fasttext is not installed; use linear_classifier_score with "
            "fit_linear_classifier for the dependency-free path"
        ) from exc

    import pandas as pd  # pragma: no cover

    @F.pandas_udf("double")  # pragma: no cover
    def ft_score(batch: pd.Series) -> pd.Series:
        import fasttext

        model = _worker_model(fasttext, model_path)
        return batch.map(
            lambda t: float(
                model.predict(t.replace("\n", " "), k=label_index + 1)[1][label_index]
            )
        )

    return df.withColumn(out_col, ft_score(F.col(text_col)))  # pragma: no cover


_WORKER_MODELS: dict = {}


def _worker_model(fasttext_mod, path):  # pragma: no cover - gated
    if path not in _WORKER_MODELS:
        _WORKER_MODELS[path] = fasttext_mod.load_model(path)
    return _WORKER_MODELS[path]
