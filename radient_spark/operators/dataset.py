"""Dataset-management operators for training-data pipelines: the
reproducible-split / sequence-packing / scrubbing trio every large-scale
LLM data pipeline needs (brief: first-class alongside SURVEY.md §2 —
the reference has no equivalent; these are Spark-native additions).

All three are pure Catalyst (zero UDFs, zero shuffles beyond the stated
ones) and deterministic via portable md5 arithmetic, so DuckDB oracles
check them value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from radient_spark.operators.dedup import str_hash

SPLIT_BUCKETS = 10_000


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic, reproducible dataset split: md5-hash the id into
    one of SPLIT_BUCKETS buckets and assign by cumulative weight ranges.

    Properties that matter at 100 TB: stateless per row (no shuffle, no
    sampling state), stable across runs/partitionings/engines (portable
    md5, not JVM hashCode), and append-consistent — new rows never move
    existing rows between splits.
    """
    weights = weights or {"train": 0.9, "val": 0.1}
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    bucket = str_hash(
        F.concat_ws("_", F.lit(seed), F.col(id_col))
    ) % SPLIT_BUCKETS
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total * SPLIT_BUCKETS
        clause = F.when(bucket < int(acc), F.lit(name))
        expr = clause if expr is None else expr.when(bucket < int(acc), F.lit(name))
    last = F.lit(items[-1][0])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def sequential_pack(
    df: DataFrame,
    token_col: str,
    order_col: str,
    partition_cols: list[str] | None = None,
    budget: int = 2048,
    out_col: str = "chunk_id",
) -> DataFrame:
    """Concat-then-chunk sequence packing: documents are laid out in
    `order_col` order (per partition group) and cut into chunks of
    `budget` tokens — chunk_id = floor(tokens_before / budget), the
    standard "concatenate everything, slice at the context length"
    packing of LLM pretraining pipelines.

    One window (= one shuffle on the partition cols) computes the
    running token offset; no driver state, no iteration.
    """
    w = Window.partitionBy(*(partition_cols or [])).orderBy(
        F.col(order_col).asc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn(out_col, F.floor(before / budget).cast("int"))


PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_URL = r"https?://[^\s]+"
PII_PHONE = r"\+?\d[\d\- ]{7,}\d"


def scrub_pii(
    col,
    mask_email: str = "<EMAIL>",
    mask_url: str = "<URL>",
    mask_phone: str = "<PHONE>",
):
    """Mask emails, URLs, and phone-like digit runs in a string column —
    chained regexp_replace, entirely JVM-side (the patterns are RE2/Java
    compatible so oracles reproduce them)."""
    out = F.regexp_replace(col, PII_URL, mask_url)
    out = F.regexp_replace(out, PII_EMAIL, mask_email)
    return F.regexp_replace(out, PII_PHONE, mask_phone)


def pii_counts(col) -> tuple:
    """(n_emails, n_urls) occurrence counts per row, for audit reports."""
    return (
        F.size(F.regexp_extract_all(col, F.lit(PII_EMAIL), F.lit(0))),
        F.size(F.regexp_extract_all(col, F.lit(PII_URL), F.lit(0))),
    )
