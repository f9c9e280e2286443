"""Vector quantization for embedding columns: SQ8 scalar quantization
(per-dimension affine int8 codes) — the standard memory-compression path
for similarity search at scale (4x smaller than float32, integer dot
products instead of float GEMM).

The reference keeps all vectors as float32 in its local index
(/root/reference/radient/tasks/sinks/local/_gann_c_src/gann.c stores raw
float arrays); at 100 TB of embeddings the quantized representation is
what makes the corpus fit the cluster's memory budget, so this is a
first-class beyond-reference operator (SURVEY.md §2.8).

Determinism: codes are floor((x - mn) * 255 / (mx - mn) + 0.5) computed
in double precision with that exact association — each step is a single
correctly-rounded IEEE op, so codes are bit-identical in any engine, and
quantized scores are *integer* sums (exact, order-independent). A DuckDB
oracle therefore hash-matches with no rounding contract at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sq8_minmax(df: DataFrame, vec_col: str = "embedding") -> list[tuple[float, float]]:
    """Per-dimension (min, max) over the corpus, computed on double-cast
    values (float32 widens exactly). One aggregation whose shuffle
    cardinality is the dimensionality (64 groups for a 64-d corpus) —
    the codebook is then a tiny driver-side literal, the legitimate
    "broadcast the model, stream the data" shape."""
    dims = df.select(F.posexplode(vec_col).alias("dim", "v")).select(
        "dim", F.col("v").cast("double").alias("v")
    )
    rows = (
        dims.groupBy("dim")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .orderBy("dim")
        .collect()
    )
    return [(r["mn"], r["mx"]) for r in rows]


def _code(x, mn, mx):
    """clamp(floor((x - mn) * 255 / (mx - mn) + 0.5), 0, 255); degenerate
    dimensions (mx == mn) code to 0. The association (x-mn)*255/(mx-mn)
    is the determinism contract — do not refactor into a precomputed
    scale, that changes the rounding."""
    raw = F.floor((x - mn) * F.lit(255.0) / (mx - mn) + F.lit(0.5))
    clamped = F.greatest(
        F.lit(0).cast("long"), F.least(F.lit(255).cast("long"), raw)
    )
    return F.when(mx == mn, F.lit(0).cast("long")).otherwise(clamped)


def sq8_encode(
    df: DataFrame,
    stats: list[tuple[float, float]],
    vec_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """Append an int8-code column (as array<long> of 0..255 values; pack
    to binary at the storage boundary for the full 4x win). Pure
    per-row Catalyst zip over literal (mn, mx) arrays — zero shuffle."""
    mn_arr = F.array(*[F.lit(float(a)) for a, _ in stats])
    mx_arr = F.array(*[F.lit(float(b)) for _, b in stats])
    centered = F.zip_with(
        F.col(vec_col), mn_arr, lambda x, m: F.struct(
            x.cast("double").alias("x"), m.alias("mn")
        )
    )
    codes = F.zip_with(
        centered, mx_arr, lambda s, mx: _code(s["x"], s["mn"], mx)
    )
    return df.withColumn(out_col, codes)


def sq8_topk(
    df: DataFrame,
    stats: list[tuple[float, float]],
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_col: str = "qscore",
) -> DataFrame:
    """Top-k by asymmetric distance computation (ADC), the standard SQ8
    search scoring: the raw double query against code reconstructions.
    Per dim, q_i * recon_i = q_i*mn_i + c_i * (q_i*(mx_i-mn_i)/255); the
    first term is a row-constant offset that cannot change the ranking,
    so the score is sum_i c_i * w_i with per-dim weights w_i precomputed
    driver-side (i.e. the reported score is the true dot product minus
    the constant sum_i q_i*mn_i).

    Determinism: c_i*w_i is one IEEE multiply of bit-pinned operands;
    each term routes through DECIMAL(18,6) and then exact integer
    micro-units (x 1e6), so the fold is an order-independent integer sum
    and the final score is one deterministic division. Plan shape:
    per-row fold + TakeOrderedAndProject — the corpus never shuffles."""
    encoded = sq8_encode(df, stats, vec_col)
    weights = [
        q * (mx - mn) / 255.0 for q, (mn, mx) in zip(query, stats)
    ]
    w_arr = F.array(*[F.lit(float(w)) for w in weights])
    score = (
        F.aggregate(
            F.zip_with(
                F.col("codes"),
                w_arr,
                lambda c, w: (
                    (c.cast("double") * w).cast("decimal(18,6)")
                    * F.lit(1_000_000)
                ).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
        / F.lit(1_000_000.0)
    )
    return (
        encoded.select(F.col(id_col), score.alias(score_col))
        .orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        .limit(k)
    )
