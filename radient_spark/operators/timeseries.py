"""Time-series monitors over event streams: exact-arithmetic EWMA
smoothing + spike detection, shared by the batch query
(queries.q_ewma_spikes) and the streaming hourly-count maintenance sink
(streaming.hourly_count_sink) so stream-maintained state and the batch
recompute produce IDENTICAL monitor tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# dyadic EWMA weights (alpha = 1/2, trailing 8 points, 1/256 units):
# integer smoothing — num/den stay exact, the spike test
# cross-multiplies to an integer inequality
EWMA_WEIGHTS = [128, 64, 32, 16, 8, 4, 2, 1]


def ewma_spikes(
    counts: DataFrame,
    key_col: str = "event_type",
    time_col: str = "hour_ts",
    value_col: str = "n_events",
) -> DataFrame:
    """EWMA + Poisson-3-sigma spike flags over a per-key time series of
    counts.  The lag-chain form (8 explicit lags) keeps the monitor in
    one key-partitioned window; per-key series are bounded (years x
    8760 for hourly), the documented small-per-group contract.  The
    spike test (c - ewma)^2 > 9*ewma runs as the exact integer
    inequality (c*den - num)^2 > 9*num*den; only the REPORTED ewma
    pays one rounded division.

    The EWMA is a TRUE trailing forecast: the weight chain starts at
    lag 1 (round 6 — it previously included the current point with the
    heaviest weight, which half-composed the baseline of the value
    under test and silently damped the advertised 3-sigma threshold to
    ~6-sigma against trailing history).  Each key's FIRST point has no
    history (den = 0): ewma is NULL and is_spike false."""
    w = Window.partitionBy(key_col).orderBy(time_col)
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for i, wt in enumerate(EWMA_WEIGHTS):
        lag_i = F.lag(value_col, i + 1).over(w)
        num = num + F.coalesce(lag_i * wt, F.lit(0)).cast("long")
        den = den + F.when(lag_i.isNotNull(), F.lit(wt)).otherwise(
            F.lit(0)
        ).cast("long")
    c = F.col(value_col)
    spike = (
        (c * F.col("__den") - F.col("__num"))
        * (c * F.col("__den") - F.col("__num"))
    ) > (F.lit(9) * F.col("__num") * F.col("__den"))
    return (
        counts.withColumn("__num", num)
        .withColumn("__den", den)
        .select(
            key_col,
            time_col,
            value_col,
            F.when(
                F.col("__den") > 0,
                F.round(
                    F.col("__num").cast("double")
                    / F.col("__den").cast("double"),
                    6,
                ),
            ).alias("ewma"),
            spike.alias("is_spike"),
        )
    )
