"""Cross-system table fingerprints for snapshot reconciliation.

After any large copy, migration, or incremental-maintenance step the
first question is "does the replica hold exactly the rows the source
holds?" — at 100 TB the only affordable answer is an order-insensitive
fingerprint both systems can compute independently and compare as two
scalars. This module implements the standard construction: hash each
row's canonical string with a hash both engines share (md5), fold a
fixed-width prefix to an integer, and SUM — addition is commutative, so
the fingerprint is independent of partitioning, task order, and row
order, and any single-row difference changes it.

Spark-first shape: one scan, whole-stage-codegen md5 + conv, one
map-side-combined global SUM — no shuffle beyond the 1-row aggregate,
no driver state, trivially parallel at any scale. The same fingerprint
is expressible in ANSI SQL (DuckDB: CAST('0x'||substr(md5(s),1,15) AS
BIGINT)), which is exactly what makes it a CROSS-system check — the
registry oracle is the other system.

Canonicalization contract (what makes the two engines agree):
  * caller passes explicit per-column string expressions — integers and
    strings cast natively, timestamps through an explicit format
    pattern (engine-default timestamp rendering is not portable);
  * NULL encodes as the literal token ``\\0null`` (concat_ws silently
    drops NULLs, which would collide ('a', NULL) with ('a',''));
  * columns join with '|' in the caller's declared order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 15 hex chars = 60 bits, so each term < 2^60; sums ride DECIMAL(38,0)
# (no overflow below ~10^20 rows) and fold mod 2^60 back into a BIGINT.
_HEX_CHARS = 15
_MOD = 1 << 60


def table_fingerprint(
    df: DataFrame, cols: list[Column], n_rows_col: str = "n_rows",
    checksum_col: str = "checksum",
) -> DataFrame:
    """1-row (n_rows, checksum) order-insensitive fingerprint of the
    canonical row strings built from ``cols`` (see module contract)."""
    canon = F.concat_ws(
        "|", *[F.coalesce(c.cast("string"), F.lit("\0null")) for c in cols]
    )
    h = F.conv(F.substring(F.md5(canon), 1, _HEX_CHARS), 16, 10).cast(
        "decimal(38,0)"
    )
    return df.select(h.alias("__h")).agg(
        F.count(F.lit(1)).alias(n_rows_col),
        F.coalesce((F.sum("__h") % F.lit(_MOD)).cast("long"), F.lit(0))
        .alias(checksum_col),
    )


def fingerprint_sql(table: str, col_exprs: list[str]) -> str:
    """The identical fingerprint as ANSI/DuckDB SQL — the comparison
    target a second system would run. ``col_exprs`` are SQL string
    expressions matching the Spark columns one-for-one."""
    canon = " || '|' || ".join(
        f"coalesce(CAST({e} AS VARCHAR), chr(0) || 'null')" for e in col_exprs
    )
    return (
        f"SELECT COUNT(*) AS n_rows, "
        f"COALESCE(CAST(SUM(CAST(('0x' || substr(md5({canon}), 1, "
        f"{_HEX_CHARS})) AS BIGINT)) % {_MOD} AS BIGINT), 0) AS checksum "
        f"FROM {table}"
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    cols: list[Column],
    status_col: str = "status",
) -> DataFrame:
    """Row-level reconciliation between two snapshots of a table: full
    outer join on the key, canonical-string md5 comparison on the
    payload. Returns one row per differing key with status in
    {'added', 'removed', 'changed'} — the drill-down companion to
    table_fingerprint (the scalar says WHETHER the snapshots diverged;
    this says WHERE).

    Scale shape: one key-partitioned full outer join; payloads travel
    as one fixed-width hash, not as the row (changed-detection never
    widens the shuffle). ``cols`` uses the same canonicalization
    contract as table_fingerprint.
    """
    canon = F.md5(
        F.concat_ws(
            "|", *[F.coalesce(c.cast("string"), F.lit("\0null")) for c in cols]
        )
    )
    o = old.select(*key_cols, canon.alias("__ho"))
    n = new.select(*key_cols, canon.alias("__hn"))
    joined = o.join(n, key_cols, "full_outer")
    status = (
        F.when(F.col("__ho").isNull(), F.lit("added"))
        .when(F.col("__hn").isNull(), F.lit("removed"))
        .when(F.col("__ho") != F.col("__hn"), F.lit("changed"))
    )
    return (
        joined.withColumn(status_col, status)
        .filter(F.col(status_col).isNotNull())
        .select(*key_cols, status_col)
    )


def _consecutive_pairs(
    keys: DataFrame, bucket_width: int, span: int
) -> DataFrame:
    """(k, nk) consecutive-pair detection over a distinct `k` column
    with NO unbounded window anywhere in the plan: keys bucket by
    ``k div bucket_width`` (parallel per-bucket lead windows), and the
    cross-bucket boundary pairs come from RECURSING on the bucket ids
    themselves — consecutive-bucket detection is the same problem one
    level up, on a value range `bucket_width` times smaller.  The
    recursion bottoms out when the remaining span fits in one bucket,
    so the only totally-ordered window ever executed runs over at most
    ``bucket_width + 1`` rows.  Depth = log_width(span): 4 levels cover
    a 10^12 key space at the default width."""
    if span <= bucket_width:
        w = Window.orderBy("k")
        return (
            keys.withColumn("nk", F.lead("k").over(w))
            .filter(F.col("nk").isNotNull())
            .select("k", "nk")
        )
    bk = keys.withColumn("b", F.expr(f"k div {int(bucket_width)}"))
    win = Window.partitionBy("b").orderBy("k")
    within = (
        bk.withColumn("nk", F.lead("k").over(win))
        .filter(F.col("nk").isNotNull())
        .select("k", "nk")
    )
    summary = bk.groupBy("b").agg(
        F.min("k").alias("mn"), F.max("k").alias("mx")
    )
    bpairs = _consecutive_pairs(
        summary.select(F.col("b").alias("k")),
        bucket_width,
        span // bucket_width + 1,
    )
    boundary = (
        bpairs.withColumnRenamed("k", "b_lo")
        .withColumnRenamed("nk", "b_hi")
        .join(
            summary.select(F.col("b").alias("b_lo"), "mx"), "b_lo"
        )
        .join(summary.select(F.col("b").alias("b_hi"), "mn"), "b_hi")
        .select(F.col("mx").alias("k"), F.col("mn").alias("nk"))
    )
    return within.unionByName(boundary)


def sequence_gaps(
    df: DataFrame,
    key_col: str,
    bucket_width: int = 1024,
) -> DataFrame:
    """Gap census of a surrogate-key sequence: for every missing run in
    the key space, one (gap_len, n_gaps) histogram row — the data-loss
    tripwire for append-only feeds (a dropped producer batch shows up
    as a gap spike at its batch size).

    A global lead() window would sort every key in ONE reducer; instead
    consecutive pairs come from _consecutive_pairs' recursive bucketing
    (round 6: the former single boundary window over the bucket summary
    — one reducer over span/width rows — is now recursed away too; every
    window in the plan is bounded at bucket_width rows). The one driver
    action is a 1-row (min, max) aggregate to size the recursion."""
    keys = df.select(F.col(key_col).cast("long").alias("k")).distinct()
    bounds = keys.agg(F.min("k").alias("lo"), F.max("k").alias("hi")).first()
    if bounds["lo"] is None:
        return keys.select(
            F.col("k").alias("gap_len"), F.lit(0).cast("long").alias("n_gaps")
        ).limit(0)
    span = int(bounds["hi"]) - int(bounds["lo"]) + 1
    pairs = _consecutive_pairs(keys, int(bucket_width), span)
    return (
        pairs.withColumn("gap_len", F.col("nk") - F.col("k") - 1)
        .filter(F.col("gap_len") > 0)
        .groupBy("gap_len")
        .agg(F.count(F.lit(1)).alias("n_gaps"))
    )


def grouped_fingerprint(
    df: DataFrame,
    group_cols: list[str],
    cols: list[Column],
    n_rows_col: str = "n_rows",
    checksum_col: str = "checksum",
) -> DataFrame:
    """table_fingerprint per group: one (n_rows, checksum) row per key
    of ``group_cols``. The binary-search layer between the scalar
    fingerprint (did ANYTHING diverge?) and snapshot_diff (which keys?)
    — compare per-partition/per-source checksums first and run the
    key-level diff only inside the groups that disagree, so a 100 TB
    reconciliation touches keys only where the damage is."""
    canon = F.concat_ws(
        "|", *[F.coalesce(c.cast("string"), F.lit("\0null")) for c in cols]
    )
    h = F.conv(F.substring(F.md5(canon), 1, _HEX_CHARS), 16, 10).cast(
        "decimal(38,0)"
    )
    return (
        df.select(*group_cols, h.alias("__h"))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias(n_rows_col),
            F.coalesce((F.sum("__h") % F.lit(_MOD)).cast("long"), F.lit(0))
            .alias(checksum_col),
        )
    )
