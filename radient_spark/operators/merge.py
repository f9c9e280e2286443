"""MERGE INTO / upsert for corpus refresh: apply a delta of documents
(new + changed rows) to an existing corpus in one key-shuffle pass.

A 100 TB training corpus is not rebuilt per crawl — each snapshot lands
as a delta that must be merged by key: new rows inserted, changed rows
replaced, unchanged rows kept (and ideally not rewritten). Warehouse
engines spell this MERGE INTO; the reference's ingest layer
(/root/reference/radient/tasks/sources/ingest.py:7-18) only appends,
so this is the missing half of its COPY-INTO story.

Spark-first shape: ONE hash shuffle on the merge key for the merged
view (union + per-key window, no join), and a single full-outer join
for the audit report. Both sides stream; no driver state, no collect.
At scale the window variant beats the join variant because the delta
is usually tiny relative to the corpus: AQE sees the skew, and the
union's shuffle carries each key once per side instead of materializing
join rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Upsert `source` into `target` by `keys`: source rows win on key
    collision, target rows survive otherwise. Columns must match.

    Plan: union with a priority tag + row_number over the key — one
    shuffle, map-side streaming, whole-stage codegen either side.
    Deterministic: ties cannot occur (priority is distinct per side;
    duplicate keys WITHIN a side are resolved in source-first order and
    should be pre-deduped by the caller if meaningful).
    """
    cols = target.columns
    if set(cols) != set(source.columns):
        raise ValueError(
            f"schema mismatch: target {sorted(cols)} vs source {sorted(source.columns)}"
        )
    tagged = source.select(*cols).withColumn("__pri", F.lit(0)).unionByName(
        target.select(*cols).withColumn("__pri", F.lit(1))
    )
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy("__pri")
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__pri", "__rn")
    )


def merge_report(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Audit the merge without applying it: per-row action column
    (`insert` — key only in source; `update` — key in both, any
    compare_col differs; `unchanged` — key in both, all equal;
    `keep` — key only in target). One full-outer join on the key.

    NULL-safe comparison via the <=> operator (eqNullSafe), so NULL ->
    value and value -> NULL both count as updates.
    """
    s = source.select(
        *[F.col(k).alias(f"__sk_{k}") for k in keys],
        *[F.col(c).alias(f"__sv_{c}") for c in compare_cols],
    )
    t = target.select(
        *[F.col(k).alias(f"__tk_{k}") for k in keys],
        *[F.col(c).alias(f"__tv_{c}") for c in compare_cols],
    )
    cond = None
    for k in keys:
        e = F.col(f"__sk_{k}") == F.col(f"__tk_{k}")
        cond = e if cond is None else (cond & e)
    joined = s.join(t, cond, "full_outer")
    in_s = F.col(f"__sk_{keys[0]}").isNotNull()
    in_t = F.col(f"__tk_{keys[0]}").isNotNull()
    same = None
    for c in compare_cols:
        e = F.col(f"__sv_{c}").eqNullSafe(F.col(f"__tv_{c}"))
        same = e if same is None else (same & e)
    action = (
        F.when(in_s & ~in_t, F.lit("insert"))
        .when(in_s & in_t & same, F.lit("unchanged"))
        .when(in_s & in_t, F.lit("update"))
        .otherwise(F.lit("keep"))
    )
    key_cols = [
        F.coalesce(F.col(f"__sk_{k}"), F.col(f"__tk_{k}")).alias(k) for k in keys
    ]
    return joined.select(*key_cols, action.alias("action"))


def merge_summary(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Merge audit rolled up to one row per action with counts."""
    return (
        merge_report(target, source, keys, compare_cols)
        .groupBy("action")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def scd2_history(
    df: DataFrame,
    key: str,
    attr: str,
    order_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Slowly-changing-dimension Type 2 reconstruction: collapse an
    attribute-change event stream into versioned validity windows —
    (key, attr, valid_from, valid_to, n_rows, version, is_current),
    with half-open [valid_from, valid_to) ranges chained so each
    version's valid_to is the next version's valid_from and the last
    version is open-ended (valid_to NULL, is_current true). This is the
    dimension-table history a warehouse MERGE pipeline materializes;
    combined with merge_upsert it gives the full SCD2 write path.

    Consecutive runs of the same attribute value collapse into ONE
    version (gaps-and-islands: change flag -> running version number),
    so re-observations without a change never fork a version.

    Scale shape: one shuffle on `key` shared by every window (lag,
    version cumsum, lead) plus the run groupBy — windows and aggregate
    are all partition-compatible, so Exchange is reused. Ordering ties
    break on `tiebreak_col` to stay deterministic across engines.
    """
    w = Window.partitionBy(key).orderBy(order_col, tiebreak_col)
    # null-safe change flag: (attr != lag(attr)) is NULL when either
    # side is NULL, which would silently merge a NULL observation into
    # the previous version AND fork a spurious version on the next
    # non-NULL re-observation.  eqNullSafe treats NULL as a value
    # (NULL==NULL, NULL!=x), and the first row is flagged explicitly
    # (lag(attr).isNull() cannot distinguish "first row" from "prior
    # value was NULL").
    chg = (
        (F.row_number().over(w) == F.lit(1))
        | ~F.col(attr).eqNullSafe(F.lag(attr).over(w))
    ).cast("long")
    runs = df.withColumn(
        "__v",
        F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    versions = runs.groupBy(key, "__v").agg(
        F.first(attr).alias(attr),
        F.min(order_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    wv = Window.partitionBy(key).orderBy("__v")
    return versions.select(
        key,
        attr,
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        "n_rows",
        F.col("__v").cast("long").alias("version"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
    )


def scd2_merge(
    history: DataFrame,
    new_obs: DataFrame,
    key: str,
    attr: str,
    order_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """INCREMENTAL SCD2 maintenance: apply a batch of new observations
    to an existing `scd2_history` table without replaying untouched
    keys' history — the nightly-merge form of the SCD2 write path.
    Result is row-identical to `scd2_history(all observations)` when
    each key's new observations are not older than its last recorded
    observation (the in-order warehouse-arrival contract; collapsed
    versions cannot be split retroactively).

    Shape at scale: untouched keys pass through with ZERO recompute
    (one anti-join on the batch's key set); touched keys re-run
    gaps-and-islands over (their collapsed runs + the new rows) — work
    proportional to the delta's key count, never the history size.
    One key shuffle shared by the window chain.
    """
    touched = new_obs.select(key).distinct()
    untouched = history.join(touched, key, "left_anti")
    old_runs = history.join(touched, key, "semi").select(
        F.col(key),
        F.col(attr),
        F.col("valid_from").alias("__ord"),
        F.col("n_rows").alias("__w"),
        F.lit(0).alias("__src"),
        F.col("version").alias("__seq"),
    )
    fresh = new_obs.select(
        F.col(key),
        F.col(attr),
        F.col(order_col).alias("__ord"),
        F.lit(1).alias("__w"),
        F.lit(1).alias("__src"),
        F.col(tiebreak_col).alias("__seq"),
    )
    obs = old_runs.unionByName(fresh)
    w = Window.partitionBy(key).orderBy("__ord", "__src", "__seq")
    chg = (
        (F.row_number().over(w) == F.lit(1))
        | ~F.col(attr).eqNullSafe(F.lag(attr).over(w))
    ).cast("long")
    runs = obs.withColumn(
        "__v", F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    versions = runs.groupBy(key, "__v").agg(
        F.first(attr).alias(attr),
        F.min("__ord").alias("valid_from"),
        F.sum("__w").cast("long").alias("n_rows"),
    )
    wv = Window.partitionBy(key).orderBy("__v")
    merged = versions.select(
        key,
        attr,
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        "n_rows",
        F.col("__v").cast("long").alias("version"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
    )
    return untouched.unionByName(merged)


def golden_record(
    df: DataFrame,
    cluster_col: str,
    rules: dict[str, str],
    order_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Survivorship: collapse each entity cluster's conflicting
    observations into ONE golden record, attribute by attribute —
    the step after entity resolution that master-data pipelines call
    merge rules.  Strategies per attribute:

      most_recent : value of the max (order_col, tiebreak_col) row
      max / min   : extreme value across the cluster
      mode        : most frequent value (count desc, then value asc —
                    deterministic across engines)

    Shape at scale: most_recent/max/min ride ONE groupBy over the
    cluster key (max-of-struct argmax, no window, no join).  mode
    attrs each add one (cluster, value) count aggregate + a max-of-
    struct reduce — still key-shuffles, never row windows.  Output is
    one row per cluster: (cluster_col, <attr> per rule).
    """
    allowed = {"most_recent", "max", "min", "mode"}
    bad = {a: s for a, s in rules.items() if s not in allowed}
    if bad:
        raise ValueError(f"unknown survivorship strategies: {bad}")
    aggs = []
    for a, strat in rules.items():
        if strat == "most_recent":
            aggs.append(
                F.max(
                    F.struct(
                        F.col(order_col).alias("o"),
                        F.col(tiebreak_col).alias("t"),
                        F.col(a).alias("v"),
                    )
                )["v"].alias(a)
            )
        elif strat == "max":
            aggs.append(F.max(a).alias(a))
        elif strat == "min":
            aggs.append(F.min(a).alias(a))
    base = df.groupBy(cluster_col).agg(*aggs) if aggs else (
        df.select(cluster_col).distinct()
    )
    for a, strat in rules.items():
        if strat != "mode":
            continue
        counts = (
            df.groupBy(cluster_col, a)
            .agg(F.count(F.lit(1)).alias("__c"))
            .groupBy(cluster_col)
            .agg(
                F.min(
                    F.struct(
                        (-F.col("__c")).alias("nc"), F.col(a).alias("v")
                    )
                )["v"].alias(a)
            )
        )
        base = base.join(counts, cluster_col)
    return base


def join_view_delta(
    base_a: DataFrame,
    delta_a: DataFrame,
    base_b: DataFrame,
    delta_b: DataFrame,
    on: Sequence[str],
) -> DataFrame:
    """Incremental JOIN-view maintenance (append-only deltas): the new
    rows a materialized view A ⋈ B gains when batches dA and dB land,
    via the delta-join identity

        d(A ⋈ B) = dA ⋈ B  ∪  A ⋈ dB  ∪  dA ⋈ dB

    — so refreshing the view costs three joins whose LEFT sides are
    delta-sized, never a recompute of A ⋈ B.  Appending the result to
    the old view equals the full recompute (A∪dA) ⋈ (B∪dB); that
    equality is this operator's oracle contract.

    Scale shape: dA ⋈ B and A ⋈ dB broadcast the delta side when small
    (AQE decides), and dA ⋈ dB is delta×delta.  The base tables are
    each scanned once; nothing re-joins base×base.
    """
    cols = on if isinstance(on, list) else list(on)
    return (
        delta_a.join(base_b, cols)
        .unionByName(base_a.join(delta_b, cols))
        .unionByName(delta_a.join(delta_b, cols))
    )


def cdc_apply(
    log: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """Materialize the CURRENT snapshot from a change-data-capture log:
    per key, the row with the highest (seq_cols) wins — an upsert
    replaces the row, a `delete_op` removes the key from the snapshot.
    The consumer-side half of every CDC pipeline (Debezium-style
    ordered op streams) and the generalization of merge_upsert to logs
    holding MANY versions of a key plus deletes.

    Spark-first shape: ONE hash shuffle of the log on the key — per-key
    latest-wins runs as max_by over a version struct (map-side combined
    aggregate, no window sort, no join), then a filter drops keys whose
    last operation is a delete. At 100 TB the log shuffles once; the
    snapshot never exists as an intermediate.

    `seq_cols` must totally order versions within a key (add a tiebreak
    column: CDC offsets, LSNs, or (ts, offset) pairs)."""
    return cdc_latest(
        log, key_cols, seq_cols, op_col=op_col, delete_op=delete_op
    ).filter(F.col(op_col) != delete_op).drop(op_col)


def cdc_latest(
    log: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "delete",  # noqa: ARG001 — kept for signature parity
) -> DataFrame:
    """cdc_apply without the tombstone filter: per key the highest-seq
    row wins, but DELETED keys stay in the output (op_col column kept,
    payload from the delete row — typically NULL). The carrier the
    streaming CDC sink needs: a tombstone must remember the key's seq
    high-water mark and cumulative n_versions, or a later lower-seq
    upsert would wrongly resurrect it and the version count restarts.
    Same single hash shuffle / max_by plan as cdc_apply."""
    payload = [
        c for c in log.columns if c not in (*key_cols, *seq_cols, op_col)
    ]
    version = F.struct(
        *[F.col(c) for c in seq_cols],
        F.col(op_col).alias("__op"),
        *[F.col(c) for c in payload],
    )
    latest = log.groupBy(*key_cols).agg(
        F.max_by(version, F.struct(*[F.col(c) for c in seq_cols])).alias(
            "__v"
        ),
        F.count(F.lit(1)).alias("n_versions"),
    )
    return latest.select(
        *key_cols,
        *[F.col(f"__v.{c}").alias(c) for c in seq_cols],
        F.col("__v.__op").alias(op_col),
        *[F.col(f"__v.{c}").alias(c) for c in payload],
        "n_versions",
    )
