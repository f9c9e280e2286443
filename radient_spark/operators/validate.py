"""Declarative data-contract validation: rule list -> violations report.

The ingest-time gate a 100 TB pipeline runs before anything downstream
trusts a table: a declarative contract (not-null, unique, accepted
values, range, regex) evaluated in as few passes as the rule mix
allows, producing one row per rule with exact violation counts.

Spark-first shape: every ROW-LEVEL rule (not_null / accepted_values /
range / regex) compiles to a conditional-aggregate expression and ALL
of them run in ONE whole-stage-codegen scan — adding rules adds zero
passes. UNIQUE rules are column-level (they need a distinct), so each
runs as its own 2-agg (COUNT(*), COUNT(DISTINCT col)) pass rather than
being fused into the row pass — fusing countDistinct with other heavy
aggregates forces Catalyst's Expand (one input-row copy per distinct
aggregate), the q_approx_cardinalities lesson (SCALING.md).

Rules are plain dicts so contracts can live in config:
  {"name": ..., "type": "not_null",        "column": c}
  {"name": ..., "type": "unique",          "column": c}
  {"name": ..., "type": "accepted_values", "column": c, "values": [...]}
  {"name": ..., "type": "range",           "column": c, "lo": x, "hi": y}
  {"name": ..., "type": "regex",           "column": c, "pattern": p}
    (keep patterns in the RE2-portable subset — no lookarounds — so the
     same contract is checkable by engines with RE2 regexes)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ROW_TYPES = {"not_null", "accepted_values", "range", "regex"}


def _violation_pred(rule: dict):
    col = F.col(rule["column"])
    t = rule["type"]
    if t == "not_null":
        return col.isNull()
    if t == "accepted_values":
        return ~col.isin(*rule["values"]) | col.isNull()
    if t == "range":
        return (col < rule["lo"]) | (col > rule["hi"]) | col.isNull()
    if t == "regex":
        return ~col.rlike(rule["pattern"]) | col.isNull()
    raise ValueError(f"unknown rule type: {t!r}")


def validate(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate a contract; returns one row per rule:
    (rule_name, rule_type, column_name, n_violations, n_checked)."""
    if not rules:
        raise ValueError("rules must be non-empty")
    row_rules = [r for r in rules if r["type"] in _ROW_TYPES]
    uniq_rules = [r for r in rules if r["type"] == "unique"]
    unknown = [r for r in rules if r["type"] not in _ROW_TYPES | {"unique"}]
    if unknown:
        raise ValueError(f"unknown rule types: {[r['type'] for r in unknown]}")

    out = None
    if row_rules:
        aggs = [F.count(F.lit(1)).alias("__n")]
        for i, r in enumerate(row_rules):
            aggs.append(
                F.sum(
                    F.when(_violation_pred(r), F.lit(1)).otherwise(F.lit(0))
                ).alias(f"__v{i}")
            )
        wide = df.agg(*aggs)
        arr = F.array(
            *[
                F.struct(
                    F.lit(r["name"]).alias("rule_name"),
                    F.lit(r["type"]).alias("rule_type"),
                    F.lit(r["column"]).alias("column_name"),
                    F.col(f"__v{i}").cast("long").alias("n_violations"),
                    F.col("__n").cast("long").alias("n_checked"),
                )
                for i, r in enumerate(row_rules)
            ]
        )
        out = wide.select(F.explode(arr).alias("r")).select("r.*")
    for r in uniq_rules:
        col = F.col(r["column"])
        one = df.agg(
            (F.count(col) - F.countDistinct(col)).cast("long").alias(
                "n_violations"
            ),
            F.count(F.lit(1)).cast("long").alias("n_checked"),
        ).select(
            F.lit(r["name"]).alias("rule_name"),
            F.lit("unique").alias("rule_type"),
            F.lit(r["column"]).alias("column_name"),
            "n_violations",
            "n_checked",
        )
        out = one if out is None else out.unionByName(one)
    return out
