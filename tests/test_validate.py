"""Data-contract validation (operators/validate.py): per-rule exact
counts, one-pass fusion of row rules, unique-pass separation."""

from __future__ import annotations

import pytest

from radient_spark.operators.validate import validate


def _report(df, rules):
    return {r["rule_name"]: r for r in validate(df, rules).collect()}


def test_validate_counts_each_rule_type(spark):
    df = spark.createDataFrame(
        [
            (1, "O", 10.0, "1-URGENT"),
            (2, None, -5.0, "9-BOGUS"),
            (2, "X", 700000.0, None),
            (3, "F", 50.0, "5-LOW"),
        ],
        "k long, status string, price double, prio string",
    )
    rules = [
        {"name": "status_nn", "type": "not_null", "column": "status"},
        {"name": "status_enum", "type": "accepted_values", "column": "status",
         "values": ["O", "F", "P"]},
        {"name": "price_range", "type": "range", "column": "price",
         "lo": 0.0, "hi": 600000.0},
        {"name": "prio_fmt", "type": "regex", "column": "prio",
         "pattern": "^[1-5]-[A-Z]+$"},
        {"name": "k_unique", "type": "unique", "column": "k"},
    ]
    rep = _report(df, rules)
    assert rep["status_nn"]["n_violations"] == 1
    assert rep["status_enum"]["n_violations"] == 2   # NULL + 'X'
    assert rep["price_range"]["n_violations"] == 2   # -5 and 700000
    assert rep["prio_fmt"]["n_violations"] == 2      # '9-BOGUS' + NULL
    assert rep["k_unique"]["n_violations"] == 1      # k=2 twice
    assert all(r["n_checked"] == 4 for r in rep.values())


def test_validate_row_rules_fuse_into_one_aggregate(spark):
    """All row-level rules must share ONE scan (no per-rule jobs)."""
    df = spark.range(100).selectExpr("id", "CAST(id AS STRING) AS s")
    rules = [
        {"name": "a", "type": "not_null", "column": "s"},
        {"name": "b", "type": "range", "column": "id", "lo": 0, "hi": 1000},
        {"name": "c", "type": "regex", "column": "s", "pattern": "^[0-9]+$"},
    ]
    plan = validate(df, rules)._jdf.queryExecution().executedPlan().toString()
    # one HashAggregate pair (partial+final) over one scan — no union
    assert plan.lower().count("scan ") <= 1
    rep = _report(df, rules)
    assert all(rep[n]["n_violations"] == 0 for n in "abc")


def test_validate_rejects_unknown_rule(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        validate(df, [{"name": "x", "type": "nope", "column": "id"}])
