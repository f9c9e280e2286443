"""Differential tests: every registry query vs its DuckDB oracle.

This mirrors the driver's t2 gate (CORRECTNESS_r{N}.json) at the fast
sf0.001 scale; set SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 to run at the
driver's actual scale.
"""

from __future__ import annotations

import pytest

from radient_spark.queries import QUERIES
from tests.oracle_utils import compare_to_oracle

WITH_ORACLE = [(n, fn, sql) for n, (fn, sql) in QUERIES.items() if sql is not None]
ROWS_ONLY = [(n, fn) for n, (fn, sql) in QUERIES.items() if sql is None]


@pytest.mark.parametrize(
    "name,fn,sql", WITH_ORACLE, ids=[n for n, _, _ in WITH_ORACLE]
)
def test_query_matches_oracle(spark, sf_dir, name, fn, sql):
    compare_to_oracle(fn(spark, sf_dir), sql, sf_dir)


@pytest.mark.parametrize("name,fn", ROWS_ONLY, ids=[n for n, _ in ROWS_ONLY])
def test_rows_only_query_runs(spark, sf_dir, name, fn):
    df = fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
    # Registry-wide no-DecimalType guard (oracle-backed queries get the
    # same check inside _check_result_types): the driver hash serializes
    # Spark decimals differently from other engines' decimals even when
    # values are identical, so DECIMAL may only appear as an internal
    # accumulator, never in a final schema.
    bad = [(c, t) for c, t in df.dtypes if "decimal" in t]
    assert not bad, f"{name} emits DecimalType in final schema: {bad}"
