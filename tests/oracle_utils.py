"""Differential-test harness: Spark result vs DuckDB oracle, mirroring the
driver's order-insensitive, column-name-sorted value comparison."""

from __future__ import annotations

import math

import duckdb

from radient_spark.catalog import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(rows, columns):
    """Sort columns by name, canonicalize cell values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def cell(v):
        if v is None:
            return ("null",)
        if isinstance(v, float):
            if math.isnan(v):
                return ("nan",)
            return ("f", repr(v))
        if isinstance(v, (int, bool, str)):
            return (type(v).__name__, v)
        return ("o", str(v))

    normd = [tuple(cell(r[i]) for i in order) for r in rows]
    return sorted(normd), [columns[i] for i in order]


def compare_to_oracle(spark_df, sql: str, sf_dir: str) -> None:
    actual_cols = spark_df.columns
    actual_rows = [tuple(r) for r in spark_df.collect()]
    con = duckdb_conn(sf_dir)
    res = con.sql(sql)
    expected_cols = list(res.columns)
    expected_rows = res.fetchall()
    con.close()

    assert sorted(actual_cols) == sorted(expected_cols), (
        f"column mismatch: spark={sorted(actual_cols)} oracle={sorted(expected_cols)}"
    )
    a_norm, cols = _normalize(actual_rows, actual_cols)
    e_norm, _ = _normalize(expected_rows, expected_cols)
    assert len(a_norm) == len(e_norm), (
        f"row count mismatch: spark={len(a_norm)} oracle={len(e_norm)}"
    )
    for i, (a, e) in enumerate(zip(a_norm, e_norm)):
        assert a == e, f"row {i} mismatch (cols {cols}):\n  spark : {a}\n  oracle: {e}"
