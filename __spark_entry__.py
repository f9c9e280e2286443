"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      -> flagship query (TPC-H Q1 shape) at sf0.001.
queries()         -> every implemented operator from SURVEY.md §2 as
                     (spark, sf_dir) -> DataFrame.
oracle_sql()      -> matching DuckDB ANSI-SQL oracles (column names/types
                     aligned; see radient_spark/queries.py for the
                     determinism contract).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from radient_spark.queries import QUERIES
from radient_spark.queries import oracle_sql as _oracle_sql
from radient_spark.queries import queries as _queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = QUERIES["q01_pricing_summary"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _queries()


def oracle_sql() -> dict[str, str]:
    return _oracle_sql()
