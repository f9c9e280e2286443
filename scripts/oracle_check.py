#!/usr/bin/env python
"""Driver-protocol oracle check for a subset of queries.

Usage: python scripts/oracle_check.py [--sf DIR] q_a q_b ...
Vanilla local[8] session (the driver's own protocol), DuckDB oracle,
same value-hash as the driver. Prints one OK/FAIL line per query.
"""
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

args = sys.argv[1:]
sf = "/root/testdata/sf0.01"
if "--sf" in args:
    i = args.index("--sf")
    sf = args[i + 1]
    del args[i : i + 2]
names = args

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]").appName("oracle_check").getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402

qs, oracles = E.queries(), E.oracle_sql()
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")


def vhash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return hashlib.md5(
        str(sorted(tuple(str(r[i]) for i in order) for r in rows)).encode()
    ).hexdigest()


fails = 0
for name in names:
    sdf = qs[name](spark, sf)
    res = con.sql(oracles[name])
    ok = vhash(sdf.columns, [tuple(r) for r in sdf.collect()]) == vhash(
        list(res.columns), res.fetchall()
    )
    fails += 0 if ok else 1
    print(("OK  " if ok else "FAIL"), name, flush=True)
print(f"done: {len(names) - fails}/{len(names)} hash-match")
sys.exit(1 if fails else 0)
