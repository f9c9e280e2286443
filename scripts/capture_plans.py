#!/usr/bin/env python
"""Capture .explain("formatted") for registry queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <outdir-suffix> <query...> [--all]
e.g.   python scripts/capture_plans.py r12 --suffix before q_triangle_count

Writes plans/r12/<query>_<suffix>.txt for each named query (or every
BENCH query with --all). Plan capture is driver-side only (no jobs are
run beyond what plan analysis itself needs).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from radient_spark.queries import QUERIES  # noqa: E402
from radient_spark.session import get_session  # noqa: E402


def explain_formatted(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    args = sys.argv[1:]
    tag = args.pop(0)
    suffix = "plan"
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    names = list(QUERIES) if args == ["--all"] else args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(outdir, exist_ok=True)
    spark = get_session("plan_capture")
    for name in names:
        fn, _ = QUERIES[name]
        try:
            txt = explain_formatted(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            txt = f"PLAN CAPTURE FAILED: {e!r}\n"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        spark.catalog.clearCache()
        print(f"captured {name}")


if __name__ == "__main__":
    main()
