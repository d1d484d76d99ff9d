#!/usr/bin/env python3
"""Dump .explain("formatted") for every registered query to a directory.

Usage: python dump_plans.py <outdir> [query ...]

Writes <outdir>/<query>.txt per query (all queries when none named).
Used by the optimization rounds to capture plans/r12/<q>_before.txt /
_after.txt evidence and to grep for plan smells (Exchange counts,
CartesianProduct, BatchEvalPython, missing PushedFilters).
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wsu_cpts_415_spark.registry import all_queries  # noqa: E402
from wsu_cpts_415_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="wsu_cpts_415_spark-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    todo = names or sorted(qs)
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in todo:
        path = os.path.join(outdir, f"{name}.txt")
        try:
            df = qs[name].fn(spark, SF_DIR)
            text = df._jdf.queryExecution().explainString(mode)
        except Exception:
            text = "ERROR\n" + traceback.format_exc()
        with open(path, "w") as f:
            f.write(text)
        print(name, flush=True)


if __name__ == "__main__":
    main()
