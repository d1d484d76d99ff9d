#!/usr/bin/env python3
"""Interleaved same-process config A/B: for each named query, alternate
conf A and conf B per execution (A,B,A,B), min per side — the two sides
share every machine moment, staged layer, and JIT state, so host
throttling cancels instead of swamping the comparison.

Usage:
  SPARK_GRAFT_AB_A='{}' SPARK_GRAFT_AB_B='{"spark.x":"y"}' \
      python opt_ab.py q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wsu_cpts_415_spark.registry import all_queries  # noqa: E402
from wsu_cpts_415_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "2"))


def main() -> None:
    conf_a = json.loads(os.environ.get("SPARK_GRAFT_AB_A", "{}"))
    conf_b = json.loads(os.environ.get("SPARK_GRAFT_AB_B", "{}"))
    spark = get_spark(app_name="wsu_cpts_415_spark-ab")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    names = sys.argv[1:]
    qs["flagship_top_customers"].fn(spark, SF_DIR).count()
    jvm_gc = spark.sparkContext._jvm.System.gc

    def run_once(name: str, conf: dict) -> float:
        for k, v in conf.items():
            spark.conf.set(k, v)
        try:
            jvm_gc()
            t0 = time.perf_counter()
            qs[name].fn(spark, SF_DIR).count()
            return time.perf_counter() - t0
        finally:
            for k in conf:
                spark.conf.unset(k)

    res: dict[str, dict] = {}
    for name in names:
        ta = min(run_once(name, conf_a) for _ in range(ROUNDS))
        tb = min(run_once(name, conf_b) for _ in range(ROUNDS))
        # second interleave pass to damp slow drift
        ta = min(ta, *(run_once(name, conf_a) for _ in range(1)))
        tb = min(tb, *(run_once(name, conf_b) for _ in range(1)))
        res[name] = {
            "a": round(ta, 3),
            "b": round(tb, 3),
            "b_over_a": round(tb / ta, 3) if ta > 0 else None,
        }
    tot_a = round(sum(r["a"] for r in res.values()), 3)
    tot_b = round(sum(r["b"] for r in res.values()), 3)
    print(
        json.dumps(
            {
                "queries": res,
                "total_a": tot_a,
                "total_b": tot_b,
                "b_over_a": round(tot_b / tot_a, 3),
                "conf_a": conf_a,
                "conf_b": conf_b,
            }
        )
    )


if __name__ == "__main__":
    main()
