#!/usr/bin/env python3
"""Targeted optimization probe: times a named subset of registry queries
with the bench protocol (min of 2, forced GC between runs) but SPLIT into
plan-construction time (the fn() call: Python DataFrame building + any
gate actions it runs) and execution time (.count() / noop), so a slow
query can be attributed to driver-side build vs cluster work.

Usage:
  python opt_probe.py q1 q2 ...            # .count() action (bench parity)
  SPARK_GRAFT_PROBE_SINK=noop python opt_probe.py q1 ...   # noop sink
  SPARK_GRAFT_PROBE_CONF='{"spark.x":"y"}' ...             # extra conf A/B

Prints one JSON line: {"queries": {name: {"build": s, "exec": s,
"total": s}}, "total": s, "conf": {...}}.
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


def main() -> None:
    extra = json.loads(os.environ.get("SPARK_GRAFT_PROBE_CONF", "{}"))
    sink = os.environ.get("SPARK_GRAFT_PROBE_SINK", "count")
    spark = get_spark(
        app_name="wsu_cpts_415_spark-optprobe", extra_conf=extra or None
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    names = sys.argv[1:]
    # warmup (bench parity)
    qs["flagship_top_customers"].fn(spark, SF_DIR).count()
    jvm_gc = spark.sparkContext._jvm.System.gc
    out: dict[str, dict] = {}
    for name in names:
        best = None
        for _ in range(2):
            jvm_gc()
            spark.sparkContext.setJobDescription(f"probe:{name}")
            t0 = time.perf_counter()
            df = qs[name].fn(spark, SF_DIR)
            t1 = time.perf_counter()
            if sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            t2 = time.perf_counter()
            rec = {
                "build": round(t1 - t0, 3),
                "exec": round(t2 - t1, 3),
                "total": round(t2 - t0, 3),
            }
            if best is None or rec["total"] < best["total"]:
                best = rec
        out[name] = best
        spark.sparkContext.setJobDescription(None)
    print(
        json.dumps(
            {
                "queries": out,
                "total": round(sum(r["total"] for r in out.values()), 3),
                "sink": sink,
                "conf": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
