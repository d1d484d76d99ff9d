#!/usr/bin/env python3
"""sf1 spot-bench: time the 20-query headline subset one order of
magnitude above the driver fixtures (the x10 replicated dataset from
scale_probe.py -- ~6M lineitem rows, i.e. sf1-equivalent -- built with
disjoint-subgraph key shifts and perturbed document text).  Validates
the 2x-of-baseline bar nearer production scale and surfaces any
memory-pressure behavior the sf0.1 fixtures hide.

    python sf1_bench.py            # builds /tmp/spark_graft_probe/v2_x10
                                   # if absent, prints one JSON line

Reading the numbers: per-query times should scale ~linearly (2-5x for
shuffle shapes, ~1x for bounded-grain shapes) from their sf0.1 values
in the same round's BENCH -- the same expectation the x10 probe
documents, here pinned to the headline subset as BENCH_sf1_r5.json.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("SPARK_GRAFT_PROBE_N", "10")
import scale_probe  # noqa: E402  (reuses build + key-shift machinery)

from wsu_cpts_415_spark.registry import all_queries  # noqa: E402
from wsu_cpts_415_spark.session import get_spark  # noqa: E402

HEADLINE_20 = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q9_product_type_profit",
    "q13_customer_distribution",
    "q18_large_orders",
    "q21_suppliers_waiting",
    "flagship_top_customers",
    "join_star_revenue",
    "grouping_sets_agg",
    "window_tumbling",
    "session_windows",
    "retention_cohorts",
    "rfm_segmentation",
    "dedup_exact",
    "minhash_lsh_pairs",
    "incremental_neardup_check_bucketed",
    "cosine_topk_bruteforce",
    "quality_score",
    "sequence_packing",
    "training_manifest_pipeline",
]


def main() -> None:
    spark = get_spark(app_name="wsu_cpts_415_spark-sf1-bench")
    scale_probe.build(spark)
    qs = all_queries()
    qs["flagship_top_customers"].fn(spark, scale_probe.DST).count()  # warm
    jvm_gc = spark.sparkContext._jvm.System.gc
    timings: dict[str, float] = {}
    for name in HEADLINE_20:
        best = float("inf")
        for _ in range(2):
            jvm_gc()
            t0 = time.perf_counter()
            qs[name].fn(spark, scale_probe.DST).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    print(
        json.dumps(
            {
                "metric": "sf1_headline_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": 1.0,
                "n_queries": len(timings),
            }
        )
    )


if __name__ == "__main__":
    main()
