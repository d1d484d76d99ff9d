#!/usr/bin/env python3
"""sf1 FULL-REGISTRY bench: time every registered query one order of
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
documents.  HEADLINE_20's subtotal stays the stable cross-round
comparator (BENCH_sf1_r5/r6 timed exactly that subset; r7 added the
frozen EXPENSIVE_50); round 8 extends coverage to ALL registered
queries (round-7 verdict task #5 -- the r7 extension past the headline
20 is what caught the CEP state-write amplification, so the tail gets
the same treatment).  The two stable subsets keep min-of-two-run
timing; the tail is timed once to bound the wall clock, which is the
right trade for its purpose -- catching super-linear kernels, not
tracking sub-second jitter.  ``ngram_jaccard_matmul`` and
``ngram_jaccard_pairs`` stay in with their labels: they are the
engine's documented all-pairs-quadratic exactness baselines (sgemm and
posting-list forms), so their sf1 numbers MEASURE the quadratic rather
than hiding it (~130-160 s each at x10 on this fixed-vocabulary
fixture, where nearly every doc pair shares a shingle).  ``per_family`` totals (queries grouped by defining module) feed
the per-family scaling note in SCALE.md.
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

# Round-7 extension (round-6 verdict item 6): the 50 most expensive
# registry queries by their round-6 sf0.1 bench time, FROZEN here so the
# set stays a stable cross-round comparator.  Deliberately includes the
# suite's heaviest streaming queries (Structured Streaming fixed costs
# plus x10 state) and the iterative-graph kernels (pagerank, k-core,
# star-contraction CC, label propagation, BFS), the two families whose
# memory-pressure behavior the 20-query subset hides.
EXPENSIVE_50 = [
    "streaming_stream_stream_join",
    "copurchase_part_pairs",
    "prefix_filter_jaccard_join",
    "streaming_cep_error_after_purchase",
    "kcore_neardup_graph",
    "pagerank_videos",
    "boilerplate_strip",
    "label_propagation",
    "ingest_dedup_gate",
    "cc_star_contraction",
    "streaming_dedup_within_watermark",
    "q2_min_cost_supplier",
    "common_neighbor_sim",
    "er_match_scores",
    "runtime_bloom_pruned_join",
    "pca_projection_check",
    "q16_parts_supplier_relationship",
    "hard_negative_mining",
    "peak_concurrent_sessions",
    "markov_stationary_dist",
    "q21_suppliers_waiting",
    "boilerplate_line_filter",
    "crossdoc_span_dedup",
    "streaming_seasonal_alerts",
    "streaming_session_aggs",
    "streaming_cms_frequency_check",
    "streaming_distinct_users_daily",
    "q4_order_priority",
    "streaming_static_enrich",
    "q3_shipping_priority",
    "ngram_jaccard_matmul",
    "q8_market_share",
    "q5_local_supplier_volume",
    "boilerplate_top_lines",
    "tfidf_top_terms",
    "mannwhitney_u_test",
    "q7_volume_shipping",
    "bfs_hops_videos",
    "q10_returned_items",
    "bloom_membership_audit",
    "join_star_revenue",
    "embedding_covariance_topdims",
    "ann_int8_topk",
    "streaming_sliding_counts",
    "community_modularity",
    "skyline_price_size",
    "funnel_within_window",
    "join_null_safe_eq",
    "streaming_tumbling_counts",
    "bigram_pmi_topk",
]

# transform-shaped: .count() would let Catalyst prune the wide output
# projection; time through the noop sink (same set as bench.py)
FULL_WIDTH = {"boilerplate_strip"}


def _prior_sf1() -> tuple[str, dict] | None:
    """Most recent sf1 artifact's per-query map (BENCH_sf1_r{N}.json,
    newest round first) -- the reference the outlier re-timer and the
    canary ratio compare against."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = []
    for p in glob.glob(os.path.join(here, "BENCH_sf1_r*.json")):
        m = re.fullmatch(r"BENCH_sf1_r(\d+)\.json", os.path.basename(p))
        if m:
            rounds.append((int(m.group(1)), p))
    for _, path in sorted(rounds, reverse=True):
        try:
            with open(path) as f:
                prior = json.load(f)
        except (OSError, ValueError):
            continue
        if isinstance(prior.get("parsed"), dict):
            prior = prior["parsed"]
        if isinstance(prior.get("queries"), dict):
            return os.path.basename(path), prior["queries"]
    return None


def main() -> None:
    spark = get_spark(app_name="wsu_cpts_415_spark-sf1-bench")
    scale_probe.build(spark)
    qs = all_queries()
    qs["flagship_top_customers"].fn(spark, scale_probe.DST).count()  # warm
    jvm_gc = spark.sparkContext._jvm.System.gc
    stable = HEADLINE_20 + [
        n for n in EXPENSIVE_50 if n not in HEADLINE_20
    ]
    # ref_* parity queries are excluded at replica scale for the same
    # documented reason scale_probe.py excludes them: the videos graph
    # is SYNTHESIZED from doc_id assuming contiguity (pipelines/
    # videos.py _DUCK_GRAPH_HELPERS), and the replica key shift makes
    # base/bn degenerate -- the round-8 run measured ref_scc_components
    # at 102 s on that garbage graph, which is a fixture artifact, not
    # a kernel cost (the SCC kernel's scale evidence is the x10/x100
    # cc_star_contraction probes + the pathological-topology probe).
    tail = sorted(
        n for n in qs if n not in stable and not n.startswith("ref_")
    )
    prior_found = _prior_sf1()
    prior = prior_found[1] if prior_found else {}

    def time_once(name: str) -> float | None:
        jvm_gc()
        t0 = time.perf_counter()
        try:
            df = qs[name].fn(spark, scale_probe.DST)
            if name in FULL_WIDTH:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
        except Exception as exc:  # rc stays 0; the artifact reports
            errors[name] = str(exc)[:160]
            return None
        return time.perf_counter() - t0

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    retimed: dict[str, dict] = {}
    # host-spike guard for the runs=1 tail (round-10 finding: a
    # transient throttle printed an 11x outlier that needed a manual
    # solo re-time to adjudicate): any tail entry whose ratio vs its
    # prior-round time exceeds the threshold is immediately re-timed
    # and BOTH numbers land in the artifact -- min is the recorded
    # timing (a genuine regression reproduces; a spike doesn't)
    from bench import REGRESSION_RATIO

    # r13 verdict item 5: the two x10 watch items get min-of-2 like the
    # stable sets -- ngram_jaccard_pairs is the labeled quadratic
    # exactness baseline that DOMINATES the full-registry total (~230 s
    # of ~820 at x10) and was single-timed; percent_rank_scalable's
    # 0.75->2.55 s move was a single-timed tail artifact.  Neither joins
    # the frozen comparator subsets; the decision is recorded in the
    # artifact via `min2_watch`.
    min2_watch = {"ngram_jaccard_pairs", "percent_rank_scalable"}
    watch_runs: dict[str, list] = {}
    for name in stable + tail:
        runs = 2 if (name in stable or name in min2_watch) else 1
        samples = []
        for _ in range(runs):
            t = time_once(name)
            if t is None:
                break
            samples.append(t)
        if name in errors:
            continue
        if name in min2_watch:
            # BOTH runs land in the artifact: run 1 carries any
            # session-staged build/recompute the query triggers (for
            # ngram_jaccard_pairs, the shared exact pair table whose
            # build is the documented quadratic), run 2 the steady-state
            # read that matches every other staged consumer's number
            watch_runs[name] = [round(s, 3) for s in samples]
        best = min(samples)
        p = prior.get(name)
        if runs == 1 and p and p > 0.5 and best > p * REGRESSION_RATIO:
            t2 = time_once(name)
            if t2 is not None:
                retimed[name] = {
                    "first_sec": round(best, 3),
                    "retime_sec": round(t2, 3),
                    "prior_sec": p,
                }
                best = min(best, t2)
        timings[name] = round(best, 3)
    per_family: dict[str, float] = {}
    for name, t in timings.items():
        fam = qs[name].fn.__module__.rsplit(".", 1)[-1]
        per_family[fam] = round(per_family.get(fam, 0.0) + t, 3)
    # machine-speed canaries, same sets as bench.py (round-10 verdict:
    # the sf1 artifact must carry its own speed reference so a reader
    # adjudicates outliers without a worktree control)
    from bench import CANARY_JOBS_QUERIES, CANARY_QUERIES

    def _canary(names) -> dict | None:
        if not all(n in timings and n in prior for n in names):
            return None
        now = sum(timings[n] for n in names)
        then = sum(prior[n] for n in names)
        if then <= 0:
            return None
        return {
            "now_sec": round(now, 3),
            "prior_sec": round(then, 3),
            "ratio": round(now / then, 3),
        }
    print(
        json.dumps(
            {
                "metric": "sf1_headline_total_sec",
                # headline subtotal stays the cross-round comparator
                # (BENCH_sf1_r5/r6 timed exactly HEADLINE_20)
                # .get(): a stable-subset query that errored has no
                # timing row -- the subtotal must still print so the
                # artifact (with its errors map) is never lost
                "value": round(
                    sum(timings.get(n, 0.0) for n in HEADLINE_20), 3
                ),
                "unit": "sec",
                "queries": timings,
                "sf": 1.0,
                "n_queries": len(timings),
                # a subtotal computed over fewer queries than its set
                # (because one errored) must be machine-detectable, not
                # just visible via the errors map: an errored query
                # otherwise reads as a timing improvement cross-round
                "headline_missing": sorted(
                    n for n in HEADLINE_20 if n not in timings
                ),
                "expensive50_total_sec": round(
                    sum(timings.get(n, 0.0) for n in EXPENSIVE_50), 3
                ),
                "expensive50_missing": sorted(
                    n for n in EXPENSIVE_50 if n not in timings
                ),
                "full_registry_total_sec": round(
                    sum(timings.values()), 3
                ),
                "per_family": dict(sorted(per_family.items())),
                "errors": errors,
                # tail members promoted to min-of-2 this round (watch
                # items); also reported: the full-registry total MINUS
                # the labeled quadratic exactness baselines, since those
                # two measure the documented all-pairs quadratic, not
                # the deployed paths (their capped/bucketed twins)
                "min2_watch": sorted(min2_watch),
                "watch_runs": watch_runs,
                "full_registry_sans_quadratic_sec": round(
                    sum(
                        t
                        for n, t in timings.items()
                        if n
                        not in ("ngram_jaccard_pairs", "ngram_jaccard_matmul")
                    ),
                    3,
                ),
                "baseline": prior_found[0] if prior_found else None,
                "scan_canary": _canary(CANARY_QUERIES),
                "jobs_canary": _canary(CANARY_JOBS_QUERIES),
                # tail entries re-timed after tripping the outlier
                # threshold vs the prior artifact (both numbers kept;
                # min recorded in `queries`)
                "retimed": retimed,
            }
        )
    )


if __name__ == "__main__":
    main()
