#!/usr/bin/env python3
"""Scale probe: replicate the sf0.1 fixtures N-fold (consistent key
shifts, so every FK still joins) into /tmp and time the headline query
shapes there -- the "would this plan survive a 10x/100x scale-up" check
that local[32] can actually answer.  Not part of the driver contract; run
manually:

    SPARK_GRAFT_PROBE_N=10 python scale_probe.py

Key shifting: replica i adds i * 10^9 to every join key (orderkey,
custkey, suppkey, partkey, event/user ids, doc/vec ids), so replicas are
disjoint subgraphs -- data grows N-fold, per-key cardinalities stay
constant (the realistic fact-growth regime).  The ref_* derivation
queries are excluded (they assume doc_id contiguity).

Reading the numbers: text/embedding payloads are replicated VERBATIM, so
every document gains N-1 exact duplicates -- near-dup candidate pairs
grow ~quadratically in N by construction, and the dedup queries' probe
times reflect that duplicate-heavy corpus, not a plan regression
(minhash_lsh_pairs 11x at x10 is this effect; crossdoc_span_dedup 4.8x
is its posting lists growing 10x each).  The relational shapes scale
sub-linearly (x10 data observed at sf0.1 base: q1 2.2x, q3 3.6x,
q13 3.4x, q21 3.7x, q2 4.4x, grouping-sets 5x, star join ~linear,
windowed events ~flat), which is the AQE + partial-agg + broadcast
behavior the engine is designed around.  The round-4 operators measured
at x10 (vs their sf0.1 base): sequence_packing 1.4x, range_join_events
1.9x, token_entropy ~2x, embedding_quantize_int8 ~1.5x, fk_orphan_audit
~2x, funnel_three_step ~2x -- all sub-linear.  The round-4 audit/sketch
operators at x10 (vs solo sf0.1 base): heavy_hitters_skew 1.5x,
temperature_mix_weights ~1x, hash_sample_per_group 1.3x,
unigram_logprob_score 2.5x, expectations_report ~1.1x,
join_shuffle_hash_hint ~1.5x, cms_frequency_check ~1.6x,
bloom_membership_audit 1.3x -- bounded key spaces, single scans, and
sketch mergers all behave exactly as designed at 10x data.  The
temporal/governance/ML ops measured at x10 (2026-08-14 run,
scale_probe_r4.json): pit_join 1.3x, late_event_audit 1.0x,
interval_coverage 1.2x, gdpr_erasure 1.0x, linreg_normal_equations
1.1x, bfs_hops 1.2x, journey_trigrams 2.0x, redact 1.7x,
snapshot_diff 3.6x, quality_calibration 3.4x, bpe_merge 4.7x and
pq_ann 5.2x (the last four are one-full-scan shapes: sub-linear
against 10x input, exactly the profile expected).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from wsu_cpts_415_spark.io.tables import load_table
from wsu_cpts_415_spark.registry import all_queries
from wsu_cpts_415_spark.session import get_spark

N = int(os.environ.get("SPARK_GRAFT_PROBE_N", "10"))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = f"/tmp/spark_graft_probe/v2_x{N}"
OFF = 10**9

# Per-token perturbation rate for document text in replicas > 0 (seeded,
# deterministic).  Replicas become same-topic REWRITES of the base doc
# rather than verbatim copies: intra-replica near-dup structure is
# preserved exactly (the rewrite is a per-replica bijection on tokens),
# while cross-replica shingle Jaccard drops to ~0.01 -- far below the
# LSH s-curve threshold (~0.5 at 4 bands x 2 rows) -- so the TRUE
# near-dup pair count grows ~N-linearly and the LSH family can be
# measured at x100 instead of exempted (round-4 verdict item 3).  At 50%
# the replicas are distant paraphrase-cousins, not near-dups: that is
# the point -- if replicas WERE near-dups, quadratic pair growth would
# be the correct answer and no probe design could avoid it.
TEXT_PERTURB_PCT = 50

# key -> per-replica offset; int32 dim keys get a small offset (values
# max out in the hundreds) so they never overflow, bigint keys get 10^9
DIM_OFF = 1000
SHIFT_KEYS = {
    "region": {"r_regionkey": DIM_OFF},
    "nation": {"n_nationkey": DIM_OFF, "n_regionkey": DIM_OFF},
    "customer": {"c_custkey": OFF, "c_nationkey": DIM_OFF},
    "supplier": {"s_suppkey": OFF, "s_nationkey": DIM_OFF},
    "part": {"p_partkey": OFF},
    "orders": {"o_orderkey": OFF, "o_custkey": OFF},
    "lineitem": {"l_orderkey": OFF, "l_partkey": OFF, "l_suppkey": OFF},
    "events": {"event_id": OFF, "user_id": OFF},
    "documents": {"doc_id": OFF},
    "embeddings": {"vec_id": OFF},
}

PROBE = [
    # round-6 third-continuation kernels
    "markov_next_event_accuracy",
    "golden_record_per_user",
    "peak_concurrent_sessions",
    "wasserstein_value_drift",
    "sql_pipe_syntax",
    "collation_case_insensitive_rollup",
    "sql_parameter_surfaces",
    "ansi_try_arithmetic",
    # round-6 second-continuation kernels
    "theta_sketch_setops",
    "hill_tail_index",
    "bigram_pmi_topk",
    "chi2_keywords_per_lang",
    "fdr_bh_correction",
    "theilsen_daily_trend",
    "canary_injection_plan",
    "locf_gap_fill",
    "attribution_linear_multitouch",
    "weekly_ohlc_orders",
    "topk_with_ties_dense_rank",
    "anova_variance_decomposition",
    # round-6 continuation kernels
    "hll_sketch_rollup",
    "acf_daily_by_type",
    "cumulative_distinct_users",
    "runtime_bloom_pruned_join",
    "dp_noisy_counts",
    "weighted_reservoir_topk",
    "arrow_grouped_trimmed_mean",
    "attribution_last_touch",
    "streaming_dedup_within_watermark",
    # round-6 kernels
    "prefix_filter_jaccard_join",
    "cc_star_contraction",
    "sorted_neighborhood_pairs",
    "er_match_scores",
    # round-9 ER measurement pair: blocking recall per key arity and
    # the three-generator multi-pass recall (both ride the staged
    # ssjoin/lev/SNM/LSH tables the other probed queries build)
    "er_blocking_recall_audit",
    "er_multipass_recall",
    # round-10: the composed production ER path (union of all three
    # generators -> composite scorer -> top-k); its funnel is emitted
    # below whenever it is probed
    "er_multipass_match_scores",
    # round-10: the stop-shingle-capped exact kernel (the deployed df
    # dial) and its cost-quote audit
    "ngram_jaccard_pairs_capped",
    "stop_shingle_cap_audit",
    "multimodal_bmp_meta",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q18_large_orders",
    "q2_min_cost_supplier",
    "q13_customer_distribution",
    "q21_suppliers_waiting",
    "grouping_sets_agg",
    "flagship_top_customers",
    "join_star_revenue",
    "window_tumbling",
    "session_windows",
    "dedup_exact",
    "minhash_lsh_pairs",
    "simhash_fingerprints",
    "simhash_hamming_pairs",
    "incremental_neardup_check",
    "cosine_topk_bruteforce",
    "ann_lsh_bucketed",
    "quality_score",
    "sequence_packing",
    "crossdoc_span_dedup",
    # round 6: line-level boilerplate dedup -- digest-sized shuffles,
    # expected ~linear (perturbed replicas keep line DF counts realistic)
    "boilerplate_line_filter",
    "boilerplate_strip",
    "boilerplate_top_lines",
    "ingest_boilerplate_gate",
    # round 6: exact KS via bucket-prefix-scan -- value-grain, bounded
    # bucket metadata; expected sub-linear in event count
    "ks_test_two_sample",
    "range_join_events",
    "token_entropy",
    "embedding_quantize_int8",
    "fk_orphan_audit",
    "funnel_three_step",
    # round-4 additions; expected sub-linear (bounded key spaces / one
    # scan / sketches).  The dedup-family ops (semdedup, levenshtein,
    # kcore) are EXCLUDED for the same reason documented above: verbatim
    # replication manufactures quadratic duplicate growth.
    "heavy_hitters_skew",
    "temperature_mix_weights",
    "hash_sample_per_group",
    "unigram_logprob_score",
    "expectations_report",
    "join_shuffle_hash_hint",
    "cms_frequency_check",
    "bloom_membership_audit",
    # round-4 temporal/governance/ML ops; all bounded-key or single-scan
    # shapes except pq (training scales linearly in rows).  The
    # similarity-derived ops (community_modularity, source_vocab_overlap)
    # are excluded like the other dedup-family ops.
    "pit_join_user_tier",
    "snapshot_diff_audit",
    "late_event_audit",
    "interval_coverage_per_user",
    "journey_trigrams",
    "bpe_merge_candidates",
    "linreg_normal_equations",
    "quality_calibration_curve",
    "redact_transform_audit",
    "gdpr_erasure_audit",
    "pq_ann_adc_topk",
    "bfs_hops_videos",
    # round-4 batch 2: training-prep + experiment analytics.  All
    # bounded-output shapes: DSIR reduces to a 256-row ratio table, CDC
    # is per-row arrays, KM/CUPED/seasonality collapse to day/user
    # grains before any window.  quality_lift_deciles is included even
    # though replication manufactures duplicates (its cost is the
    # digest groupBy + partitioned ntile, both linear).
    "dsir_importance_weights",
    "cdc_chunk_boundaries",
    "quality_lift_deciles",
    "quantile_binning",
    "percentile_disc_median",
    "array_hof_suite",
    "kaplan_meier_conversion",
    "cuped_adjusted_metric",
    "k_anonymity_audit",
    "dow_seasonality",
    "training_manifest_pipeline",
    # batches 3-5: statistical audits, process mining, surface ops --
    # all calendar/user/bounded grains.  source_dedup_crosstab is
    # excluded (dedup family: replication manufactures pair growth).
    "seasonal_residual_anomalies",
    "cusum_changepoints",
    "ab_proportion_ztest",
    "hash_bootstrap_ci",
    "benford_audit",
    "neyman_allocation",
    "markov_stationary_dist",
    "basket_lift_pairs",
    "mad_outliers_per_lang",
    "funnel_within_window",
    "events_heatmap_hour_dow",
    "variant_shred_extract",
    "pandas_udaf_weighted_median",
    "quantile_normalization_map",
    "multimodal_payload_dedup",
    "hard_negative_mining",
    "matryoshka_recall_audit",
    # round 5: the perturbed replication (TEXT_PERTURB_PCT) makes the
    # dedup family measurable, so the former exclusions join the probe,
    # plus the round-5 operators themselves.
    "semdedup_prune",
    "levenshtein_blocked_pairs",
    "community_modularity",
    "source_vocab_overlap",
    "kcore_neardup_graph",
    "neardup_clusters",
    "ingest_dedup_gate",
    "incremental_neardup_check_bucketed",
    "multimodal_decode_real",
    "rfm_segmentation",
    "value_concentration_curve",
    "gini_user_value",
    "zipf_slope",
]


def build(spark) -> None:
    for table, keys in SHIFT_KEYS.items():
        out = f"{DST}/{table}.parquet"
        if os.path.exists(out):
            continue
        df = load_table(spark, SRC, table)
        reps = df.crossJoin(
            F.broadcast(
                spark.range(N).select(F.col("id").alias("_rep"))
            )
        )
        for k, off in keys.items():
            dt = dict(df.dtypes)[k]
            reps = reps.withColumn(k, (F.col(k) + F.col("_rep") * off).cast(dt))
        if table == "documents":
            # seeded token-level rewrite (see TEXT_PERTURB_PCT note)
            toks = F.split(F.col("text"), " ")
            rewritten = F.transform(
                toks,
                lambda t: F.when(
                    F.pmod(F.xxhash64(t, F.col("_rep")), F.lit(100))
                    < TEXT_PERTURB_PCT,
                    F.concat(
                        t,
                        F.lit("r"),
                        F.pmod(
                            F.xxhash64(t, F.col("_rep"), F.lit(7)), F.lit(997)
                        ).cast("string"),
                    ),
                ).otherwise(t),
            )
            reps = reps.withColumn(
                "text",
                F.when(F.col("_rep") == 0, F.col("text")).otherwise(
                    F.array_join(rewritten, " ")
                ),
            )
        cols = df.columns
        # events.ts is written as a plain timestamp (micros); the loader
        # sniffs the footer and reads it natively (io/tables.py)
        # repartition before the write: the replicate is a broadcast
        # crossJoin over the (often single-file) source, so without it
        # one or two tasks would serialize the N-fold write -- at N=100
        # that single task also GC-thrashes on the 100x row batch
        n_out = min(64, max(1, N * 2))
        reps.select(cols).repartition(n_out).write.mode("overwrite").parquet(out)


def main() -> None:
    # optional subset knob: SPARK_GRAFT_PROBE_QUERIES="q1,flagship,..."
    # (comma list) trims the run -- used for the x100 probe, where the
    # full 70+ list would accumulate >50 GB of shuffle spill in one
    # session on the shuffle-heaviest shapes
    subset = os.environ.get("SPARK_GRAFT_PROBE_QUERIES")
    global PROBE
    if subset:
        wanted = [n.strip() for n in subset.split(",") if n.strip()]
        unknown = [n for n in wanted if n not in PROBE]
        if unknown:
            raise SystemExit(f"unknown probe queries: {unknown}")
        PROBE = wanted

    spark = get_spark(app_name="scale-probe")
    t0 = time.perf_counter()
    build(spark)
    build_s = round(time.perf_counter() - t0, 1)

    qs = all_queries()
    qs["flagship_top_customers"].fn(spark, DST).count()  # warm
    jvm_gc = spark.sparkContext._jvm.System.gc
    # transform-shaped queries are timed through the noop sink: .count()
    # would let Catalyst prune their wide output projection entirely
    # (same set + reasoning as bench.py's FULL_WIDTH)
    full_width = {"boilerplate_strip"}
    timings = {}
    cold = {}
    for name in PROBE:
        best = float("inf")
        for run in range(2):
            jvm_gc()
            t0 = time.perf_counter()
            df = qs[name].fn(spark, DST)
            if name in full_width:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            took = time.perf_counter() - t0
            if run == 0:
                # Round-8 methodology fix: session-staged tables
                # (ops/staging.py) build during run 1, so a min-of-two
                # silently HID staging cost (er_match_scores' x100
                # blocking build -- 404 s -- reported as 17.9 s in the
                # r7 artifact).  The warm number stays `queries` (the
                # steady-state per-query cost); `queries_cold` is the
                # first run including any staging it triggered.
                cold[name] = round(took, 3)
            best = min(best, took)
        timings[name] = round(best, 3)
    out = {
        "metric": "scale_probe_total_sec",
        "n_replicas": N,
        "build_sec": build_s,
        "value": round(sum(timings.values()), 3),
        "queries": timings,
        "queries_cold": cold,
    }
    # SSJoin candidate funnel (round-6 verdict item 4): counted at the
    # replica scale whenever the kernel is probed, so sub-quadratic
    # candidate growth is measured, not argued
    if "prefix_filter_jaccard_join" in PROBE:
        from wsu_cpts_415_spark.queries.ssjoin import ssjoin_candidate_funnel

        out["ssjoin_funnel"] = ssjoin_candidate_funnel(spark, DST)
    # ER blocking funnel (round-8): the blocking keys (lang,
    # length-block, first-token) have BOUNDED cardinality, so replica
    # growth packs more docs into the same blocks and block-pairs grow
    # ~quadratically in N -- measure it so blocking saturation is a
    # number, not a surprise (SCALE.md lesson #7)
    if "er_match_scores" in PROBE:
        from wsu_cpts_415_spark.queries.semdedup import lev_candidates

        cand = lev_candidates(spark, DST)
        blocks = cand.groupBy("lang", "blk").count()
        stats = blocks.agg(
            F.count("*").alias("n_blocks"),
            F.max("count").alias("max_block_pairs"),
        ).collect()[0]
        out["er_blocking_funnel"] = {
            "candidate_pairs": cand.count(),
            "nonempty_blocks": stats["n_blocks"],
            "max_block_pairs": stats["max_block_pairs"],
        }
    # Multi-pass ER funnel (round-10): candidate volume of the deployed
    # union vs each generator's own bounded funnel -- the union must be
    # <= the sum of the three (it is a distinct), so reading these four
    # numbers side by side proves the composed query imports no
    # complexity class beyond its parts
    if "er_multipass_match_scores" in PROBE:
        from wsu_cpts_415_spark.queries.er_scoring import (
            _multipass_candidates,
        )
        from wsu_cpts_415_spark.queries.semdedup import lev_candidates
        from wsu_cpts_415_spark.queries.similarity import (
            lsh_band_candidates,
        )

        out["er_multipass_funnel"] = {
            "lev_pairs": lev_candidates(spark, DST).count(),
            "lsh_pairs": lsh_band_candidates(spark, DST).count(),
            "union_pairs": _multipass_candidates(spark, DST).count(),
        }
    # SNM window sweep (round-10 verdict item 5): does the SNM pass earn
    # its seat in the multi-pass union?  For each window size, measure
    # the pass's own recall, its candidate bill ((w-1)*n - boundary, the
    # linear dial), and the MARGINAL recall it adds over lev+LSH -- the
    # number that decides whether a production run pays for the pass.
    if "er_multipass_recall" in PROBE:
        from wsu_cpts_415_spark.queries.er_scoring import snm_window_pairs
        from wsu_cpts_415_spark.queries.semdedup import lev_candidates
        from wsu_cpts_415_spark.queries.similarity import (
            lsh_band_candidates,
        )
        from wsu_cpts_415_spark.queries.ssjoin import ssjoin_pairs_above

        truep = (
            ssjoin_pairs_above(spark, DST, 4, 5)
            .select("doc_a", "doc_b")
            .persist()
        )
        n_true = truep.count()

        def covered(cand) -> int:
            return truep.join(
                cand.dropDuplicates(["doc_a", "doc_b"]),
                ["doc_a", "doc_b"],
            ).count()

        lev = lev_candidates(spark, DST).select("doc_a", "doc_b")
        lsh = lsh_band_candidates(spark, DST).select("doc_a", "doc_b")
        base = lev.unionByName(lsh).dropDuplicates(["doc_a", "doc_b"])
        n_base = covered(base)
        sweep = {
            "n_true_pairs": n_true,
            "lev_lsh_covered": n_base,
            "lev_lsh_recall": round(n_base / n_true, 6) if n_true else None,
            "windows": [],
        }
        for w in (5, 10, 20):
            snm = snm_window_pairs(spark, DST, w)
            n_snm_cand = snm.count()
            n_snm_cov = covered(snm)
            n_union = covered(base.unionByName(snm))
            sweep["windows"].append(
                {
                    "w": w,
                    "snm_candidates": n_snm_cand,
                    "snm_covered": n_snm_cov,
                    "snm_recall": (
                        round(n_snm_cov / n_true, 6) if n_true else None
                    ),
                    "marginal_over_lev_lsh": n_union - n_base,
                }
            )
        truep.unpersist()
        out["er_snm_sweep"] = sweep
    print(json.dumps(out))


if __name__ == "__main__":
    main()
