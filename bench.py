#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is forced end-to-end with a `noop` sink write — full computation,
zero driver-side collection cost, so the number measures the engine, not
py4j transfer.

Each query runs ``SPARK_GRAFT_BENCH_ITERS`` times (default 3) and the
reported number is the per-query MEDIAN — one slow iteration under machine
load no longer poisons the committed artifact (the r04 lesson: a single
noisy run recorded 18.85s against three controlled runs of 16.4/16.5/18.3).

A fixed-size CALIBRATION PROBE (constant work, independent of SF and of
the engine's own code) runs first and last; its timings ride along in the
JSON as ``probe_first_sec`` / ``probe_last_sec`` / ``probe_sec``.  Machine
load inflates the probe and the queries together, so a run's numbers can
be normalized by ``probe_sec / PROBE_REF_SEC`` (the unloaded-machine
reference pinned in BASELINE.md) to separate load noise from genuine plan
regressions — the round-6 lesson: a 1.51× shared-subset inflation was
unattributable because the committed artifact carried no load signal.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from satellite_data_ingestion_spark import registry
from satellite_data_ingestion_spark.session import get_spark

# ---------------------------------------------------------------------------
# TIERED BENCH (VERDICT r12 task 2).  The flat headline list grew ~70
# queries/round and its full-precision loop (~223 s at 234 queries) was
# within two rounds of the 900 s load-scaled budget — whose overflow mode
# (single cold runs, "degraded") manufactured phantom regressions in r10.
# Three tiers instead:
#
#   NEW_THIS_ROUND — operators added or materially re-planned THIS round.
#     No accumulated signal; always run (the judge flags un-benched
#     additions, and a degenerate-cost op's first bench is where it's
#     caught).  Rolls into ROTATION (or CORE if heavy) next round.
#   CORE — the fixed regression core, benched EVERY round: the
#     long-tracked legacy set (BASELINE.md rows since rounds 5-9, the
#     richest round-over-round history) plus the historically expensive
#     cost classes (index-maintenance lifecycles, iterative graph ops,
#     dedup-family, streaming drains).  ~60 queries — the stable
#     shared subset for round-over-round comparison.
#   ROTATION — everything else, split into {K} deterministic tranches by
#     md5(name) % K (stable under list growth, unlike index slicing);
#     each round runs ONE tranche, so full coverage recurs every K
#     rounds.  The tranche index is (max round number in BENCH_r*.json
#     + 2) % K (phase-anchored to round 13 = tranche 2) — self-advancing
#     per round, stable within a round even
#     when a round writes multiple artifacts — and can be forced with
#     SPARK_GRAFT_BENCH_TRANCHE or widened to the whole registry-backed
#     list with SPARK_GRAFT_BENCH_FULL=1.
# ---------------------------------------------------------------------------

ROTATION_TRANCHES = 3

NEW_THIS_ROUND = [
    # round-15: agg_xi_correlation was re-planned (both rank passes
    # dropped), ext_keyword_textrank's folds were made order-pinned, and
    # the unigram pair gained in-SQL training oracles (same Spark plan,
    # fresh signal to confirm no staging drift).
    "agg_xi_correlation",
    "ext_keyword_textrank",
    "ext_unigram_train",
    "ext_unigram_tokenize",
    # round-15 monitoring-battery wave (operators/monitoring.py)
    "agg_bartlett",
    "agg_mood_median",
    "agg_benford_test",
    "agg_anderson_darling",
    "agg_benjamini_hochberg",
    "agg_mann_kendall",
    "agg_cusum_drift",
    "agg_page_hinkley",
    "win_bollinger",
    "ext_bradley_terry",
    "stream_cusum_drift",
    "ext_elo_online",
    "agg_cochran_q",
    "agg_seasonal_mann_kendall",
    "agg_capability_index",
    "win_ewma_control",
    "agg_westgard_rules",
    # round-15 ordinal-association wave (operators/association.py)
    # round-15 regression-diagnostics wave (operators/regression.py)
    # round-15 embedding/tokenizer/graph wave
    # round-15 agreement & stratified-effect wave (operators/agreement.py)
    # round-15 wave F (graph links/centrality, wordpiece fertility,
    # DoReMi step, BY correction, inequality indices)
    # round-15 wave G (financial indicators + LLM curation)
    "win_stochastic_osc",
    "ext_softdedup_weights",
    "ext_perplexity_buckets",
    # round-15 wave H (ranking drift, outlier rounds, classifier eval)
    "agg_esd_outliers",
    "ext_rank_biased_overlap",
    "ext_auc_delong",
    "ext_platt_scaling",
    "stream_page_hinkley",
    "ext_classifier_mcc",
    # round-15 wave J (robust estimators, variance stability, LIS)
    "agg_hodges_lehmann",
    "agg_qn_scale",
    "ext_cusum_squares",
    "ext_lis_trend",
    # round-15 wave K (EDF trio completion + range-weighted Friedman)
    "agg_cvm_test",
    "agg_ad_2sample",
    "agg_quade_test",
    # round-15 wave L (spectrum, burstiness, ARCH, pass@k)
    "ext_embedding_effective_dim",
    "ext_term_burstiness",
    "ext_ts_arch_test",
    "ext_pass_at_k",
    # round-15 wave M (randomness screen + calibration test)
    "agg_turning_points",
    "ext_calibration_spiegelhalter",
    # round-15 wave N (label-free thresholds + demand curve)
    "ext_otsu_threshold",
    "ext_knee_point",
    "agg_price_elasticity",
    # round-15 wave O (third streaming drift twin + diversity spectrum)
    "stream_ewma_monitor",
    "ext_diversity_indices",
    # round-15 wave P (circular stats, forensic digits, Markov chains)
    "agg_rayleigh_test",
    "agg_benford_2digit",
    "ext_markov_transitions",
    # round-15 OPTIMIZATION pass: materially re-planned ops not already
    # in NEW/CORE (single-probe lnfact lookups, single-scan bounded
    # frames, BFS anti-join bound — see OPTIMIZATION_r15.md); their
    # first post-replan bench signal belongs in the always-run tier.
    # (mood_median/benford_test/platt/hodges_lehmann/qn_scale were also
    # re-planned but already sit in the wave entries above.)
    "agg_bayes_ab",
    "agg_fisher_exact",
    "ext_heavy_hitters",
    "graph_closeness",
    "agg_theil_u",
    "agg_somers_d",
    "agg_goodman_kruskal_gamma",
    "agg_jonckheere_terpstra",
    "ext_rouge_n",
    "ext_bleu",
    "agg_tukey_hsd",
]

CORE = [
    "scan_parquet",
    "agg_hash_group",
    "agg_grid_resample",
    "join_equi_inner",
    "join_broadcast",
    "join_asof",
    "win_rank",
    "q5_local_supplier_volume",
    "agg_grid_resample_nn",
    "stream_tumbling",
    "ext_dedup_exact",
    "ext_dedup_minhash",
    "ext_sim_cosine",
    "ext_text_stats",
    "pipeline_ingest",
    "pipeline_training_data",
    "ext_ngram_jaccard",
    "ext_dedup_cluster",
    "ext_dedup_embedding_cluster",
    "ext_sim_ivf",
    "ext_sim_lsh_indexed",
    "ext_sim_ivf_indexed",
    "ext_segment_dedup",
    "ext_zorder_layout",
    "sink_delta_table",
    "ext_sim_ivf_pq",
    "sink_delta_merge",
    "sink_delta_checkpoint",
    "ext_knn_join",
    "ext_knn_join_ivf",
    "source_delta_cdf",
    "pipeline_minhash_index_maintain",
    "pipeline_ivf_index_maintain",
    "ext_ngram_novelty",
    "stream_kmeans_score",
    "graph_hits",
    "graph_kcore",
    "ext_dedup_containment",
    "graph_pagerank",
    "graph_triangles",
    "pipeline_ivm",
    "stream_ivm",
    "sink_delta_dv",
    "ext_semdedup_prune",
    "join_fuzzy",
    "graph_bfs",
    "pipeline_corpus_curation",
    "ext_kmeans",
    "ext_item_cf",
    "graph_label_propagation",
    "agg_histogram_equidepth",
    "ext_dedup_cluster_incremental",
    "ext_dedup_embedding_cluster_incremental",
    "ext_trajectory_hausdorff",
    "ext_ts_dtw",
    "fn_recursive_cte",
    "stream_pattern_match",
    "stream_heavy_hitters",
    "sink_delta_merge_evolve",
    "graph_connected_components",
    "graph_mst",
]

ROTATION = [
    # rolled in from the round-15 session-3 NEW tier (budget retier)
    "agg_goodman_kruskal_gamma",
    "agg_somers_d",
    "agg_bowker_test",
    "agg_theil_u",
    "agg_jonckheere_terpstra",
    "agg_cuzick_trend",
    "agg_breusch_pagan",
    "agg_chow_test",
    "agg_cooks_distance",
    "ext_ts_variance_ratio",
    "ext_ts_engle_granger",
    "ext_embedding_whitening",
    "ext_embedding_isotropy",
    "ext_sim_hamming",
    "ext_wordpiece_tokenize",
    "graph_katz",
    "agg_kappa_weighted",
    "agg_lin_ccc",
    "agg_deming_regression",
    "agg_woolf_homogeneity",
    "agg_brunner_munzel",
    "agg_ansari_bradley",
    "graph_jaccard_links",
    "graph_closeness",
    "ext_wordpiece_fertility",
    "ext_domain_mixture_doremi",
    "agg_benjamini_yekutieli",
    "agg_inequality_indices",
    "win_atr",
    "win_macd",
    "ext_hybrid_rrf",
    "agg_ks_test",
    "agg_mann_whitney",
    "agg_spearman_corr",
    "ext_ts_acf",
    "ext_ts_ohlc",
    "ext_readability",
    "ext_zipf_fit",
    "ext_embedding_centroids",
    "ext_embedding_outliers",
    "ext_label_centroid_sim",
    "ext_embedding_pca",
    "agg_welch_t",
    "ext_l_diversity",
    "agg_mutual_information",
    "agg_lorenz_curve",
    "ext_kwic",
    "ext_collocation_g2",
    "agg_kaplan_meier",
    "win_rolling_corr",
    "scan_fixed_width",
    "ext_boilerplate_prefix",
    "ext_classifier_confusion",
    "fn_try_arith",
    "udtf_dynamic_schema",
    "ext_top_journeys",
    "ext_audience_overlap",
    "ext_kmeans_balanced_sample",
    "agg_dp_histogram",
    "ext_calibration_bins",
    "ext_brier_score",
    "fn_xml_extract",
    "agg_bitmap_flags",
    "join_lateral_topn",
    "agg_boxplot",
    "ext_ts_forecast_eval",
    "ext_rag_context_pack",
    "ext_hard_negatives",
    "ext_negative_sampling",
    "win_activity_streak",
    "ext_tokenizer_fertility",
    "ext_kmeans_ari",
    "agg_trend_ols",
    "ext_cluster_keywords",
    "win_time_weighted_avg",
    "win_gap_fill_locf",
    "agg_error_burn_rate",
    "agg_hll_sketch_rollup",
    "fn_pseudonymize",
    "win_skyline_2d",
    "ext_cluster_stratified_split",
    "scan_text_gzip",
    "pipeline_stats_maintain",
    "fn_aes_roundtrip",
    "ext_preference_pairs",
    "ext_feature_hashing",
    "win_peak_detection",
    "ext_vocab_coverage",
    "agg_mix_shift",
    "win_gap_fill_interp",
    "ext_cross_lingual_overlap",
    "ext_url_parse",
    "ext_url_blocklist",
    "ext_domain_volume_cap",
    "ext_url_dedup",
    "ext_bm25_search",
    "ext_mix_temperature",
    "ext_data_expectations",
    "ext_ts_seasonal",
    "ext_kmv_intersection",
    "ext_event_transitions",
    "ext_ts_changepoint",
    "ext_winsorize",
    "fn_point_in_polygon",
    "agg_ab_test",
    "fn_ip_parse",
    "ext_quality_threshold_sweep",
    "stream_expectations",
    "ext_kl_divergence",
    "ext_skew_report",
    "ext_pmi_cooccurrence",
    "ext_k_anonymity",
    "fn_user_agent_parse",
    "join_pit_features",
    "scan_parquet_metadata",
    "agg_benford",
    "stream_drift_monitor",
    "plan_mv_rewrite",
    "agg_unpivot",
    "win_gap_report",
    "graph_common_neighbors",
    "ext_instruction_format",
    "agg_corr_matrix",
    "graph_adamic_adar",
    "agg_weighted_median",
    "ext_stratified_split",
    "agg_share_of_parent",
    "ext_zscore_normalize",
    "agg_rfm_segments",
    "ext_weighted_sample",
    "agg_association_rules",
    "ext_multimodal_audio_features",
    "ext_multimodal_phash",
    "ext_multimodal_phash_near",
    "win_control_chart",
    "agg_pareto",
    "agg_chi2_independence",
    "ext_token_dispersion",
    "ext_column_profile",
    "ext_embedding_norms",
    "ext_dedup_inflation",
    "agg_new_vs_returning",
    "win_vwap",
    "ext_bigram_freq",
    "win_index_rebase",
    "agg_abc_analysis",
    "agg_cohort_ltv",
    "fn_business_day",
    "agg_histogram_log10",
    "ext_seasonality_strength",
    "graph_assortativity",
    "ext_compression_ratio",
    "ext_unigram_entropy",
    "win_ma_crossover",
    "win_interpurchase",
    "agg_runs_test",
    "agg_hhi",
    "agg_cramers_v",
    "win_fulfillment_latency",
    "ext_psi_split_drift",
    "win_bounce_rate",
    "fn_csv_render",
    "ext_type_token_ratio",
    "ext_js_divergence",
    "ext_hilbert_layout",
    "win_pattern_match",
    "win_runs",
    "ext_embedding_quantize",
    "sink_delta_row_tracking",
    "ext_heavy_hitters",
    "fn_geohash",
    "sink_delta_liquid",
    "ext_dedup_bloom_incremental",
    "ext_outlier_mad",
    "win_attribution",
    "agg_decay",
    "ext_ts_median_smooth",
    "udf_grouped_agg",
    "join_asof_nearest",
    "sink_delta_dv_partitioned",
    "scan_csv_corrupt",
    "agg_rolling_distinct",
    "ext_multimodal_resize",
    "ext_sim_filtered",
    "scan_jsonl_corrupt",
    "win_interval_coverage",
    "agg_ratio_ci",
    "agg_gini",
    "agg_entropy",
    "win_drawdown",
    "win_period_over_period",
    "fn_base64",
    "ext_vocab_topk",
    "sink_delta_bloom",
    "sink_delta_generated",
    "source_delta_diff",
    "sink_delta_scd2",
    "sink_delta_dv_purge",
    "ext_multimodal_bmp",
    "ext_multimodal_wav",
    "stream_join_outer",
    "sink_delta_clone",
    "sink_delta_restore",
    "sink_delta_vacuum",
    "sink_delta_fsck",
    "ext_decontaminate_longest_match",
    "ext_multimodal_vad",
    "ext_vocab_richness",
    "ext_ts_decompose",
    "agg_nelson_aalen",
    "graph_modularity",
    "ext_ts_periodogram",
    "ext_domain_reweight",
    "sink_delta_manifest",
    "agg_cuped",
    "join_cardinality_audit",
    "fn_luhn",
    "stream_sprt",
    "graph_personalized_pagerank",
    "agg_bootstrap_ci",
    "agg_mcnemar",
    "agg_sprt",
    "ext_ts_crosscorr",
    "ext_ts_holt",
    "join_interp_lookup",
    "agg_kruskal_wallis",
    "agg_theil_sen",
    "agg_kendall_tau",
    "agg_dp_mean",
    "ext_t_closeness",
    "ext_ngram_lm_train",
    "ext_ngram_lm_score",
    "ext_span_corruption",
    "ext_curriculum_order",
    "ext_reward_normalize",
    "ext_unigram_train",
    "ext_unigram_tokenize",
    "agg_anova_f",
    "agg_levene_bf",
    "agg_jarque_bera",
    "agg_odds_ratio",
    "agg_durbin_watson",
    "agg_cohens_kappa",
    "agg_fleiss_kappa",
    "agg_cronbach_alpha",
    "agg_friedman",
    "agg_logrank",
    "agg_standardized_rate",
    "win_rsi",
    "ext_ts_sax",
    "ext_bleu",
    "ext_rouge_l",
    "ext_keyword_rake",
    "graph_clustering_coeff",
    "ext_feature_info_gain",
    "ext_image_histogram",
    "agg_sample_size",
    "agg_hurst",
    "agg_did",
    "win_event_study",
    "agg_its_segmented",
    "agg_yuen_trimmed_t",
    "fn_normal_cdf",
    "agg_multiple_testing_bh",
    "agg_tost_equivalence",
    "ext_ts_holt_winters",
    "join_allen_relations",
    "agg_chi2_residuals",
    "agg_gains_curve",
    "agg_cochran_armitage",
    "agg_mantel_haenszel",
    "ext_ts_theta",
    "agg_rate_ratio",
    "agg_overdispersion",
    "agg_capture_recapture",
    # rolled in from round-14 NEW tier (r15 retier)
    "ext_quality_classifier",
    "graph_betweenness",
    "agg_effect_size",
    "agg_bayes_ab",
    "ext_rouge_n",
    "ext_tokenizer_fertility_frozen",
    "stream_quality_gate",
    "agg_anova_two_way",
    "agg_tukey_hsd",
    "agg_partial_corr",
    "agg_ols_multi",
    "agg_wilcoxon_signed_rank",
    "agg_fisher_exact",
    "ext_ts_kalman",
    "ext_ts_granger",
    "ext_best_of_n",
    "ext_isotonic_calibration",
    "ext_heaps_law",
    "agg_ks_normality",
    "agg_grubbs_test",
    "ext_ts_ar2",
    "agg_james_stein",
    "agg_beta_binomial_smooth",
    "pipeline_partition_reconcile",
    "ext_crossval_folds",
    "udf_arrow_batch",
    "ext_ndcg",
    "ext_mmr_rerank",
    "ext_ts_ljung_box",
    "agg_poisson_gof",
    "ext_matryoshka_recall",
    "ext_calibration_ece",
    "agg_simpson_scan",
    "ext_reward_length_bias",
    "agg_icc",
    "ext_ngram_kneser_ney",
    "agg_median_ci",
    "agg_hill_tail",
    "agg_bland_altman",
    "agg_mahalanobis_2d",
    "agg_pca_2x2",

]


# Unloaded-machine reference for the calibration probe (pinned in
# BASELINE.md): probe_sec / PROBE_REF_SEC ≈ how loaded the machine is.
PROBE_REF_SEC = 0.13


def _cleanup_query_state(spark) -> None:
    """Release executor blocks a finished query leaked (VERDICT r15 task 1).

    Many operators materialize bounded intermediates with
    ``localCheckpoint(eager=True)`` inside the query path.  Those blocks
    are only freed when the JVM GCs the RDD object and the ContextCleaner
    drains its reference queue — in a 220-query session the backlog
    accumulated until UNTOUCHED sub-second queries sporadically inflated
    2–15× (agg_anova_two_way 0.33→7.0 s in the r15 driver run).  Explicitly
    unpersisting every still-persisted RDD after each query is
    deterministic and costs ~10 ms; between queries nothing legitimate is
    persisted (base-table caching is banned), so this can only drop leaked
    checkpoint blocks.  A Python gc.collect() drops the py4j refs so the
    every-30-queries System.gc() can reap the JVM side too."""
    import gc

    try:
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            jrdd.unpersist(False)
    except Exception:  # pragma: no cover - private JVM surface
        pass
    gc.collect()


def _probe(spark) -> float:
    """Median-of-3 fixed workload: a 30M-row generated aggregate through
    the noop sink — no file I/O, no SF dependence, whole-stage codegen
    only, so its runtime moves with machine load and nothing else."""
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(30_000_000).selectExpr("sum(id % 7) AS s").write.format(
            "noop"
        ).mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return round(samples[1], 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="sdis-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    qs = registry.queries()

    # Warm the JVM once (task scheduler, codegen, noop sink) so the first
    # timed query measures the engine, not startup.
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    # --- tiered selection (see the tier comment above the lists) ---
    import glob
    import zlib

    repo = os.path.dirname(os.path.abspath(__file__))
    # Recorded bench rounds drive BOTH the rotation tranche and the sidecar
    # file name, so derive them up front.  Use the MAX round number present,
    # not the artifact COUNT: a round that writes two BENCH_r{N}.json files
    # (or skips a round) would otherwise silently shift the rotation and
    # skip a tranche (VERDICT r13 task 7).  max-round is stable under
    # re-runs within a round and under missing rounds.
    #
    # Prefer the COMMITTED artifact set over a directory glob (VERDICT r15
    # task 2): the driver writes BENCH_r{N}.json to the working tree BETWEEN
    # its main bench run and its low-core scaling run, so a glob advances
    # the rotation tranche mid-round and the two runs time DIFFERENT query
    # sets (r15: the 8-core run drew tranche 2 vs the main run's tranche 1,
    # leaving only the NEW+CORE overlap comparable).  The git index only
    # gains the new artifact at round close, so every bench run within a
    # round derives the same round number — and therefore the same tranche —
    # from it.  Falls back to the glob when git is unavailable (e.g. an
    # exported tree).
    def _recorded_rounds() -> list[int]:
        import subprocess

        names: list[str] = []
        try:
            out = subprocess.run(
                ["git", "-C", repo, "ls-files", "BENCH_r*.json"],
                capture_output=True,
                text=True,
                timeout=10,
            )
            if out.returncode == 0:
                names = out.stdout.split()
        except Exception:
            names = []
        if not names:
            names = glob.glob(os.path.join(repo, "BENCH_r*.json"))
        return [
            int(m.group(1))
            for p in names
            if (m := re.search(r"BENCH_r(\d+)\.json$", p))
        ]

    rounds = _recorded_rounds()
    if os.environ.get("SPARK_GRAFT_BENCH_TRANCHE"):
        tranche = int(os.environ["SPARK_GRAFT_BENCH_TRANCHE"]) % ROTATION_TRANCHES
    else:
        # +2 anchors continuity with the historical count-derived phase
        # (round 13 drew tranche 2, so round 14 must draw 0): the r07
        # artifact is missing, so max-round and artifact-count phases
        # differ by one.
        tranche = (max(rounds) + 2) % ROTATION_TRANCHES if rounds else 0
    if os.environ.get("SPARK_GRAFT_BENCH_FULL"):
        active = NEW_THIS_ROUND + CORE + ROTATION
    else:
        active = (
            NEW_THIS_ROUND
            + CORE
            + [
                n
                for n in ROTATION
                if zlib.crc32(n.encode()) % ROTATION_TRANCHES == tranche
            ]
        )
    # de-dup while preserving order (an op may sit in NEW and CORE)
    seen: set = set()
    active = [n for n in active if not (n in seen or seen.add(n))]
    if os.environ.get("SPARK_GRAFT_BENCH_ONLY"):
        # Explicit subset for profiling / smoke runs: comma-separated query
        # names, run in the given order, bypassing the tier plan.
        only = [s for s in os.environ["SPARK_GRAFT_BENCH_ONLY"].split(",") if s]
        unknown = [s for s in only if s not in qs]
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_BENCH_ONLY unknown queries: {unknown}")
        active = only
    print(
        f"[bench] tier plan: {len(NEW_THIS_ROUND)} new + {len(CORE)} core + "
        f"rotation tranche {tranche}/{ROTATION_TRANCHES} -> {len(active)} queries",
        file=sys.stderr,
    )

    probe_first = _probe(spark)
    print(f"[bench] calibration probe (pre): {probe_first}s", file=sys.stderr)

    iters = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3")))
    # Soft TIME BUDGET for the query loop (the 72-query suite takes
    # ~16 min of loop time at full precision on this container): once
    # exceeded, remaining queries run ONCE (no warm, single sample,
    # flagged in the JSON as "degraded") so the one-line artifact always
    # lands inside any reasonable external timeout — a killed run with
    # no JSON loses every query's signal; a degraded tail loses only
    # median robustness on the queries past the budget.
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "900"))
    # LOAD-SCALE the soft budget: under a loaded machine every query
    # inflates together with the probe, so a FIXED budget changes WHICH
    # queries get full medians (the r10 lesson: probe 0.202 = a
    # 1.55x-loaded machine cold-ran 11% of the suite and manufactured
    # phantom regressions on exactly the long-tracked legacy block).
    # Capped at 3x so a pathological probe cannot blow external timeouts.
    load = min(3.0, max(1.0, probe_first / PROBE_REF_SEC))
    budget *= load
    print(
        f"[bench] soft budget {budget:.0f}s (load factor {load:.2f} from "
        f"probe {probe_first}s vs ref {PROBE_REF_SEC}s)",
        file=sys.stderr,
    )
    loop_t0 = time.perf_counter()
    timings: dict[str, float] = {}
    degraded: list[str] = []
    errors: dict[str, str] = {}
    for qi, name in enumerate(active):
        if qi and qi % 30 == 0:
            # Session-hygiene checkpoint: a 140-query session accumulates
            # driver/JVM state (ContextCleaner backlog from checkpointed/
            # broadcast RDDs, finished-stage bookkeeping) that inflated
            # r11's END-of-session sub-second queries 2-4x vs their fresh
            # -session medians.  Draining the cleaner via an explicit GC
            # every 30 queries costs ~0.1 s and keeps the long-tracked
            # legacy tail comparable across rounds.
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        fn = qs[name]
        over_budget = time.perf_counter() - loop_t0 > budget
        try:
            if not over_budget:
                # Warm once: first-touch costs that are one-time per process
                # (ingest staging for *_indexed variants, schema/dim probes,
                # codegen) land here, NOT in the timed samples.
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples = []
            for _ in range(1 if over_budget else iters):
                # Time fn() + execution: several operators do their real work
                # EAGERLY inside fn (iterative connected components, streaming
                # micro-batch drains) — timing only the final noop write of a
                # pre-built frame would measure a checkpoint re-read, not the
                # operator (the round-6 lesson: ext_dedup_cluster "ran" in
                # 0.025s that way).
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
        except Exception as ex:  # noqa: BLE001
            # A single erroring query must not destroy the whole round's
            # perf artifact (found live: agg_bayes_ab's deliberate
            # grid-overflow guard at sf1 killed the entire sf1 bench run).
            # Record the failure, keep the artifact.
            errors[name] = repr(ex)[:300]
            print(f"[bench] {name} ERROR {ex!r}", file=sys.stderr)
            _cleanup_query_state(spark)
            continue
        samples.sort()
        timings[name] = round(samples[len(samples) // 2], 3)
        # Outside the timed region: drop the blocks this query's
        # localCheckpoints left behind before the next query runs.
        _cleanup_query_state(spark)
        if over_budget:
            degraded.append(name)
        # Progress to stderr (stdout carries ONLY the one JSON line): a
        # stuck or regressed query is identifiable mid-run.
        print(
            f"[bench] {name}: median {timings[name]}s "
            f"(samples {[round(s, 3) for s in samples]})"
            + (" [degraded: over budget, single cold run]" if over_budget else ""),
            file=sys.stderr,
            flush=True,
        )

    probe_last = _probe(spark)
    print(f"[bench] calibration probe (post): {probe_last}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    # The grading driver keeps only the LAST 2000 chars of stdout and parses
    # the final line as JSON.  A ~140-entry "queries" map blows past that
    # window, so BENCH_r10..r14 all recorded parsed:null with tails starting
    # mid-JSON.  Fix (VERDICT r14 task 1): stdout carries a COMPACT summary
    # line (always well under 2000 chars) and the full per-query map goes to
    # a sidecar the judge can open: tools/bench_r{N}_full.json.
    bench_round = os.environ.get("SPARK_GRAFT_BENCH_ROUND")
    if bench_round is None:
        # The bench for round N runs BEFORE BENCH_r{N}.json exists, so the
        # current round is max(recorded rounds) + 1.
        bench_round = str((max(rounds) + 1) if rounds else 1)
    full_payload = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "probe_first_sec": probe_first,
        "probe_last_sec": probe_last,
        "probe_sec": round((probe_first + probe_last) / 2, 3),
        "tier": {
            "new": len(NEW_THIS_ROUND),
            "core": len(CORE),
            "rotation_tranche": tranche,
            "rotation_tranches": ROTATION_TRANCHES,
            "rotation_total": len(ROTATION),
        },
        "degraded": degraded,
        "errors": errors,
    }
    # Scoped runs (SPARK_GRAFT_BENCH_ONLY) must not clobber the round's
    # full per-query sidecar — they write a _scoped variant instead.
    # Likewise a non-default-core scaling run gets its own sidecar (with
    # tranche derivation now stable within a round, the low-core run would
    # otherwise overwrite the main run's map); the compact line's
    # queries_sidecar field always names the file actually written.
    suffix = "_scoped" if os.environ.get("SPARK_GRAFT_BENCH_ONLY") else ""
    cpus_env = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if not suffix and cpus_env != "32":
        suffix = f"_c{cpus_env}"
    sidecar = os.path.join(
        repo, "tools", f"bench_r{bench_round}_full{suffix}.json"
    )
    try:
        os.makedirs(os.path.dirname(sidecar), exist_ok=True)
        with open(sidecar, "w") as fh:
            json.dump(full_payload, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"[bench] per-query map -> {sidecar}", file=sys.stderr)
    except OSError as ex:
        print(f"[bench] sidecar write failed: {ex!r}", file=sys.stderr)
    compact = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "n": len(timings),
        "sf": full_payload["sf"],
        "probe_first_sec": probe_first,
        "probe_last_sec": probe_last,
        "tier": full_payload["tier"],
        "degraded": degraded,
        "queries_sidecar": os.path.relpath(sidecar, repo),
    }
    if errors:
        compact["errors"] = {k: v[:80] for k, v in errors.items()}
    line = json.dumps(compact)
    if len(line) > 1900:
        # Never exceed the driver's tail window, whatever happens: drop the
        # variable-size fields before the summary numbers.
        compact.pop("errors", None)
        compact["degraded"] = len(degraded)
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    main()
