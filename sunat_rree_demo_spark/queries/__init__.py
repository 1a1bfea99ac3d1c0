"""Named query registry checked against the DuckDB oracle.

Each module registers queries into ``REGISTRY`` at import time; importing
this package loads the full inventory. ``__spark_entry__`` exposes it to
the driver harness.
"""

from sunat_rree_demo_spark.queries.base import REGISTRY, Query, register  # noqa: F401

# populate the registry (order = SURVEY.md §7.2 build order)
from sunat_rree_demo_spark.queries import core  # noqa: E402,F401
from sunat_rree_demo_spark.queries import rollups  # noqa: E402,F401
from sunat_rree_demo_spark.queries import windows  # noqa: E402,F401
from sunat_rree_demo_spark.queries import events  # noqa: E402,F401
from sunat_rree_demo_spark.queries import text  # noqa: E402,F401
from sunat_rree_demo_spark.queries import dedup  # noqa: E402,F401
from sunat_rree_demo_spark.queries import similarity  # noqa: E402,F401
from sunat_rree_demo_spark.queries import scale_variants  # noqa: E402,F401
from sunat_rree_demo_spark.queries import stats  # noqa: E402,F401
from sunat_rree_demo_spark.queries import temporal  # noqa: E402,F401
from sunat_rree_demo_spark.queries import arrays  # noqa: E402,F401
from sunat_rree_demo_spark.queries import llm_pipeline  # noqa: E402,F401
from sunat_rree_demo_spark.queries import quality  # noqa: E402,F401
from sunat_rree_demo_spark.queries import marts  # noqa: E402,F401
from sunat_rree_demo_spark.queries import corpus  # noqa: E402,F401
from sunat_rree_demo_spark.queries import econ  # noqa: E402,F401
from sunat_rree_demo_spark.queries import audit  # noqa: E402,F401
from sunat_rree_demo_spark.queries import graph  # noqa: E402,F401
from sunat_rree_demo_spark.queries import incremental  # noqa: E402,F401
from sunat_rree_demo_spark.queries import layout  # noqa: E402,F401
from sunat_rree_demo_spark.queries import mining  # noqa: E402,F401
from sunat_rree_demo_spark.queries import dq  # noqa: E402,F401
from sunat_rree_demo_spark.queries import tokenizer  # noqa: E402,F401
from sunat_rree_demo_spark.queries import retrieval  # noqa: E402,F401
from sunat_rree_demo_spark.queries import sketches  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-snapshot rotation: the harness's CORRECTNESS snapshot records only
# the FIRST 50 registry entries in iteration order (r01/r02 each held exactly
# the first 50 — see BASELINE.md "Driver correctness snapshot cap"). q50-q53
# and q55-q60 registered past position 50 and have never been driver-checked,
# so re-order iteration to pull them inside the window; ten doubly-verified
# (r01 AND r02 driver-green, plus the identical local exact-hash gate) simple
# relational queries rotate to the tail. Registration itself is unchanged —
# this only re-orders the dict.
# ---------------------------------------------------------------------------
_ROTATE_TO_TAIL = (
    # round 4: the r3 tail (q02-q17, q22, q29 — driver-green r01+r02)
    # rotates BACK inside the window so every registered query has a
    # driver-verified round across r01-r04; these TRIPLY-driver-green
    # (r01+r02+r03) queries take the tail. Full schedule: BASELINE.md
    # "Driver correctness snapshot cap".
    "q18_quarterly_rollup", "q19_annual_performance", "q20_region_revenue",
    "q21_seasonality_matrix", "q23_ytd_vs_prior", "q24_kpi_monthly",
    "q25_kpi_prod_monthly", "q26_rolling_trend", "q27_sigma_outliers",
    "q28_ranked_in_group", "q30_tumbling_hourly", "q31_sliding_windows",
    "q32_sessionization", "q33_event_dedup", "q34_json_extract",
    "q35_token_stats", "q36_quality_score", "q37_lang_id",
    "q38_fingerprint",
    # with q70/q71 added the head would hold 51/52: more triply-green
    # queries move out so the new ones stay inside the window
    "q47_rollup_subtotals", "q48_trade_roundtrip",
    # round 4 (this session): q72-q77 enter the window; six more
    # doubly-green (r02+r03) dedup/similarity queries take the tail
    "q39_exact_dedup", "q42_simhash", "q43_cosine_topk",
    "q40_ngram_jaccard_pairs", "q41_minhash_lsh_pairs",
    "q44_embedding_near_dup",
    # q78-q80 enter; three more doubly-green (r02+r03) stats queries
    # leave
    "q49_correlation", "q50_robust_outliers", "q51_tfidf_top_terms",
    # q81-q91 enter; eleven r03-driver-green queries leave
    "q52_json_map_explode", "q53_cube", "q55_calendar_yoy",
    "q56_asof_join", "q57_range_join", "q58_embedding_norms",
    "q59_quality_ranked_docs", "q60_range_frame_window",
    "q66_pack_sequences", "q67_label_centroids", "q64_redact_scrub",
    # q92-q95 enter; four more r03-green queries leave
    "q63_decontaminate", "q62_hash_split", "q61_dup_clusters",
    "q65_cluster_representatives",
    # q96-q103 enter: the last r03-green head members leave (q01, q68,
    # and the rows-only q45/q46/q54), plus three of this round's own
    # additions with the strongest independent pytest coverage
    # (q69 recall tests, q70 partitioning-invariance, q71 golden dedup
    # tier) defer their first driver check to r5 — the 50-slot window
    # can't hold all 35 round-4 additions at once
    "q01_annual_balance", "q68_dup_clusters_two_phase",
    "q45_ann_lsh_topk", "q46_approx_distinct", "q54_ann_ivf_topk",
    "q69_ann_recall", "q70_stratified_sample", "q71_verified_near_dups",
    # q104-q108 enter: five more of this round's additions with strong
    # independent pytest coverage (q72 golden degenerate docs, q73
    # approx-bound, q74 ranking, q75 trained-path recompute, q82
    # transitivity guard) defer their first driver check to r5
    "q72_repetition_signals", "q73_length_percentiles",
    "q74_unigram_surprisal", "q75_semantic_dedup",
    "q82_near_dup_triangles",
    # q109-q111 enter; three mart queries (q76-q78, plain SQL-twin
    # shapes the local gate mirrors exactly) defer to r5
    "q76_regional_market_share", "q77_event_funnel",
    "q78_click_attribution",
    # q112 enters; one more SQL-twin mart query defers to r5
    "q79_small_qty_revenue",
    # q113 enters; one more SQL-twin query defers to r5
    "q80_importance_weights",
    # q114-q117 enter; four more r4-local-green SQL-twin queries defer
    "q81_scd2_intervals", "q83_winsorized_stats", "q84_priority_sample",
    "q85_transition_matrix",
    # q118-q120 enter; three more defer
    "q86_retention_cohorts", "q87_gap_fill", "q88_rank_distribution",
    # q121-q123 enter; three more defer
    "q89_salted_skew_agg", "q90_grouping_sets", "q91_kmv_distinct",
    # q124 enters; one more defers
    "q92_fuzzy_name_pairs",
    # q125 enters; one more defers
    "q93_dormant_high_value",
    # q126/q128/q129/q130 (late round-4 session: BPE merges, retrieval
    # eval, inverted index, hard negatives) enter; four SQL-twin shapes
    # whose local gate mirrors the driver exactly defer to r5
    "q103_snapshot_diff", "q105_incremental_agg", "q107_zorder_stats",
    "q114_token_entropy", "q104_trade_pagerank", "q115_copurchase_pairs",
    # q132/q133 (bigram surprisal, vocab coverage) enter; two more
    # session-3 SQL-twin shapes defer to r5
    "q116_dq_report", "q117_chi2_independence",
    # q134-q136 (PQ encode, count-min sketch, event paths) enter; three
    # more session-3 SQL-twin marts defer to r5
    "q118_shipping_priority", "q119_returned_item_losses",
    "q120_large_volume_customers",
    # q137/q138 (BPE apply, n-gram novelty) enter; two more defer
    "q121_cheapest_supplier", "q122_bottleneck_suppliers",
    # q139/q140 (share-of-parent, PSI drift) enter; two more defer
    "q123_supplier_diversity", "q124_source_mixture",
    # q141 (multi-touch attribution) enters; one more defers
    "q125_cohort_ltv",
    # q142 (customer set ops) enters; one more defers
    "q113_click_attribution_outer",
)
_head = {n: q for n, q in REGISTRY.items() if n not in _ROTATE_TO_TAIL}
_tail = {n: REGISTRY[n] for n in _ROTATE_TO_TAIL}
REGISTRY.clear()
REGISTRY.update(_head)
REGISTRY.update(_tail)
