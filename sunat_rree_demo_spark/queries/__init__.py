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
from sunat_rree_demo_spark.queries import tpch  # noqa: E402,F401
from sunat_rree_demo_spark.queries import clustering  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-snapshot rotation: the harness's CORRECTNESS snapshot records only
# the FIRST 50 registry entries in iteration order (see BASELINE.md "Driver
# correctness snapshot cap").  Round-5 goal (per the r4 verdict): the 42
# queries that have never appeared in a driver snapshot (q69-q93 and
# q103-q125 minus the already-covered evens/odds — the exact set is the
# union-complement of CORRECTNESS_r01-r04) occupy the window, with the
# remaining slots taken by round-5 additions.  Everything else — all
# driver-green at least once across r01-r04 and continuously covered by the
# identical local exact-hash gate (scripts/check_parity.py) — rotates to the
# tail.  Registration itself is unchanged; this only re-orders the dict.
# ---------------------------------------------------------------------------
_R5_WINDOW = (
    # the 42 never-driver-checked queries, in numeric order
    "q69_ann_recall", "q70_stratified_sample", "q71_verified_near_dups",
    "q72_repetition_signals", "q73_length_percentiles",
    "q74_unigram_surprisal", "q75_semantic_dedup",
    "q76_regional_market_share", "q77_event_funnel",
    "q78_click_attribution", "q79_small_qty_revenue",
    "q80_importance_weights", "q81_scd2_intervals",
    "q82_near_dup_triangles", "q83_winsorized_stats",
    "q84_priority_sample", "q85_transition_matrix",
    "q86_retention_cohorts", "q87_gap_fill", "q88_rank_distribution",
    "q89_salted_skew_agg", "q90_grouping_sets", "q91_kmv_distinct",
    "q92_fuzzy_name_pairs", "q93_dormant_high_value",
    "q103_snapshot_diff", "q104_trade_pagerank", "q105_incremental_agg",
    "q107_zorder_stats", "q113_click_attribution_outer",
    "q114_token_entropy", "q115_copurchase_pairs", "q116_dq_report",
    "q117_chi2_independence", "q118_shipping_priority",
    "q119_returned_item_losses", "q120_large_volume_customers",
    "q121_cheapest_supplier", "q122_bottleneck_suppliers",
    "q123_supplier_diversity", "q124_source_mixture", "q125_cohort_ltv",
    # round-5 additions (first driver check) fill the remaining 8 slots
    "q143_rolling_chunk_dups", "q144_containment_pairs",
    "q145_zipf_slope", "q146_cross_source_dup_matrix",
    "q147_seq_length_histogram", "q148_pq_adc_topk",
    "q149_simhash_pairs", "q150_novelty_contribution",
)
_head = {n: REGISTRY[n] for n in _R5_WINDOW}
_tail = {n: q for n, q in REGISTRY.items() if n not in _head}
REGISTRY.clear()
REGISTRY.update(_head)
REGISTRY.update(_tail)
