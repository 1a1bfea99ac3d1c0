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
from sunat_rree_demo_spark.queries import media  # noqa: E402,F401
from sunat_rree_demo_spark.queries import extraction  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-snapshot rotation: the harness's CORRECTNESS snapshot records only
# the FIRST 50 registry entries in iteration order (see BASELINE.md "Driver
# correctness snapshot cap").  The union of CORRECTNESS_r01-r08 covers every
# query registered through q235 (234 ever green; q46 rows-only by design).
# The round-9 window retires the rotation debt the r8 verdict flagged: new
# r9 queries first (first driver check — highest priority), then the 35
# queries whose newest driver row is still r04 (q02–q13 core relational and
# the q101–q142 stats/econ tail, deferred when the r8 window filled), then
# the oldest r05-era rows as far as the 50-slot cap allows.  Displaced
# fillers stay driver-green via their historical rows and the identical
# local exact-hash gate (scripts/check_parity.py), which runs all 230+
# queries every round.
# Registration itself is unchanged; this only re-orders the dict.
# tests/test_driver_window.py asserts every registered query has either a
# historical CORRECTNESS row or a slot in the current window.
# ---------------------------------------------------------------------------
# round-9 additions (first driver check) — append here when registering
_R9_NEW = (
    "q236_gif_animation_stats",
    "q237_media_curation_summary",
    "q238_gif_video_dedup",
    "q239_video_meta_census",
)
# longest-unchecked driver-green queries: the full r04 cohort (35), then
# the oldest r05 rows; the [:50] cap decides how many r05 slots survive
_R9_FILLERS = (
    "q02_filter_range_membership", "q03_conditional_pivot_agg",
    "q04_pivot_table", "q05_month_name_map",
    "q06_scalar_stats", "q07_count_distinct",
    "q10_anti_join", "q11_union_distinct",
    "q12_having_max_case", "q13_argmax_month",
    "q101_cusum_drift", "q102_benford_digits",
    "q106_rolling_correlation", "q108_pmi_collocations",
    "q109_weighted_median", "q110_kmv_set_ops",
    "q111_linear_interpolation", "q112_embedding_covariance",
    "q126_bpe_merges", "q127_chunk_dedup_rewrite",
    "q128_retrieval_eval", "q129_inverted_index",
    "q130_hard_negatives", "q131_pareto_frontier",
    "q132_bigram_surprisal", "q133_vocab_coverage",
    "q134_pq_encode", "q135_count_min_sketch",
    "q136_top_event_paths", "q137_bpe_apply",
    "q138_ngram_novelty", "q139_share_of_parent",
    "q140_psi_drift", "q141_multi_touch_attribution",
    "q142_customer_set_ops",
    # oldest r05-era rows (driver row last seen r05)
    "q69_ann_recall", "q70_stratified_sample",
    "q71_verified_near_dups", "q72_repetition_signals",
    "q73_length_percentiles", "q74_unigram_surprisal",
    "q75_semantic_dedup", "q76_regional_market_share",
    "q77_event_funnel", "q78_click_attribution",
    "q79_small_qty_revenue", "q80_importance_weights",
    "q81_scd2_intervals", "q82_near_dup_triangles",
    "q83_winsorized_stats",
)
_R9_WINDOW = tuple(
    n for n in (_R9_NEW + _R9_FILLERS) if n in REGISTRY
)[:50]
_head = {n: REGISTRY[n] for n in _R9_WINDOW}
_tail = {n: q for n, q in REGISTRY.items() if n not in _head}
REGISTRY.clear()
REGISTRY.update(_head)
REGISTRY.update(_tail)
