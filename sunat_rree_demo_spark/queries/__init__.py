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

# ---------------------------------------------------------------------------
# Driver-snapshot rotation: the harness's CORRECTNESS snapshot records only
# the FIRST 50 registry entries in iteration order (see BASELINE.md "Driver
# correctness snapshot cap").  Round-6 goal (per the r5 verdict): the 33
# round-5 tail additions (q151-q183) that froze out of the r5 window, plus
# q45/q54 (gained real SQL oracles in r4 but whose last driver rows are
# r03-era ``no_oracle``) and q46 (re-enter for a current rows-only row),
# occupy the head.  New round-6 queries are appended to ``_R6_NEW`` as they
# are registered and displace the lowest-priority fillers automatically.
# Fillers are the longest-unchecked driver-green queries (last seen r03),
# weighted toward the ones whose physical plans changed in r5 (q40/q41/q61/
# q65/q68 dedup-family).  Everything else — driver-green at least once and
# continuously covered by the identical local exact-hash gate
# (scripts/check_parity.py) — rotates to the tail.  Registration itself is
# unchanged; this only re-orders the dict.  tests/test_driver_window.py
# asserts every registered query has either a historical CORRECTNESS row or
# a slot in the current window.
# ---------------------------------------------------------------------------
_R6_FIXED = (
    # the 33 never-driver-checked round-5 tail queries, in numeric order
    "q151_minhash_containment", "q152_slow_ship_priority",
    "q153_promo_revenue_share", "q154_local_supplier_volume",
    "q155_nation_market_share", "q156_surprisal_yield_curve",
    "q157_pricing_summary", "q158_forecast_revenue",
    "q159_volume_shipping", "q160_product_type_profit",
    "q161_late_line_priority", "q162_customer_order_distribution",
    "q163_top_supplier", "q164_disjunctive_revenue",
    "q165_dominant_part_suppliers", "q166_brand_value_share",
    "q167_kmeans_census", "q168_cluster_balanced_sample",
    "q169_concurrent_sessions", "q170_cluster_safe_split",
    "q171_vocab_kl_divergence", "q172_ivf_kmeans_topk",
    "q173_cluster_label_purity", "q174_maxmatch_pieces",
    "q175_session_error_overlap", "q176_trigram_lang_id",
    "q177_copurchase_communities", "q178_sq8_quantization_error",
    "q179_hybrid_rrf_fusion", "q180_mmr_rerank",
    "q181_winnowing_fingerprints", "q182_sorted_neighborhood_pairs",
    "q183_local_clustering_coeff",
    # stale-oracle re-entries: driver last saw these as r03 ``no_oracle``;
    # q45/q54 gained full SQL oracles in r4, q46 stays rows-only (HLL).
    "q45_ann_lsh_topk", "q54_ann_ivf_topk", "q46_approx_distinct",
)
# round-6 additions (first driver check) — append here when registering
_R6_NEW = (
    "q184_multipass_blocking_pairs", "q185_index_join_candidates",
    "q186_png_pixel_stats", "q187_bucketed_minhash_join",
    "q188_tokens_per_dollar", "q189_quantile_sketch_merge",
    "q190_suffix_array_lcp_dups", "q191_skyline_suppliers",
    "q192_segmented_regression", "q193_recursive_bom",
    "q194_window_dedup_rank", "q195_bitmap_index_intersect",
    "q196_bloom_filter_join", "q197_personalized_pagerank",
)
# longest-unchecked driver-green queries (last seen r03), plan-changed first
_R6_FILLERS = (
    "q68_dup_clusters_two_phase", "q40_ngram_jaccard_pairs",
    "q41_minhash_lsh_pairs", "q61_dup_clusters",
    "q65_cluster_representatives", "q01_annual_balance",
    "q18_quarterly_rollup", "q24_kpi_monthly", "q30_tumbling_hourly",
    "q34_json_extract", "q39_exact_dedup", "q43_cosine_topk",
    "q56_asof_join", "q66_pack_sequences",
)
_R6_WINDOW = tuple(
    n for n in (_R6_FIXED + _R6_NEW + _R6_FILLERS) if n in REGISTRY
)[:50]
_head = {n: REGISTRY[n] for n in _R6_WINDOW}
_tail = {n: q for n, q in REGISTRY.items() if n not in _head}
REGISTRY.clear()
REGISTRY.update(_head)
REGISTRY.update(_tail)
