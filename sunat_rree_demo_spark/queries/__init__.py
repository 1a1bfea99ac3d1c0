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
# correctness snapshot cap").  The union of CORRECTNESS_r01-r07 covers every
# query registered through q208 (207 ever green; q46 rows-only by design), so
# the round-8 window is new r8 queries (first driver check — highest
# priority) followed by the longest-unchecked driver-green queries: the 8
# whose last row is r03 (displaced when the r7 window filled), then r04-era
# queries.  48 filler candidates compete for the slots the 27 r8
# additions leave (23), so r04-era queries with simple single-stage
# relational plans unchanged since r04 (q02-q07, q10-q13, and the
# fillers past the [:50] cap) defer to r9; displaced fillers stay
# driver-green via their historical
# rows and the identical local exact-hash gate (scripts/check_parity.py),
# which runs all 200+ queries every round.
# Registration itself is unchanged; this only re-orders the dict.
# tests/test_driver_window.py asserts every registered query has either a
# historical CORRECTNESS row or a slot in the current window.
# ---------------------------------------------------------------------------
# round-8 additions (first driver check) — append here when registering
_R8_NEW = (
    "q209_jpeg_color_stats",
    "q210_adam7_png_stats",
    "q211_progressive_jpeg_stats",
    "q212_gif_pixel_stats",
    "q213_bmp_rle_stats",
    "q214_g711_frame_energy",
    "q215_exact_substring_spans",
    "q216_flac_frame_energy",
    "q217_tiff_pixel_stats",
    "q218_exact_substring_rewrite",
    "q219_vad_segments",
    "q220_image_dhash_census",
    "q221_dhash_hamming_pairs",
    "q222_decimated_frame_energy",
    "q223_audio_fingerprint",
    "q224_exif_orientation",
    "q225_media_type_census",
    "q226_video_frame_stats",
    "q227_video_shot_cuts",
    "q228_stereo_flac_energy",
    "q229_tiff_lzw_stats",
    "q230_media_dedup_funnel",
    "q231_audio_dedup_funnel",
    "q232_oriented_dims",
    "q233_bmp_bitfields_stats",
    "q234_jpeg_restart_stats",
    "q235_video_dedup_funnel",
)
# longest-unchecked driver-green queries: last row r03 first, then r04
_R8_FILLERS = (
    "q58_embedding_norms", "q59_quality_ranked_docs",
    "q60_range_frame_window", "q62_hash_split",
    "q63_decontaminate", "q64_redact_scrub",
    "q66_pack_sequences", "q67_label_centroids",
    "q08_topn_categories", "q09_top_abs",
    "q14_coverage_ratio", "q15_bool_count_surplus",
    "q16_string_funcs", "q17_date_funcs",
    "q22_monthly_profile", "q29_tail_window",
    "q94_rolling_active_users", "q95_native_unpivot",
    "q96_chunk_dedup", "q97_prefix_filter_pairs",
    "q98_bm25_topk", "q99_rca_matrix",
    "q100_hhi_concentration", "q101_cusum_drift",
    "q102_benford_digits", "q106_rolling_correlation",
    "q108_pmi_collocations", "q109_weighted_median",
    "q110_kmv_set_ops", "q111_linear_interpolation",
    "q112_embedding_covariance", "q126_bpe_merges",
    "q127_chunk_dedup_rewrite", "q128_retrieval_eval",
    "q129_inverted_index", "q130_hard_negatives",
    "q131_pareto_frontier", "q132_bigram_surprisal",
    "q133_vocab_coverage", "q134_pq_encode",
    "q135_count_min_sketch", "q136_top_event_paths",
    "q137_bpe_apply", "q138_ngram_novelty",
    "q139_share_of_parent", "q140_psi_drift",
    "q141_multi_touch_attribution", "q142_customer_set_ops",
)
_R8_WINDOW = tuple(
    n for n in (_R8_NEW + _R8_FILLERS) if n in REGISTRY
)[:50]
_head = {n: REGISTRY[n] for n in _R8_WINDOW}
_tail = {n: q for n, q in REGISTRY.items() if n not in _head}
REGISTRY.clear()
REGISTRY.update(_head)
REGISTRY.update(_tail)
