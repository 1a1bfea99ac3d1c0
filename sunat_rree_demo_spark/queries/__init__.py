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
    "q02_filter_range_membership", "q05_month_name_map", "q09_top_abs",
    "q10_anti_join", "q11_union_distinct", "q13_argmax_month",
    "q16_string_funcs", "q17_date_funcs", "q22_monthly_profile",
    "q29_tail_window",
    # round 3: more doubly-driver-verified (r01+r02 green) simple
    # queries rotate out so q61-q68 land inside the 50-entry window
    "q03_conditional_pivot_agg", "q04_pivot_table", "q06_scalar_stats",
    "q07_count_distinct", "q08_topn_categories", "q12_having_max_case",
    "q14_coverage_ratio", "q15_bool_count_surplus",
)
_head = {n: q for n, q in REGISTRY.items() if n not in _ROTATE_TO_TAIL}
_tail = {n: REGISTRY[n] for n in _ROTATE_TO_TAIL}
REGISTRY.clear()
REGISTRY.update(_head)
REGISTRY.update(_tail)
