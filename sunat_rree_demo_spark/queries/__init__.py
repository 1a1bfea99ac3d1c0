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
