"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``sunat_rree_demo_spark``; this module is a thin
adapter over its query registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (annual trade balance analog) on sf0.001."""
    from sunat_rree_demo_spark.queries import REGISTRY
    from sunat_rree_demo_spark.session import tune

    tune(spark)
    return REGISTRY["q01_annual_balance"].fn(spark, DEFAULT_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from sunat_rree_demo_spark.queries import REGISTRY
    from sunat_rree_demo_spark.session import tune

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            return fn(spark, sf_dir)
        return run

    return {name: wrap(q.fn) for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted → rows-only check)."""
    from sunat_rree_demo_spark.queries import REGISTRY

    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
