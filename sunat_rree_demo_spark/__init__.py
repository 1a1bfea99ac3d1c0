"""sunat_rree_demo_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference pipeline ``bregydoc/sunat_rree_demo`` (pandas + DuckDB ETL/KPI/
insights over trade data), re-expressed Spark-first: DataFrame/Spark-SQL
logical plans optimized by Catalyst, plus LLM-data-pipeline operators
(dedup, similarity search, text analysis, streaming event windows) designed
for 100 TB scale.

Layout
------
- ``session``    SparkSession factory + runtime tuning knobs
- ``sources``    table catalog / parquet scans / sinks / Excel ingestion adapter
- ``functions``  scalar function library (month maps, safe division, formatting)
- ``operators``  the operator inventory from SURVEY.md §2 (relational, window,
                 analytic, dedup, similarity, text, multimodal)
- ``plans``      composed jobs: KPI materialization, SQL view layer, QA
                 invariants, insights, EDA
- ``streaming``  Structured Streaming variants over the events stream
- ``queries``    the named query registry checked against the DuckDB oracle
"""

__version__ = "0.1.0"

from sunat_rree_demo_spark.session import get_spark, tune  # noqa: F401
