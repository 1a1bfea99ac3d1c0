"""Table catalog: parquet scans over the test warehouse + existence probes.

Reference counterparts (SURVEY.md §2.1): S9 SQL table scan
(``metrics.py:17-28``, ``app.py:38-49``), S10 table-existence probe
(``metrics_products.py:22-28``, ``app.py:29-35``), S12 result cache
(``app.py:23,58``).

Scale notes: scans stay declarative (``spark.read.parquet``) so Catalyst
pushes filters/projections into the parquet reader; at 100 TB the same
call reads a partitioned (``year=…``) directory tree and partition pruning
is automatic. Nothing here collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

#: Tables the driver's testdata provides (TESTDATA.md).
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one warehouse table.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; we read nanos as long
    (``spark.sql.legacy.parquet.nanosAsLong``) and convert to a proper
    timestamp (microsecond truncation — identical to what DuckDB's
    TIMESTAMP cast does, so the oracle agrees).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # integer division: (ts / 1000) in double loses ulps above
            # 2^53 ns and lands 1 µs off DuckDB's exact conversion
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view for the SQL entry point (S9)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def table_exists(spark: SparkSession, name: str) -> bool:
    """S10 table-existence probe: ``spark.catalog`` replaces the
    reference's try/except-around-COUNT(*) pattern
    (``metrics_products.py:22-28``)."""
    try:
        return spark.catalog.tableExists(name)
    except Exception:
        return False
