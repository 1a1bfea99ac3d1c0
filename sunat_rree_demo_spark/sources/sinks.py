"""Warehouse sinks (SURVEY.md §2.1 S7/S8) — partitioned parquet (the
plans layer default) plus bucketed managed tables for co-located joins.

Bucketing is the 100 TB lever the reference never needed: writing both
fact tables bucketed+sorted by the join key makes the recurring
fact-fact join (lineitem ⋈ orders here; facts ⋈ facts generally)
shuffle-free — the exchange disappears from the plan because both sides
are already hash-distributed identically. Verified by
tests/test_scale_contracts.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_by: str = "year",
                      mode: str = "overwrite") -> None:
    """S8 — partitioned parquet sink; readers get partition pruning."""
    df.write.mode(mode).partitionBy(partition_by).parquet(path)


def write_bucketed_table(spark: SparkSession, df: DataFrame, name: str,
                         bucket_col: str | list[str], n_buckets: int = 8,
                         mode: str = "overwrite") -> None:
    """S7 scale form — managed table bucketed+sorted by the join key
    (one column or a composite). Joins between tables bucketed
    identically on the key skip the shuffle entirely (no Exchange in
    the plan). Bucket on the FULL join key set: since Spark 3.3
    co-partitioning requires all cluster keys by default
    (``spark.sql.requireAllClusterKeysForCoPartition``), a table
    bucketed on a subset of the join keys is planned with the bucketing
    disabled and shuffles anyway."""
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    (df.write.mode(mode)
       .bucketBy(n_buckets, *cols)
       .sortBy(*cols)
       .format("parquet")
       .saveAsTable(name))
