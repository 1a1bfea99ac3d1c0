"""Skew-handling utilities (SURVEY.md §7.3 / 100 TB mandate).

AQE's skew-join splitting covers sort-merge joins automatically; these
helpers cover the cases AQE doesn't: skewed *aggregation* keys and
skewed broadcast-ineligible joins.

Salted aggregation = two-phase: GROUP BY (key, salt) partial → GROUP BY
key final. The first shuffle spreads a hot key over ``n_salts``
reducers; the second is tiny (one row per key×salt). Only associative
aggregates decompose this way — sums/counts/min/max here; avg = sum/
count composed at the end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a NARROW input ahead of a CPU-bound
    Python stage (mapInPandas): a small parquet table arrives as a
    single split, which would serialize shingling/hashing/matmul work on
    one core while 31 idle. No-op when the input already has enough
    partitions — the warehouse-scale case, where a wide scan is already
    parallel and an extra shuffle would only cost. The shuffle moves
    O(input) bytes once; the Python work it parallelizes is the
    dominant term whenever this matters."""
    try:
        target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() >= target:
            return df
    except Exception:  # pragma: no cover - Spark Connect: no rdd handle
        target = min_partitions or 32
    return df.repartition(target)


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Uniform salt from a hash of the row's monotonic id — cheap and
    evenly spread. Salt assignment need not be stable across task
    retries for *associative* aggregates (any assignment sums to the
    same total); for value-dependent semantics use the value-hash salt
    in ``salted_count_distinct``."""
    return df.withColumn(
        salt_col,
        (F.abs(F.xxhash64(F.monotonically_increasing_id())) % n_salts).cast("int"))


def salted_sum(df: DataFrame, keys: list[str], value_col: str,
               n_salts: int = 16, alias: str = "total") -> DataFrame:
    """Two-phase salted SUM over possibly-skewed keys."""
    partial = (
        with_salt(df, n_salts)
        .groupBy(*keys, "_salt")
        .agg(F.sum(value_col).alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(alias))


def salted_count_distinct(df: DataFrame, keys: list[str], value_col: str,
                          n_salts: int = 16, alias: str = "n_distinct") -> DataFrame:
    """Two-phase distinct count: salt by the VALUE hash so equal values
    land on the same salt (correctness), de-dup within (key, salt), then
    count per key."""
    salted = df.withColumn(
        "_salt", (F.abs(F.xxhash64(F.col(value_col))) % n_salts).cast("int"))
    dedup = salted.select(*keys, "_salt", value_col).distinct()
    return dedup.groupBy(*keys).agg(F.count(value_col).alias(alias))


def broadcast_salted_join(skewed: DataFrame, small: DataFrame,
                          key: str, n_salts: int = 8) -> DataFrame:
    """Skewed-key equi-join without AQE: replicate the small side
    ``n_salts`` times (explode), salt the big side, join on
    (key, salt) — each hot key's rows spread over n_salts tasks.
    Use when the small side is broadcast-ineligible but replicable."""
    exploded = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    big = skewed.withColumn(
        "_salt",
        (F.abs(F.xxhash64(F.monotonically_increasing_id())) % n_salts).cast("int"))
    return big.join(exploded, on=[key, "_salt"]).drop("_salt")
