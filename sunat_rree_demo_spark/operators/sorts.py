"""Sorts / limits / top-k (SURVEY.md §2.6, T1-T7).

``orderBy(...).limit(n)`` plans as TakeOrderedAndProject — a per-partition
top-n followed by a driver-side merge of n·p candidates, never a global
sort. That is the 100 TB-safe shape for every ranking in the reference
(pandas ``sort_values().head(n)`` sorts everything).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def top_n(df: DataFrame, by: str, n: int, *tiebreak: str,
          ascending: bool = False) -> DataFrame:
    """T1/T3 — top-N by a column (``app.py:447-459``,
    ``metrics_products.py:135-141``). Callers pass a tiebreak column to
    make the selected SET deterministic under ties."""
    key = F.asc(by) if ascending else F.desc(by)
    return df.orderBy(key, *[F.asc(t) for t in tiebreak]).limit(n)


def top_n_abs(df: DataFrame, by: str, n: int, *tiebreak: str) -> DataFrame:
    """T2 — top-N by |value| (``insights_engine.py:75-78`` ranks insights
    by |YoY|)."""
    return df.orderBy(F.desc(F.abs(F.col(by))), *[F.asc(t) for t in tiebreak]).limit(n)


def tail_k(df: DataFrame, order: list[str], k: int) -> DataFrame:
    """T5 — chronological tail (last 24 rows, ``app.py:376``): top-k on
    the reversed key, then re-sort ascending for presentation."""
    rev = [F.desc(c) for c in order]
    return df.orderBy(*rev).limit(k).orderBy(*[F.asc(c) for c in order])


def ranked_in_group(df: DataFrame, partition: list[str], by: str,
                    n: int, tiebreak: str) -> DataFrame:
    """Ranking surface (SURVEY §2.5 note): top-n per group via
    row_number — the ordinal form the ranking tab implies
    (``app.py:617-624``)."""
    from pyspark.sql import Window
    w = Window.partitionBy(*partition).orderBy(F.desc(by), F.asc(tiebreak))
    return (df.withColumn("rank_in_group", F.row_number().over(w))
              .filter(F.col("rank_in_group") <= n))
