"""Projections / filters / predicates (SURVEY.md §2.2, F1-F11).

All are thin, declarative Column/DataFrame builders so Catalyst can push
them into the scan (``PushedFilters`` in the physical plan) — the
reference applies the same predicates eagerly in pandas after full
materialization (e.g. filter-after-load at ``app.py:187``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def filter_not_total(df: DataFrame, month_col: str = "month") -> DataFrame:
    """F1 — the canonical fact filter ``month != 'Total'`` that every
    consumer of the ``trade`` tables applies (``metrics.py:26``,
    ``models/metrics.sql:27``, ``app.py:46``)."""
    return df.filter(F.col(month_col) != "Total")


def in_year_range(df: DataFrame, lo: int, hi: int, year_col: str = "year") -> DataFrame:
    """F2 — inclusive range predicate (``app.py:187,483,723``)."""
    return df.filter(F.col(year_col).between(lo, hi))


def in_categories(df: DataFrame, cats: list[str], cat_col: str = "category") -> DataFrame:
    """F3 — membership predicate (``app.py:483,723``)."""
    return df.filter(F.col(cat_col).isin(cats))


def valid_positive(df: DataFrame, col: str) -> DataFrame:
    """F5 — validity filter ``notna() & (col > 0)``
    (``insights_engine.py:63-65``)."""
    return df.filter(F.col(col).isNotNull() & (F.col(col) > 0))


def flow_amount(flow_value: str, flow_col: str = "flow", amount_col: str = "usd") -> Column:
    """F6 — conditional projection ``CASE WHEN flow=x THEN usd END``; the
    deliberate NULL else-branch makes SUM skip the other flow
    (``metrics.py:23-24``, ``models/metrics.sql:24-25``)."""
    return F.when(F.col(flow_col) == flow_value, F.col(amount_col))


def ensure_columns(df: DataFrame, cols: dict[str, object]) -> DataFrame:
    """F10 — column injection/defaulting: inject missing columns as
    literals, mirroring the reference's defensive
    ``if 'export' not in wide.columns`` (``metrics.py:40-43``)."""
    for name, default in cols.items():
        if name not in df.columns:
            df = df.withColumn(name, F.lit(default).cast("double") if default is None or isinstance(default, float) else F.lit(default))
    return df


def resolve_alias(df: DataFrame, *candidates: str) -> str:
    """The reference's ``exp`` vs ``export`` schema-dynamic resolution
    (``app.py:501-504``, ``insights_engine.py:147-151``): return the first
    candidate column present, else raise."""
    for c in candidates:
        if c in df.columns:
            return c
    raise KeyError(f"none of {candidates!r} in {df.columns}")
