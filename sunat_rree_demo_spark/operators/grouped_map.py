"""Grouped-map / UDAF surface (SURVEY.md §2.11).

The reference's one per-group function is ``calculate_base_index``
(``metrics_products.py:100-107``, applied via ``groupby.apply``) — our
KPI build expresses it as a pure window expression (operators.windows.
base_index), which is the fast path. This module provides the *general*
form the reference's pattern implies — ``applyInPandas`` (grouped-map
pandas UDF) — for semantics that genuinely need per-group imperative
code, plus a sample pandas UDAF (``applyInPandas`` aggregation).

Scale: applyInPandas shuffles by the grouping key and streams each group
through Python via Arrow. It is the slow path (serialization + Python) —
use it only when window/agg expressions can't express the logic; state
per group must fit one executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def base_index_grouped_map(df: DataFrame, key: str = "category",
                           order: tuple[str, str] = ("year", "month_num"),
                           cols: tuple[str, str] = ("exp", "imp")) -> DataFrame:
    """UD1 general form: per-category base-100 index via applyInPandas —
    semantically identical to the window-expression form (asserted in
    tests/test_grouped_map.py), kept as the template for genuinely
    imperative per-group logic."""
    import pandas as pd  # noqa: F401

    out_schema = T.StructType(
        list(df.schema)
        + [T.StructField("idx_exp_gm", T.DoubleType()),
           T.StructField("idx_imp_gm", T.DoubleType())]
    )

    exp_c, imp_c = cols

    def per_group(pdf):
        pdf = pdf.sort_values(list(order)).reset_index(drop=True)
        def idx(series):
            base = series.iloc[0] if len(series) and series.iloc[0] and series.iloc[0] > 0 else 1.0
            return (series / base * 100).round(2)
        pdf["idx_exp_gm"] = idx(pdf[exp_c])
        pdf["idx_imp_gm"] = idx(pdf[imp_c])
        return pdf

    return df.groupBy(key).applyInPandas(per_group, schema=out_schema)


def pandas_rolling_mean(df: DataFrame, cols: dict[str, str],
                        partition: list[str] | None,
                        order: tuple[str, ...] = ("year", "month_num"),
                        window: int = 3, decimals: int = 0) -> DataFrame:
    """Rolling mean computed with the SAME streaming kernel the
    reference uses (pandas ``rolling(window, min_periods=1).mean()
    .round(decimals)``, ``metrics.py:78-80`` /
    ``metrics_products.py:94-96``) via applyInPandas.

    Exists because pandas' rolling mean is a history-dependent
    compensated accumulator: on values whose frame mean lands within an
    ulp of an exact .5, it can round to the other side than Spark's
    frame AVG — one cell in 23,366 of the reference's committed
    kpi_prod_monthly does exactly that. Running the identical kernel per
    group makes artifact parity exact by construction.

    Scale: applied to the REDUCED kpi grain (categories × months, a few
    thousand rows — never the raw facts); one shuffle by ``partition``,
    each group a tiny Arrow batch. ``cols`` maps output name → source
    column. With ``partition=None`` the whole frame is one group (the
    national monthly series — hundreds of rows)."""
    import pandas as pd  # noqa: F401

    from pyspark.sql import functions as F

    out_schema = T.StructType(
        list(df.schema)
        + [T.StructField(out, T.DoubleType()) for out in cols])

    def per_group(pdf):
        pdf = pdf.sort_values(list(order)).reset_index(drop=True)
        if "_g" in pdf.columns:
            pdf = pdf.drop(columns=["_g"])
        for out, src in cols.items():
            pdf[out] = (pdf[src].rolling(window, min_periods=1)
                        .mean().round(decimals))
        return pdf

    # single-series case: a literal int in groupBy resolves as an
    # ordinal, so group on a materialized constant column instead
    grouped = (df.groupBy(*partition) if partition
               else df.withColumn("_g", F.lit(0)).groupBy("_g"))
    return grouped.applyInPandas(per_group, schema=out_schema)


def weighted_mean_udaf(df: DataFrame, key: str, value_col: str,
                       weight_col: str) -> DataFrame:
    """Sample pandas UDAF via applyInPandas aggregation: per-key weighted
    mean. (The expression form F.sum(v*w)/F.sum(w) is preferred in
    production; this demonstrates the declared UDAF surface.)"""
    import pandas as pd

    out_schema = T.StructType([
        T.StructField(key, df.schema[key].dataType),
        T.StructField("weighted_mean", T.DoubleType()),
    ])

    def agg(pdf: "pd.DataFrame") -> "pd.DataFrame":
        w = pdf[weight_col].sum()
        wm = float((pdf[value_col] * pdf[weight_col]).sum() / w) if w else None
        return pd.DataFrame({key: [pdf[key].iloc[0]], "weighted_mean": [wm]})

    return df.groupBy(key).applyInPandas(agg, schema=out_schema)
