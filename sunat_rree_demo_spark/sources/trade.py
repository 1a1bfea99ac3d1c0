"""Trade-table schemas and a deterministic synthetic generator.

The reference's warehouse contract (FIXTURES.md §1-2, verified against the
committed ``trade.duckdb``): long-format facts with Spanish month names,
embedded ``month='Total'`` QA rows carrying ``sum_months``, partial final
year, missing months, a flow that goes entirely missing, near-duplicate
category spellings. The generator reproduces every wart so the KPI/QA
layers are exercised exactly like the reference's own data
(``etl.py:46-58``, ``etl_products.py:84-90``).

Schemas are explicit StructTypes — the engine fixes schemas instead of
inferring them (SURVEY.md §1.3/1.4).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from sunat_rree_demo_spark.functions.months import MONTH_NAMES_ES
from sunat_rree_demo_spark.localrel import local_df

TRADE_SCHEMA = T.StructType([
    T.StructField("year", T.LongType(), False),
    T.StructField("month", T.StringType(), False),
    T.StructField("flow", T.StringType(), False),
    T.StructField("usd", T.DoubleType(), True),
    T.StructField("sum_months", T.DoubleType(), True),
])

TRADE_PROD_SCHEMA = T.StructType([
    T.StructField("year", T.LongType(), False),
    T.StructField("month", T.StringType(), False),
    T.StructField("flow", T.StringType(), False),
    T.StructField("category", T.StringType(), False),
    T.StructField("usd", T.DoubleType(), True),
])

#: categories with the reference's committed warts: near-duplicate
#: spellings kept UN-normalized (SURVEY.md §7.3 dirty-category fidelity),
#: long names, mixed case.
CATEGORIES = (
    "I. Productos Tradicionales",
    "I.Productos Tradicionales",          # near-dup spelling, real in ref data
    "II. Productos No Tradicionales",
    "Agropecuario y Agroindustrias",
    "Textil y Confecciones",
    "Químico",
    "Minería No Metálica y Siderometalurgia",
    "Pesquero Tradicional",
    "Maderas y Papeles, y sus Manufacturas",
    "Mineros",
)


def synthetic_trade(spark: SparkSession, start_year: int = 2005,
                    end_year: int = 2025, seed: int = 42) -> DataFrame:
    """National monthly facts with Total QA rows (FIXTURES.md §1)."""
    rng = random.Random(seed)
    rows: list[tuple] = []
    for year in range(start_year, end_year + 1):
        n_months = 4 if year == end_year else 12
        for flow in ("export", "import"):
            if flow == "import" and year == end_year:
                continue  # the import workbook lags a full year
            month_vals: list[tuple[str, float]] = []
            for mi in range(n_months):
                # one missing month in later years (gappy series)
                if year >= 2018 and mi == (year * 7) % 11 and n_months == 12:
                    continue
                growth = 1.0 + 0.06 * (year - start_year)
                season = 1.0 + 0.15 * ((mi % 6) - 2.5) / 2.5
                base = 2.5e9 if flow == "export" else 2.2e9
                usd = round(base * growth * season * rng.uniform(0.85, 1.15), 2)
                month_vals.append((MONTH_NAMES_ES[mi], usd))
            rows.extend((year, m, flow, v, None) for m, v in month_vals)
            total = round(sum(v for _, v in month_vals), 2)
            # a warn-level reconciliation discrepancy on one year
            reported = round(total + 5e6, 2) if (year, flow) == (2012, "export") else total
            rows.append((year, "Total", flow, reported, total))
    return local_df(spark, rows, TRADE_SCHEMA)


def synthetic_trade_prod(spark: SparkSession, start_year: int = 2005,
                         end_year: int = 2025, seed: int = 43) -> DataFrame:
    """Per-category facts (FIXTURES.md §2): zero cells dropped at ingest
    (etl_products.py:81-82), Total rows without sum_months column."""
    rng = random.Random(seed)
    rows: list[tuple] = []
    for year in range(start_year, end_year + 1):
        n_months = 4 if year == end_year else 12
        for flow in ("export", "import"):
            if flow == "import" and year == end_year:
                continue
            for cat in CATEGORIES:
                vals = []
                for mi in range(n_months):
                    usd = round(rng.uniform(0, 9e8), 2)
                    if usd < 5e7:
                        continue  # sparse cells dropped like zero cells
                    vals.append((MONTH_NAMES_ES[mi], usd))
                rows.extend((year, m, flow, cat, v) for m, v in vals)
                if vals:
                    rows.append((year, "Total", flow, cat,
                                 round(sum(v for _, v in vals), 2)))
    return local_df(spark, rows, TRADE_PROD_SCHEMA)


def register_trade_views(spark: SparkSession, trade: DataFrame | None = None,
                         trade_prod: DataFrame | None = None) -> None:
    """Register the warehouse tables the SQL view layer consumes."""
    (trade if trade is not None else synthetic_trade(spark)) \
        .createOrReplaceTempView("trade")
    (trade_prod if trade_prod is not None else synthetic_trade_prod(spark)) \
        .createOrReplaceTempView("trade_prod")
