"""KPI materialization jobs — faithful Spark rebuilds of the reference's
derived tables (``metrics.py`` → kpi_monthly, ``metrics_products.py`` →
kpi_prod_monthly), column for column.

Semantic fidelity notes (SURVEY.md §7.3):
- lags are ROW-offset (pandas ``shift``), ordered (year, month_num),
  partitioned by category for the product table;
- ma3 uses min_periods=1 and rounds to 0 decimals
  (``metrics.py:78-80``, ``metrics_products.py:94-96``);
- the national base-100 index divides by January of the base year with
  NO zero-guard (``metrics.py:59-63`` would raise on a missing base;
  we yield NULL instead of crashing — the one deliberate deviation);
- the product index divides by the first ROW per category with a
  ``>0 else 1`` guard (``metrics_products.py:100-107``);
- ``cov_ratio`` is exp/imp (no %, round 4) with inf→NULL
  (``metrics_products.py:72``);
- a per-cell missing flow stays NULL (pandas pivot leaves NaN; the
  0-default at ``metrics_products.py:61-64`` applies only to a wholly
  absent column), and all-NULL (year, month) groups are dropped like
  ``pivot_table(dropna=True)``;
- rounding is HALF_EVEN (``F.bround``) to match pandas/numpy ``.round``;
  the ma3 columns run the reference's own pandas rolling kernel via
  applyInPandas (grouped_map.pandas_rolling_mean) because its
  compensated streaming accumulator is not reproducible by a frame AVG
  at .5 boundaries — both builders reproduce the reference's committed
  kpi tables bit-for-bit on its own data (tests/test_reference_parity.py).

Scale: the national series is one aggregated row per month (tiny window);
the product table windows partition by category, so parallelism and
state scale with the category count, never the raw facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from sunat_rree_demo_spark.functions.months import month_num_from_name
from sunat_rree_demo_spark.operators.grouped_map import pandas_rolling_mean
from sunat_rree_demo_spark.operators.relational import filter_not_total
from sunat_rree_demo_spark.operators.windows import series_window


def _pct(col: str, n: int, w) -> F.Column:
    # zero base → NULL (pandas would emit ±inf here; under ANSI Spark a
    # raw division raises — NULL is the engine's inf_to_null stance, F9).
    # bround = HALF_EVEN, matching pandas/numpy .round() exactly — the
    # reference's SQL views use HALF_UP ROUND, an inconsistency the
    # reference itself has between its two implementations (SURVEY §4d)
    prev = F.lag(col, n).over(w)
    return F.when(prev.isNotNull() & (prev != 0),
                  F.bround((F.col(col) / prev - 1) * 100, 2))


def build_kpi_monthly(trade: DataFrame, base_year: int = 2005) -> DataFrame:
    """trade → kpi_monthly (``metrics.py:17-98``)."""
    base = (
        filter_not_total(trade)
        .groupBy("year", "month")
        .agg(
            F.first(F.when(F.col("flow") == "export", F.col("usd")),
                    ignorenulls=True).alias("export"),
            F.first(F.when(F.col("flow") == "import", F.col("usd")),
                    ignorenulls=True).alias("import"),
        )
        .withColumn("month_num", month_num_from_name("month"))
        # pandas pivot_table(dropna=True) silently drops groups whose
        # values are all NaN (e.g. a month present only as a NULL-usd
        # import row); reproduce, BEFORE the windows, so lag offsets
        # align with the reference
        .filter(F.col("export").isNotNull() | F.col("import").isNotNull())
    )
    w = series_window()
    # base-100: January of base_year (metrics.py:59-63), broadcast scalar.
    # agg-to-one-row so a missing base yields NULL indices (the reference
    # would raise IndexError) instead of annihilating the crossJoin.
    jan = (base.filter((F.col("year") == base_year) & (F.col("month_num") == 1))
               .agg(F.first("export").alias("_bexp"),
                    F.first("import").alias("_bimp")))
    bal = F.col("export") - F.col("import")
    return (
        base.crossJoin(F.broadcast(jan))
        .withColumn("balance", bal)
        .withColumn("idx2005_export",
                    F.when(F.col("_bexp") != 0,
                           F.bround(F.col("export") / F.col("_bexp") * 100, 2)))
        .withColumn("idx2005_import",
                    F.when(F.col("_bimp") != 0,
                           F.bround(F.col("import") / F.col("_bimp") * 100, 2)))
        .withColumn("export_mom", _pct("export", 1, w))
        .withColumn("export_yoy", _pct("export", 12, w))
        .withColumn("import_mom", _pct("import", 1, w))
        .withColumn("import_yoy", _pct("import", 12, w))
        # ma3 via the reference's own pandas streaming kernel (exact
        # artifact parity; see operators.grouped_map.pandas_rolling_mean)
        .transform(lambda d: pandas_rolling_mean(
            d, {"export_ma3": "export", "import_ma3": "import",
                "balance_ma3": "balance"}, partition=None))
        .select("year", "month", "month_num", "export", "import", "balance",
                "export_mom", "export_yoy", "import_mom", "import_yoy",
                "export_ma3", "import_ma3", "balance_ma3",
                "idx2005_export", "idx2005_import")
        .orderBy("year", "month_num")
    )


def build_kpi_prod_monthly(trade_prod: DataFrame) -> DataFrame:
    """trade_prod → kpi_prod_monthly (``metrics_products.py:30-126``)."""
    base = (
        filter_not_total(trade_prod)
        .withColumn("month_num", month_num_from_name("month"))
        .groupBy("year", "month", "month_num", "category")
        .agg(
            # per-cell missing flow stays NULL — pandas pivot_table only
            # defaults a flow to 0 when the whole COLUMN is absent
            # (metrics_products.py:61-64); per-cell gaps are NaN, and in
            # the committed data the flows are disjoint per category, so
            # this distinction decides most of the table
            F.sum(F.when(F.col("flow") == "export", F.col("usd"))).alias("exp"),
            F.sum(F.when(F.col("flow") == "import", F.col("usd"))).alias("imp"),
        )
    )
    w = series_window(partition=["category"])
    wfirst = w.rowsBetween(Window.unboundedPreceding, 0)
    bal = F.col("exp") - F.col("imp")
    first_exp = F.first("exp").over(wfirst)
    first_imp = F.first("imp").over(wfirst)
    guard = lambda c: F.when(c.isNotNull() & (c > 0), c).otherwise(F.lit(1.0))  # noqa: E731
    return (
        base
        .withColumn("balance", bal)
        .withColumn("cov_ratio",
                    F.bround(F.when(F.col("imp") != 0, F.col("exp") / F.col("imp")), 4))
        .withColumn("exp_mom", _pct("exp", 1, w))
        .withColumn("exp_yoy", _pct("exp", 12, w))
        .withColumn("imp_mom", _pct("imp", 1, w))
        .withColumn("imp_yoy", _pct("imp", 12, w))
        # ma3 via the reference's own pandas streaming kernel, per
        # category (exact artifact parity; see grouped_map)
        .transform(lambda d: pandas_rolling_mean(
            d, {"exp_ma3": "exp", "imp_ma3": "imp",
                "balance_ma3": "balance"}, partition=["category"]))
        .withColumn("idx_exp", F.bround(F.col("exp") / guard(first_exp) * 100, 2))
        .withColumn("idx_imp", F.bround(F.col("imp") / guard(first_imp) * 100, 2))
        .select("year", "month", "month_num", "category",
                "exp", "imp", "balance", "cov_ratio",
                "exp_mom", "exp_yoy", "imp_mom", "imp_yoy",
                "exp_ma3", "imp_ma3", "balance_ma3", "idx_exp", "idx_imp")
        .orderBy("category", "year", "month_num")
    )


def save_kpi_tables(spark, trade: DataFrame, trade_prod: DataFrame,
                    warehouse_dir: str) -> dict[str, str]:
    """Materialize the derived tables as partitioned parquet + temp views
    (the reference's DuckDB-table + parquet dual sink, metrics.py:95-98).
    Partitioning by year keeps 100 TB scans prunable."""
    out = {}
    for name, df in (("kpi_monthly", build_kpi_monthly(trade)),
                     ("kpi_prod_monthly", build_kpi_prod_monthly(trade_prod))):
        path = f"{warehouse_dir}/{name}"
        df.write.mode("overwrite").partitionBy("year").parquet(path)
        spark.read.parquet(path).createOrReplaceTempView(name)
        out[name] = path
    return out
