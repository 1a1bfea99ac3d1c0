"""Data-QA invariants as Spark assertions (SURVEY.md §5.2 — the
reference runs these inline in the ETLs (``etl.py:61-74``,
``etl_products.py:100-151``) and as pytest checks against the built
warehouse (``tests/test_products_qa.py``); here they are DataFrame
reductions returning violation counts, runnable between pipeline stages).

Tolerances mirror the reference: $1K warn / $10M major, both non-fatal
(``tests/test_products_qa.py:41,54``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from sunat_rree_demo_spark.operators.relational import filter_not_total

WARN_TOLERANCE = 1_000.0
MAJOR_TOLERANCE = 10_000_000.0


@dataclass(frozen=True)
class QAResult:
    name: str
    violations: int
    detail: str = ""

    @property
    def ok(self) -> bool:
        return self.violations == 0


def reconciliation(trade: DataFrame, keys: list[str],
                   tolerance: float = WARN_TOLERANCE) -> DataFrame:
    """Σ(monthly) vs the embedded annual Total per key group
    (``etl_products.py:100-151``): returns the discrepancy rows.

    The monthly sums and the Total lookup are both tiny aggregates of the
    same shuffle key; the join broadcasts."""
    monthly = (filter_not_total(trade)
               .groupBy(*keys)
               .agg(F.sum("usd").alias("monthly_sum")))
    totals = (trade.filter(F.col("month") == "Total")
              .select(*keys, F.col("usd").alias("annual_total")))
    return (
        monthly.join(F.broadcast(totals), on=keys, how="inner")
        .withColumn("delta", F.abs(F.col("monthly_sum") - F.col("annual_total")))
        .filter(F.col("delta") > tolerance)
        .orderBy(F.desc("delta"))
    )


def run_invariants(trade: DataFrame, trade_prod: DataFrame,
                   kpi_prod: DataFrame | None = None) -> list[QAResult]:
    """The reference's QA suite (tests/test_products_qa.py):
    existence/non-emptiness (:10-20), reconciliation (:22-66),
    completeness (:68-96), quality (:98-139), cross-table category
    consistency (:141-169)."""
    results: list[QAResult] = []

    n = trade_prod.count()
    results.append(QAResult("table_non_empty", 0 if n > 0 else 1, f"{n} rows"))

    # one reconciliation pass yields both tolerance counts (the warn-level
    # rows are a superset of the major ones)
    recon = reconciliation(trade_prod, ["year", "flow", "category"],
                           WARN_TOLERANCE)
    counts = recon.agg(
        F.count("*").alias("warn"),
        F.sum(F.when(F.col("delta") > MAJOR_TOLERANCE, 1).otherwise(0))
        .alias("major")).first()
    results.append(QAResult("reconciliation_major", int(counts.major or 0),
                            f"{counts.warn} warn-level"))

    flows = [r.flow for r in trade_prod.select("flow").distinct().collect()]
    results.append(QAResult(
        "both_flows_present", 0 if set(flows) >= {"export", "import"} else 1,
        str(sorted(flows))))

    yr = trade_prod.agg(F.min("year").alias("lo"), F.max("year").alias("hi")).first()
    sane = 1900 < yr.lo <= yr.hi < 2100
    results.append(QAResult("year_range_sane", 0 if sane else 1, f"{yr.lo}-{yr.hi}"))

    bad_usd = filter_not_total(trade_prod).filter(
        F.col("usd").isNull() | (F.col("usd") < 0)).count()
    results.append(QAResult("no_negative_or_null_usd", bad_usd))

    empty_cat = trade_prod.filter(F.trim(F.col("category")) == "").count()
    results.append(QAResult("no_empty_categories", empty_cat))

    if kpi_prod is not None:
        only_base = (trade_prod.select("category").distinct()
                     .exceptAll(kpi_prod.select("category").distinct()).count())
        only_kpi = (kpi_prod.select("category").distinct()
                    .exceptAll(trade_prod.select("category").distinct()).count())
        results.append(QAResult("category_domains_consistent",
                                only_base + only_kpi,
                                f"base-only={only_base} kpi-only={only_kpi}"))
    return results


def observe_qa(df: DataFrame, value_col: str, id_col: str):
    """Attach single-pass QA metrics to ``df`` via Spark's Observation
    API: row count, null-value count, id-duplication signal (count vs
    approx distinct), and the value sum — collected AS A SIDE EFFECT of
    whatever action the caller already runs, so QA costs ZERO extra
    scans (the reductions above re-scan per invariant; at 100 TB a
    write job observes its own QA for free).

    Returns (df_with_observation, observation); read
    ``observation.get`` AFTER the first action on the returned frame.
    """
    from pyspark.sql import Observation

    obs = Observation("qa")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(value_col).isNull().cast("long")).alias("n_null_value"),
        F.approx_count_distinct(id_col).alias("n_ids_approx"),
        F.round(F.sum(value_col), 2).alias("value_total"),
    )
    return observed, obs
