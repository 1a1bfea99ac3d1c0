"""Audit / data-governance queries: Benford first-digit conformance of
the trade values and a snapshot diff between two versions of a keyed
mart — the checks a data platform runs before publishing a refresh.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sunat_rree_demo_spark.operators.relational import snapshot_diff
from sunat_rree_demo_spark.queries.base import register, t

#: Benford P(d) = log10(1 + 1/d) — ONE Python-constant list shared as
#: literals by both engines (repr round-trips doubles exactly).
BENFORD_P = tuple(math.log10(1.0 + 1.0 / d) for d in range(1, 10))


# --------------------------------------------------------------------- q102
@register(
    "q102_benford_digits",
    oracle=f"""
    WITH v AS (
      SELECT cents FROM (
        SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem WHERE l_extendedprice > 0)
      WHERE cents >= 1
    ),
    d AS (
      SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM v
    ),
    g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM g),
    p(digit, p) AS (VALUES {", ".join(
        f"({d + 1}, CAST({p!r} AS DOUBLE))"
        for d, p in enumerate(BENFORD_P))})
    SELECT g.digit, g.n,
           CAST(round(p * total * 100) AS BIGINT) / 100.0 AS expected,
           CAST(round(1000000.0 * ((n - p * total) * (n - p * total))
                      / (p * total)) AS BIGINT) / 1000000.0 AS chi_term
    FROM g JOIN p ON g.digit = p.digit, tot
    ORDER BY g.digit
    """,
    tags=("audit", "benford"),
)
def q102_benford_digits(spark, sf_dir):
    """Benford's-law first-digit audit of the trade values: observed vs
    expected counts per leading digit and the χ² contribution — the
    classic anomaly screen for fabricated or truncated amounts.

    Determinism: the leading digit comes from the DECIMAL STRING of the
    exact cent integer (no log10 of a float, whose ULP error flips
    boundary values like 1000.0); the Benford probabilities are one
    Python constant list embedded as identical literals in both
    engines; expected counts and χ² terms quantize to integers before
    any presentation division.

    Scale shape: a projection + 9-bucket aggregate over the fact scan —
    map-side combine collapses everything; the digit-grain frame is
    constant-size forever after."""
    li = t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    # cents >= 1: a sub-half-cent price would yield digit 0, which has
    # no Benford expectation (and would crash the 1-based element_at)
    g = (li.filter(F.col("l_extendedprice") > 0)
         .select(cents.alias("cents")).filter(F.col("cents") >= 1)
         .select(F.substring(F.col("cents").cast("string"), 1, 1)
                 .cast("bigint").alias("digit"))
         .groupBy("digit").agg(F.count("*").cast("bigint").alias("n")))
    tot = g.agg(F.sum("n").cast("bigint").alias("total"))
    p = F.element_at(F.array(*[F.lit(x) for x in BENFORD_P]),
                     F.col("digit").cast("int"))
    e = p * F.col("total")
    return (
        g.join(F.broadcast(tot))
        .select("digit", "n",
                (F.round(e * 100, 0).cast("bigint") / 100.0)
                .alias("expected"),
                (F.round(1000000.0 * ((F.col("n") - e) * (F.col("n") - e))
                         / e, 0).cast("bigint") / 1000000.0)
                .alias("chi_term"))
        .orderBy("digit")
    )


# --------------------------------------------------------------------- q103
@register(
    "q103_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem WHERE year(l_shipdate) <= 1994 GROUP BY 1
    ),
    new AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem WHERE year(l_shipdate) >= 1995 GROUP BY 1
    ),
    j AS (
      SELECT CASE WHEN o.l_partkey IS NULL THEN 'added'
                  WHEN n.l_partkey IS NULL THEN 'removed'
                  WHEN o.n_lines = n.n_lines AND o.cents = n.cents
                    THEN 'unchanged'
                  ELSE 'changed' END AS change_type,
             coalesce(n.cents, 0) - coalesce(o.cents, 0) AS delta
      FROM old o FULL OUTER JOIN new n ON o.l_partkey = n.l_partkey
    )
    SELECT change_type, CAST(count(*) AS BIGINT) AS n_keys,
           round(CAST(sum(delta) AS BIGINT) / 100.0, 2) AS usd_delta
    FROM j GROUP BY 1 ORDER BY 1
    """,
    tags=("audit", "cdc", "diff"),
)
def q103_snapshot_diff(spark, sf_dir):
    """Snapshot diff between two versions of the per-part sales mart
    (shipments through 1994 vs 1995 onward): per change class, how many
    part keys and the net value delta — the audit a platform publishes
    with every mart refresh (operator: operators.relational.
    snapshot_diff; one full-outer key join, no driver collect).

    Money stays integer cents per line before any sum, so the class
    assignment (changed vs unchanged) compares exact integers and the
    delta aggregate is order-free."""
    li = t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")

    def snap(pred):
        return (li.filter(pred)
                .groupBy("l_partkey")
                .agg(F.count("*").cast("bigint").alias("n_lines"),
                     F.sum(cents).cast("bigint").alias("cents")))

    old = snap(F.year("l_shipdate") <= 1994)
    new = snap(F.year("l_shipdate") >= 1995)
    diff = snapshot_diff(old, new, ["l_partkey"], ["n_lines", "cents"])
    return (
        diff.select(
            "change_type",
            (F.coalesce("new_cents", F.lit(0))
             - F.coalesce("old_cents", F.lit(0))).alias("delta"))
        .groupBy("change_type")
        .agg(F.count("*").cast("bigint").alias("n_keys"),
             F.round(F.sum("delta").cast("bigint") / 100.0, 2)
             .alias("usd_delta"))
        .orderBy("change_type")
    )
