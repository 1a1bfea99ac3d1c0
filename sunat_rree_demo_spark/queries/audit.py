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


#: q140 PSI quantization (1e-8 units) and Laplace smoothing constant.
_PSI_U = 100000000
_DECILES = [i / 10.0 for i in range(1, 10)]


# --------------------------------------------------------------------- q140
@register(
    "q140_psi_drift",
    oracle=f"""
    WITH o2 AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    by_ AS (SELECT min(y) AS by FROM o2),
    bs AS (
      SELECT quantile_cont(cents, {_DECILES!r}) AS b
      FROM o2, by_ WHERE y = by
    ),
    rows_ AS (
      SELECT y, len(list_filter(b, x -> cents >= x)) AS bucket
      FROM o2, bs
    ),
    cnts AS (SELECT y, bucket, CAST(count(*) AS BIGINT) AS c
             FROM rows_ GROUP BY 1, 2),
    ny AS (SELECT y, CAST(count(*) AS BIGINT) AS n FROM o2 GROUP BY 1),
    spine AS (
      SELECT y, i AS bucket
      FROM (SELECT DISTINCT y FROM o2), unnest(range(0, 10)) AS u(i)
    ),
    p AS (
      SELECT s.y, s.bucket,
             (coalesce(c.c, 0) + 1.0) / (ny.n + 10.0) AS p
      FROM spine s
      LEFT JOIN cnts c ON s.y = c.y AND s.bucket = c.bucket
      JOIN ny ON s.y = ny.y
    ),
    pa AS (SELECT bucket, p AS pa FROM p, by_ WHERE y = by),
    t AS (
      SELECT p.y,
             CAST(round((p.p - pa.pa) * ln(p.p / pa.pa) * {_PSI_U})
                  AS BIGINT) AS tu
      FROM p JOIN pa USING (bucket)
    )
    SELECT y AS year, CAST(sum(tu) AS BIGINT) AS psi_u,
           CAST(sum(tu) AS BIGINT) / {_PSI_U}.0 AS psi
    FROM t GROUP BY 1 ORDER BY year
    """,
    tags=("audit", "drift", "psi"),
)
def q140_psi_drift(spark, sf_dir):
    """Population Stability Index of the order-value distribution per
    year against the FIRST year's decile buckets — the standard ML-ops
    drift monitor (PSI = Σ (p_b − p_a)·ln(p_b/p_a) over baseline-decile
    bins; >0.25 conventionally flags retraining). Exact-cents values,
    q73's percentile≡quantile_cont interpolation for the boundaries,
    add-one Laplace smoothing so no bin is empty, and per-bin terms
    quantized to 1e-8 integer units before the per-year sum. The
    baseline year audits itself to PSI 0 — a built-in sanity row.

    Scale shape: boundaries are a 1-row broadcast frame (no driver
    collect — the builder stays pure); bucket assignment is a 9-element
    fold per row against that broadcast array; counts are one
    (year, bucket)-grain shuffle with map-side combine; the spine,
    smoothing, and baseline join all run on ~|years|×10 rows."""
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    o2 = o.select(
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
        .alias("cents"))
    by = o2.agg(F.min("y").alias("_by"))
    base = o2.join(F.broadcast(by), o2.y == F.col("_by")).drop("_by")
    bounds = base.agg(F.percentile(
        "cents", F.array(*[F.lit(p) for p in _DECILES])).alias("_bs"))
    bucket = F.aggregate(
        F.col("_bs"), F.lit(0),
        lambda acc, b: acc + F.when(F.col("cents") >= b, 1).otherwise(0))
    rows = (o2.join(F.broadcast(bounds))
            .select("y", bucket.alias("bucket")))
    cnts = (rows.groupBy("y", "bucket")
            .agg(F.count("*").cast("bigint").alias("_c")))
    ny = o2.groupBy("y").agg(F.count("*").cast("bigint").alias("_n"))
    spine = (o2.select("y").distinct()
             .select("y", F.explode(F.sequence(F.lit(0), F.lit(9)))
                     .alias("bucket")))
    p = (spine.join(cnts, ["y", "bucket"], "left")
         .join(ny, "y")
         .select("y", "bucket",
                 ((F.coalesce("_c", F.lit(0)) + 1.0)
                  / (F.col("_n") + 10.0)).alias("p")))
    pa = (p.join(F.broadcast(by), p.y == F.col("_by"))
          .select("bucket", F.col("p").alias("_pa")))
    tu = F.round((F.col("p") - F.col("_pa"))
                 * F.log(F.col("p") / F.col("_pa")) * _PSI_U, 0) \
        .cast("bigint")
    return (
        p.join(F.broadcast(pa), "bucket")
        .select("y", tu.alias("_tu"))
        .groupBy("y")
        .agg(F.sum("_tu").cast("bigint").alias("psi_u"))
        .select(F.col("y").alias("year"), "psi_u",
                (F.col("psi_u") / float(_PSI_U)).alias("psi"))
        .orderBy("year")
    )


# --------------------------------------------------------------------- q208
_KANON = 10  #: minimum cell size for the release bar


@register(
    "q208_k_anonymity",
    oracle=f"""
    WITH cells AS (
      SELECT c_mktsegment AS segment, c_nationkey AS nation,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
             count(*) AS n
      FROM customer GROUP BY 1, 2, 3
    ),
    gen AS (
      SELECT segment, nation, CAST(sum(n) AS BIGINT) AS n_gen
      FROM cells GROUP BY 1, 2
    )
    SELECT segment,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(CASE WHEN n < {_KANON} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_small_cells,
           CAST(sum(CASE WHEN n < {_KANON} THEN n ELSE 0 END) AS BIGINT)
             AS n_rows_at_risk,
           CAST(min(n) AS BIGINT) AS min_cell,
           CAST(sum(CASE WHEN n < {_KANON} AND n_gen >= {_KANON}
                         THEN n ELSE 0 END) AS BIGINT)
             AS n_rescued_by_generalizing
    FROM cells JOIN gen USING (segment, nation)
    GROUP BY segment ORDER BY segment
    """,
    tags=("audit", "privacy", "k-anonymity"),
)
def q208_k_anonymity(spark, sf_dir):
    """K-anonymity audit over the quasi-identifier tuple (segment,
    nation, account-balance bucket) — the release-gate check a
    training-data pipeline runs on structured joins before export
    (Sweeney 2002; completes the governance family: q64 redacts free
    text, forget_* propagate deletions, this measures linkage risk in
    the TABLES). Per segment: identifier cells, cells under k=10,
    rows at risk, the smallest cell, and how many at-risk rows a ONE-
    LEVEL generalization (dropping the balance bucket) would rescue —
    the classic suppress-vs-generalize decision, quantified.

    Scale shape: two stacked hash aggregates (cell grain, then the
    generalized superset via a second map-side-combined groupBy) and
    one broadcast-sized join — the corpus shuffles once on the cell
    key; all arithmetic is exact integers."""
    c = t(spark, sf_dir, "customer")
    cells = (c.select(
                F.col("c_mktsegment").alias("segment"),
                F.col("c_nationkey").alias("nation"),
                F.floor(F.col("c_acctbal") / 1000).cast("bigint")
                .alias("bal_bucket"))
             .groupBy("segment", "nation", "bal_bucket")
             .agg(F.count("*").alias("n")))
    gen = (cells.groupBy("segment", "nation")
           .agg(F.sum("n").cast("bigint").alias("n_gen")))
    small = F.col("n") < _KANON
    return (
        cells.join(gen, ["segment", "nation"])
        .groupBy("segment")
        .agg(F.count("*").cast("bigint").alias("n_cells"),
             F.sum(F.when(small, 1).otherwise(0)).cast("bigint")
             .alias("n_small_cells"),
             F.sum(F.when(small, F.col("n")).otherwise(0)).cast("bigint")
             .alias("n_rows_at_risk"),
             F.min("n").cast("bigint").alias("min_cell"),
             F.sum(F.when(small & (F.col("n_gen") >= _KANON),
                          F.col("n")).otherwise(0)).cast("bigint")
             .alias("n_rescued_by_generalizing"))
        .orderBy("segment")
    )
