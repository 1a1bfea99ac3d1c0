"""Statistical / semi-structured surface: correlation, exact
percentiles, robust (median/MAD) outliers — the scale-friendly variant
of Y1 SURVEY §2.9 notes — plus TF-IDF text weighting and JSON map
explosion, and the CUBE generalization of the pivot family.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from sunat_rree_demo_spark.queries.base import MONTHLY_SQL, monthly_flows, register, t


# ---------------------------------------------------------------------- q49
@register(
    "q49_correlation",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_extendedprice, l_quantity), 6) AS price_qty_corr,
           round(covar_samp(l_extendedprice, l_quantity), 4) AS price_qty_covar,
           round(median(l_extendedprice), 4) AS median_price,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("A8-extended", "stats"),
)
def q49_correlation(spark, sf_dir):
    """Pearson correlation, sample covariance, exact median/p90 per
    flow — the full stats bundle beyond mean/std (A8).

    Exact percentiles are computed by HISTOGRAM-REFINEMENT SELECTION —
    never ``Window.partitionBy(flag)`` (3 distinct flags would sort the
    whole fact table inside 3 reducer tasks at any scale), and never
    Spark's ``percentile``/``median`` aggregates (they buffer every
    group value in an in-memory map — an OOM risk at 100 TB; the
    one-pass approximate variant is ``approx_percentile``).

    Plan: one aggregate pass gives per-flag count/min/max; a second
    hash-aggregate pass counts rows per (flag, equi-width bucket); a
    tiny cumulative-sum window over the ≤ flags×1024-row histogram
    locates which bucket holds each target rank; only rows in those ≤4
    buckets per flag (~1/256 of the data) are ranked, with a window
    whose partition key (flag, bucket) is high-cardinality. Global
    rank = bucket offset + local rank; the 2 boundary rows per quantile
    are interpolated with the quantile_cont formula lo + (hi-lo)*frac.
    Every heavy stage is a map-side-combined hash aggregate at full
    parallelism (measured 0.04s exec vs 0.56s for any full-data window
    at sf0.1). A pathologically hot bucket (≫ rows/1024 of one value)
    would re-apply the same refinement recursively; one level is enough
    for real value distributions."""
    from pyspark.sql import Window

    n_buckets = 1024
    li = t(spark, sf_dir, "lineitem")
    stats = (
        li.groupBy("l_returnflag")
        .agg(F.round(F.corr("l_extendedprice", "l_quantity"), 6)
             .alias("price_qty_corr"),
             F.round(F.covar_samp("l_extendedprice", "l_quantity"), 4)
             .alias("price_qty_covar"),
             F.count("l_extendedprice").alias("_n"),
             F.min("l_extendedprice").alias("_lo"),
             F.max("l_extendedprice").alias("_hi"))
    )
    vals = (li.select("l_returnflag", "l_extendedprice")
            .filter(F.col("l_extendedprice").isNotNull()))
    rng = stats.select("l_returnflag", "_n", "_lo", "_hi")
    width = (F.col("_hi") - F.col("_lo")) / n_buckets
    # ANSI-safe: degenerate flags (all prices equal → width 0) land in
    # bucket 0; fp edge x == _hi clamps into the last bucket.
    bucket = F.when(
        width > 0,
        F.least(F.lit(n_buckets - 1),
                F.floor((F.col("l_extendedprice") - F.col("_lo")) / width)
                .cast("int"))).otherwise(F.lit(0))
    bk = vals.join(F.broadcast(rng), "l_returnflag").withColumn("_b", bucket)
    hist = bk.groupBy("l_returnflag", "_b").agg(F.count("*").alias("_c"))
    w_off = (Window.partitionBy("l_returnflag").orderBy("_b")
             .rowsBetween(Window.unboundedPreceding, -1))
    boff = hist.withColumn("_off", F.coalesce(F.sum("_c").over(w_off), F.lit(0)))
    pos = rng.select("l_returnflag",
                     ((F.col("_n") - 1) * 0.5).alias("pos_m"),
                     ((F.col("_n") - 1) * 0.9).alias("pos_p"))

    def _holds(p):
        return ((F.floor(p) >= F.col("_off"))
                & (F.floor(p) < F.col("_off") + F.col("_c"))) | \
               ((F.ceil(p) >= F.col("_off"))
                & (F.ceil(p) < F.col("_off") + F.col("_c")))

    tgt = (boff.join(F.broadcast(pos), "l_returnflag")
           .filter(_holds(F.col("pos_m")) | _holds(F.col("pos_p")))
           .select("l_returnflag", "_b", "_off", "pos_m", "pos_p"))
    w_loc = Window.partitionBy("l_returnflag", "_b").orderBy("l_extendedprice")
    ranked = (bk.join(F.broadcast(tgt), ["l_returnflag", "_b"])
              .withColumn("_i", F.row_number().over(w_loc) - 1 + F.col("_off")))
    i = F.col("_i")
    boundary = ranked.filter(
        (i == F.floor("pos_m")) | (i == F.ceil("pos_m"))
        | (i == F.floor("pos_p")) | (i == F.ceil("pos_p")))
    px = F.col("l_extendedprice")
    qagg = (
        boundary.groupBy("l_returnflag")
        .agg(F.max(F.when(i == F.floor("pos_m"), px)).alias("m_lo"),
             F.max(F.when(i == F.ceil("pos_m"), px)).alias("m_hi"),
             F.max(F.when(i == F.floor("pos_p"), px)).alias("p_lo"),
             F.max(F.when(i == F.ceil("pos_p"), px)).alias("p_hi"),
             F.first("pos_m").alias("pm"),
             F.first("pos_p").alias("pp"))
        .select(
            "l_returnflag",
            F.round(F.col("m_lo") + (F.col("m_hi") - F.col("m_lo"))
                    * (F.col("pm") - F.floor("pm")), 4).alias("median_price"),
            F.round(F.col("p_lo") + (F.col("p_hi") - F.col("p_lo"))
                    * (F.col("pp") - F.floor("pp")), 4).alias("p90_price"))
    )
    return (
        stats.drop("_n")
        .join(qagg, "l_returnflag")
        .select("l_returnflag", "price_qty_corr", "price_qty_covar",
                "median_price", "p90_price")
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------- q50
@register(
    "q50_robust_outliers",
    oracle=f"""
    WITH monthly AS ({MONTHLY_SQL}),
    p AS (
      SELECT year, month_num,
             CASE WHEN lag(export_usd) OVER (ORDER BY year, month_num) IS NOT NULL
                   AND lag(export_usd) OVER (ORDER BY year, month_num) <> 0
                  THEN round((export_usd / lag(export_usd) OVER (ORDER BY year, month_num) - 1) * 100, 2)
             END AS pct
      FROM monthly
    ),
    med AS (SELECT median(pct) AS m FROM p),
    mad AS (SELECT median(abs(pct - m)) AS d FROM p, med)
    SELECT year, month_num, pct
    FROM p, med, mad
    WHERE pct IS NOT NULL AND abs(pct - m) > 3 * 1.4826 * d
    ORDER BY year, month_num
    """,
    tags=("Y1-robust",),
)
def q50_robust_outliers(spark, sf_dir):
    """Median/MAD outlier detection — the robust alternative to the 2σ
    rule (SURVEY §2.9 Y1 scale note): unaffected by the outliers it
    hunts. Same reduce-broadcast-filter shape as q27."""
    from sunat_rree_demo_spark.operators.windows import pct_change, series_window

    m = monthly_flows(spark, sf_dir)
    w = series_window()
    p = m.select("year", "month_num",
                 pct_change("export_usd", 1, w).alias("pct"))
    med = p.agg(F.expr("median(pct)").alias("m"))
    mad = (p.crossJoin(F.broadcast(med))
           .agg(F.expr("median(abs(pct - m))").alias("d")))
    return (
        p.crossJoin(F.broadcast(med)).crossJoin(F.broadcast(mad))
        .filter(F.col("pct").isNotNull()
                & (F.abs(F.col("pct") - F.col("m")) > 3 * 1.4826 * F.col("d")))
        .select("year", "month_num", "pct")
        .orderBy("year", "month_num")
    )


# ---------------------------------------------------------------------- q51
_TOKS = "string_split_regex(trim(text), '\\s+')"


@register(
    "q51_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.term,
             round(avg(tf.tf * ln(CAST(n_docs AS DOUBLE) / df.df)), 6) AS avg_tfidf
      FROM tf JOIN df ON tf.term = df.term, n
      GROUP BY tf.term
    )
    SELECT term, avg_tfidf
    FROM scored
    ORDER BY avg_tfidf DESC, term
    LIMIT 10
    """,
    tags=("text", "tfidf"),
)
def q51_tfidf_top_terms(spark, sf_dir):
    """TF-IDF term weighting: tf per (doc, term), idf = ln(N/df),
    corpus-wide top-10 terms by mean tf·idf. Three hash aggregates and
    a broadcast of the (term, df) side — no ml.feature pipeline needed,
    and every step is map-side combined. The corpus size enters the
    plan as a broadcast 1-row frame (like q27/q50's scalar params) —
    never an eager ``d.count()`` baked in as a literal, which would run
    a driver-side job per plan construction."""
    from sunat_rree_demo_spark.operators.text import tokens

    d = t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.agg(F.count("*").cast("double").alias("n_docs"))
    return (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
        .groupBy("term")
        .agg(F.round(F.avg("tfidf"), 6).alias("avg_tfidf"))
        .orderBy(F.desc("avg_tfidf"), F.asc("term"))
        .limit(10)
    )


# ---------------------------------------------------------------------- q52
@register(
    "q52_json_map_explode",
    oracle="""
    WITH kv AS (
      SELECT event_type,
             unnest(json_keys(props)) AS key,
             CAST(json_extract_string(props, '$.' || unnest(json_keys(props))) AS BIGINT) AS val
      FROM events
    )
    SELECT event_type, key,
           count(*) AS n,
           round(avg(val), 4) AS avg_val
    FROM kv
    GROUP BY event_type, key
    ORDER BY event_type, key
    """,
    tags=("json", "map-explode"),
)
def q52_json_map_explode(spark, sf_dir):
    """Parse the JSON props into a typed map (from_json) and explode it —
    the schema-full counterpart of get_json_object path extraction
    (q34)."""
    e = t(spark, sf_dir, "events")
    kv = (
        e.select("event_type",
                 F.explode(F.from_json("props", "map<string,bigint>"))
                 .alias("key", "val"))
    )
    return (
        kv.groupBy("event_type", "key")
        .agg(F.count("*").alias("n"), F.round(F.avg("val"), 4).alias("avg_val"))
        .orderBy("event_type", "key")
    )


# ---------------------------------------------------------------------- q53
@register(
    "q53_cube",
    oracle=f"""
    WITH monthly AS ({MONTHLY_SQL}),
    q AS (
      SELECT year, CAST(floor((month_num - 1) / 3 + 1) AS INT) AS quarter,
             export_usd
      FROM monthly
    )
    SELECT year, quarter,
           round(sum(export_usd), 2) AS exports,
           CAST(grouping(year) AS INT) AS g_year,
           CAST(grouping(quarter) AS INT) AS g_quarter
    FROM q
    GROUP BY CUBE(year, quarter)
    ORDER BY g_year, g_quarter, year, quarter
    """,
    tags=("A12-cube",),
)
def q53_cube(spark, sf_dir):
    """CUBE(year, quarter): all four subtotal levels in one aggregation
    — the full grouping-sets lattice (SURVEY §2.4 A12 general form)."""
    m = monthly_flows(spark, sf_dir).withColumn(
        "quarter", F.floor((F.col("month_num") - 1) / 3 + 1).cast("int"))
    return (
        m.cube("year", "quarter")
        .agg(F.round(F.sum("export_usd"), 2).alias("exports"),
             F.grouping("year").cast("int").alias("g_year"),
             F.grouping("quarter").cast("int").alias("g_quarter"))
        .orderBy("g_year", "g_quarter", "year", "quarter")
    )


# --------------------------------------------------------------------- q109
@register(
    "q109_weighted_median",
    oracle="""
    WITH g AS (
      SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    c AS (
      SELECT flag, cents, w,
             CAST(sum(w) OVER (PARTITION BY flag ORDER BY cents
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw,
             CAST(sum(w) OVER (PARTITION BY flag) AS BIGINT) AS tot
      FROM g
    )
    SELECT flag,
           CAST(min(cents) AS BIGINT) / 100.0 AS median_usd,
           CAST(min(tot) AS BIGINT) AS total_qty
    FROM c WHERE 2 * cumw >= tot
    GROUP BY flag ORDER BY flag
    """,
    tags=("stats", "weighted-median"),
)
def q109_weighted_median(spark, sf_dir):
    """Quantity-weighted median price per return flag: the smallest
    price whose cumulative weight reaches half the total (lower
    weighted median — a pure integer definition, so both engines pick
    the identical value with no interpolation ambiguity).

    Scale shape: the facts first collapse to the (flag, cents)
    VALUE-HISTOGRAM grain — bounded by the price domain (≤ ~10⁷
    distinct cent values regardless of row count) — and the cumulative
    window runs over that histogram, not the facts. For value domains
    too large even for that, the two-pass percentile refinement
    (q49/q73/q83) is the documented alternative; for weights the
    histogram is the standard exact form."""
    li = t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    g = (li.groupBy(F.col("l_returnflag").alias("flag"),
                    cents.alias("cents"))
         .agg(F.sum(F.col("l_quantity").cast("bigint"))
              .cast("bigint").alias("w")))
    wf = Window.partitionBy("flag")
    c = g.select(
        "flag", "cents",
        F.sum("w").over(wf.orderBy("cents")
                        .rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint").alias("cumw"),
        F.sum("w").over(wf).cast("bigint").alias("tot"))
    return (
        c.filter(2 * F.col("cumw") >= F.col("tot"))
        .groupBy("flag")
        .agg((F.min("cents").cast("bigint") / 100.0).alias("median_usd"),
             F.min("tot").cast("bigint").alias("total_qty"))
        .orderBy("flag")
    )
