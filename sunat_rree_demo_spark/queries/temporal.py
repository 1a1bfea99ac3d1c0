"""Temporal-join surface: calendar-offset YoY (the alternative to the
reference's row-offset semantics, SURVEY.md §7.3), as-of join, and a
date-range join — the SURVEY §7.4 join extensions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sunat_rree_demo_spark.operators.joins import asof_join
from sunat_rree_demo_spark.queries.base import MONTHLY_SQL, monthly_flows, register, t


# ---------------------------------------------------------------------- q55
@register(
    "q55_calendar_yoy",
    oracle=f"""
    WITH monthly AS ({MONTHLY_SQL})
    SELECT a.year, a.month_num, a.export_usd,
           CASE WHEN b.export_usd IS NOT NULL AND b.export_usd <> 0
                THEN round((a.export_usd / b.export_usd - 1) * 100, 2)
           END AS yoy_calendar
    FROM monthly a
    LEFT JOIN monthly b
      ON b.year = a.year - 1 AND b.month_num = a.month_num
    ORDER BY a.year, a.month_num
    """,
    tags=("W2-calendar", "J2"),
)
def q55_calendar_yoy(spark, sf_dir):
    """Calendar-offset YoY: same-month-last-year via a self equi-join on
    (year−1, month_num) — the semantically-correct alternative the
    engine offers alongside the reference-faithful row-offset lag
    (q24); with gappy months the two genuinely differ (SURVEY §7.3)."""
    m = monthly_flows(spark, sf_dir)
    a = m.alias("a")
    b = m.select(F.col("year").alias("_py"), F.col("month_num").alias("_pm"),
                 F.col("export_usd").alias("_pexp"))
    prev = F.col("_pexp")
    return (
        a.join(F.broadcast(b),
               (F.col("_py") == F.col("a.year") - 1)
               & (F.col("_pm") == F.col("a.month_num")), "left")
        .select(
            F.col("a.year").alias("year"),
            F.col("a.month_num").alias("month_num"),
            F.col("a.export_usd").alias("export_usd"),
            F.when(prev.isNotNull() & (prev != 0),
                   F.round((F.col("a.export_usd") / prev - 1) * 100, 2))
            .alias("yoy_calendar"),
        )
        .orderBy("year", "month_num")
    )


# ---------------------------------------------------------------------- q56
@register(
    "q56_asof_join",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE NULL END AS is_l,
             CASE WHEN event_type = 'click' THEN event_id END AS click_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS side
      FROM events
      WHERE event_type IN ('purchase', 'click')
    ),
    filled AS (
      SELECT user_id, ts, event_id, is_l,
             last_value(click_id IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, side, click_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_id
      FROM tagged
    )
    SELECT user_id, event_id AS purchase_id, last_click_id
    FROM filled
    WHERE is_l = 1
    ORDER BY user_id, purchase_id
    """,
    tags=("asof-join",),
)
def q56_asof_join(spark, sf_dir):
    """As-of join: each purchase matched to the user's most recent
    prior-or-simultaneous click — union-merge implementation, one
    shuffle+sort on (user, ts), no range scan (operators.joins.
    asof_join)."""
    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase") \
        .select("user_id", "ts", "event_id")
    clicks = e.filter(F.col("event_type") == "click") \
        .select("user_id", "ts", "event_id")
    out = asof_join(purchases, clicks, on=["user_id"], order_col="ts",
                    right_cols=["event_id"])
    return (
        out.select("user_id",
                   F.col("event_id").alias("purchase_id"),
                   F.col("event_id_asof").alias("last_click_id"))
        .orderBy("user_id", "purchase_id")
    )


# ---------------------------------------------------------------------- q57
@register(
    "q57_range_join",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS year,
           count(*) AS n_shipments,
           round(avg(date_diff('day', o.o_orderdate, l.l_shipdate)), 4)
             AS avg_ship_delay_days
    FROM orders o
    JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <= o.o_orderdate + INTERVAL 90 DAY
    GROUP BY 1
    ORDER BY year
    """,
    tags=("range-join",),
)
def q57_range_join(spark, sf_dir):
    """Equi + date-range join (shipments within 90 days of order):
    the range predicate rides the equi-join shuffle as a post-join
    filter — no nested-loop; a pure range join (no equi key) would
    bucket time into bands and equi-join on the band."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    j = li.join(o, (li.l_orderkey == o.o_orderkey)
                & (li.l_shipdate >= o.o_orderdate)
                & (li.l_shipdate <= F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")))
    return (
        j.groupBy(F.year("o_orderdate").cast("bigint").alias("year"))
        .agg(F.count("*").alias("n_shipments"),
             F.round(F.avg(F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))), 4)
             .alias("avg_ship_delay_days"))
        .orderBy("year")
    )


# ---------------------------------------------------------------------- q81
@register(
    "q81_scd2_intervals",
    oracle="""
    SELECT user_id,
           event_id,
           round(value, 2) AS value,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S') AS valid_to,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM events
    WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, valid_from, event_id
    """,
    tags=("temporal", "scd2"),
)
def q81_scd2_intervals(spark, sf_dir):
    """Slowly-changing-dimension type-2 build: turn a change stream
    (each purchase sets a user's current value) into effective-dated
    interval rows — valid_from/valid_to half-open ranges with an
    is_current flag. The standard warehouse temporal-table
    materialization, ready for the as-of join (q56) to probe.

    Scale shape: one window partitioned by the high-cardinality
    user_id (corpus-proportional keys → even partitions, no global
    sort); the event_id tiebreak makes simultaneous timestamps
    deterministic on both engines. Timestamps emit as formatted
    strings for engine-neutral comparison (same device as q30)."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return (
        e.select(
            "user_id", "event_id",
            F.round("value", 2).alias("value"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
            F.date_format(nxt, "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
            nxt.isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from", "event_id")
    )


# ---------------------------------------------------------------------- q87
@register(
    "q87_gap_fill",
    oracle="""
    WITH bounds AS (SELECT min(ts::DATE) AS lo, max(ts::DATE) AS hi
                    FROM events),
    days AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE
               AS day FROM bounds),
    users AS (SELECT DISTINCT user_id FROM events),
    daily AS (
      SELECT user_id, day, value FROM (
        SELECT user_id, ts::DATE AS day, value,
               row_number() OVER (PARTITION BY user_id, ts::DATE
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase') WHERE rn = 1
    ),
    grid AS (
      SELECT g.user_id, g.day, daily.value
      FROM (SELECT u.user_id, d.day FROM users u, days d) g
      LEFT JOIN daily USING (user_id, day)
    )
    SELECT user_id,
           strftime(day, '%Y-%m-%d') AS day,
           round(last_value(value IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 2) AS value,
           (value IS NULL AND last_value(value IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              IS NOT NULL) AS filled
    FROM grid
    ORDER BY user_id, day
    """,
    tags=("temporal", "gap-fill"),
)
def q87_gap_fill(spark, sf_dir):
    """Calendar gap-fill + forward-fill (time-series densification):
    build the complete user × day spine and carry each user's last
    purchase value forward across days with no activity, flagging the
    filled rows — the densify/LOCF op every monitoring warehouse runs.

    Scale shape: the spine derives from a broadcast 1-row min/max
    frame (no eager aggregation on the driver) crossed with the
    distinct-user reduction; the last-wins pick and the forward-fill
    window both partition on the high-cardinality user_id. Day grain
    is calendar-bounded, so the spine is |users| × |days| — linear in
    users, never events²."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    bounds = ev.agg(F.min(F.to_date("ts")).alias("lo"),
                    F.max(F.to_date("ts")).alias("hi"))
    days = (F.broadcast(bounds)
            .select(F.explode(F.sequence("lo", "hi")).alias("day")))
    users = ev.select("user_id").distinct()
    w_pick = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    daily = (ev.filter(F.col("event_type") == "purchase")
             .withColumn("day", F.to_date("ts"))
             .withColumn("_rn", F.row_number().over(w_pick))
             .filter(F.col("_rn") == 1)
             .select("user_id", "day", "value"))
    grid = users.crossJoin(days).join(daily, ["user_id", "day"], "left")
    w_fill = (Window.partitionBy("user_id").orderBy("day")
              .rowsBetween(Window.unboundedPreceding, 0))
    carried = F.last("value", ignorenulls=True).over(w_fill)
    return (
        grid.select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round(carried, 2).alias("value"),
            (F.col("value").isNull() & carried.isNotNull()).alias("filled"),
        )
        .orderBy("user_id", "day")
    )


# --------------------------------------------------------------------- q111
@register(
    "q111_linear_interpolation",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
        AND user_id % 25 = 0
    ),
    bounds AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS lo,
             date_trunc('hour', max(ts)) AS hi
      FROM ev GROUP BY 1
    ),
    spine AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
               AS ts
      FROM bounds
    ),
    merged AS (
      SELECT user_id, ts, CAST(0 AS BIGINT) AS src, event_id, value
      FROM ev
      UNION ALL
      SELECT user_id, ts, CAST(1 AS BIGINT) AS src,
             CAST(0 AS BIGINT) AS event_id, CAST(NULL AS DOUBLE) AS value
      FROM spine
    ),
    w AS (
      SELECT user_id, ts, src, value,
             last_value(value IGNORE NULLS) OVER wp AS vp,
             last_value(CASE WHEN src = 0 THEN epoch_us(ts) END
                        IGNORE NULLS) OVER wp AS tp,
             first_value(value IGNORE NULLS) OVER wn AS vn,
             first_value(CASE WHEN src = 0 THEN epoch_us(ts) END
                         IGNORE NULLS) OVER wn AS tn
      FROM merged
      WINDOW wp AS (PARTITION BY user_id ORDER BY ts, src, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wn AS (PARTITION BY user_id ORDER BY ts, src, event_id
                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_hour,
           round(vp + (vn - vp)
                 * (CAST(epoch_us(ts) - tp AS DOUBLE)
                    / CAST(tn - tp AS DOUBLE)), 4) AS value_interp
    FROM w
    WHERE src = 1 AND vp IS NOT NULL AND vn IS NOT NULL
    ORDER BY user_id, ts_hour
    """,
    tags=("temporal", "interpolation"),
)
def q111_linear_interpolation(spark, sf_dir):
    """Time-weighted LINEAR interpolation onto an hourly spine (the
    IoT/finance densification q87's LOCF only approximates): for each
    sampled user, every spine hour strictly inside the observation
    range gets vp + (vn−vp)·(t−tp)/(tn−tp) from the bracketing
    purchase events.

    Determinism: prev/next picks are IGNORE NULLS window extrema over
    the (ts, src) total order — events sort before spine points at the
    same timestamp, so a spine hour landing exactly on an event
    interpolates to that event's value; the ratio divides exact
    microsecond integers and the surrounding doubles are
    parquet-identical, so both engines emit the same 4dp value.

    Scale shape: the spine derives from per-user min/max bounds (one
    user-grain aggregate, no driver work) and everything else is two
    frames of ONE user-partitioned window — the spine explode is
    user-bounded (hours in range), and the user sample (%25) bounds
    output volume; production would densify per shard with the same
    plan."""
    from pyspark.sql import Window

    ev = (t(spark, sf_dir, "events")
          .filter((F.col("event_type") == "purchase")
                  & F.col("value").isNotNull()
                  & (F.col("user_id") % 25 == 0))
          .select("user_id", "ts", "event_id", "value"))
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"))
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR")))
        .alias("ts"))
    merged = (
        ev.select("user_id", "ts", F.lit(0).cast("bigint").alias("src"),
                  F.col("event_id").cast("bigint").alias("event_id"),
                  "value")
        .unionByName(spine.select(
            "user_id", "ts", F.lit(1).cast("bigint").alias("src"),
            F.lit(0).cast("bigint").alias("event_id"),
            F.lit(None).cast("double").alias("value"))))
    # (ts, src, event_id) is a TOTAL order: same-ts purchases are
    # disambiguated by event_id (the q85/q81 convention), so the
    # bracketing extrema can't flip between runs or engines
    base = Window.partitionBy("user_id").orderBy("ts", "src", "event_id")
    wp = base.rowsBetween(Window.unboundedPreceding, 0)
    wn = base.rowsBetween(1, Window.unboundedFollowing)
    ev_us = F.when(F.col("src") == 0, F.unix_micros("ts"))
    w = merged.select(
        "user_id", "ts", "src",
        F.last("value", ignorenulls=True).over(wp).alias("vp"),
        F.last(ev_us, ignorenulls=True).over(wp).alias("tp"),
        F.first("value", ignorenulls=True).over(wn).alias("vn"),
        F.first(ev_us, ignorenulls=True).over(wn).alias("tn"))
    interp = (F.col("vp") + (F.col("vn") - F.col("vp"))
              * ((F.unix_micros("ts") - F.col("tp")).cast("double")
                 / (F.col("tn") - F.col("tp")).cast("double")))
    return (
        w.filter((F.col("src") == 1) & F.col("vp").isNotNull()
                 & F.col("vn").isNotNull())
        .select("user_id",
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_hour"),
                F.round(interp, 4).alias("value_interp"))
        .orderBy("user_id", "ts_hour")
    )
