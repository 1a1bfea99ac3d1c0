"""Event-stream queries (batch form; SURVEY.md §2.10 / §7.4 extension
surface — the reference is pure batch, so these enter via the driver's
``events`` table). The Structured Streaming variants of the same
operators live in ``sunat_rree_demo_spark.streaming`` — identical window
semantics, verified here in batch against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from sunat_rree_demo_spark.queries.base import register, t

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


# ---------------------------------------------------------------------- q30
@register(
    "q30_tumbling_hourly",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '{_TS_FMT_DUCK}') AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
    tags=("streaming", "tumbling-window"),
)
def q30_tumbling_hourly(spark, sf_dir):
    """Tumbling 1-hour window aggregation via F.window — the exact
    batch twin of the streaming tumbling agg
    (streaming/events.py:tumbling_counts). Window start emitted as a
    formatted string for engine-neutral comparison."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.date_format("w.start", _TS_FMT_SPARK).alias("window_start"),
                "event_type", "n_events", "total_value")
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------- q31
@register(
    "q31_sliding_windows",
    oracle=f"""
    WITH x AS (
      SELECT unnest([date_trunc('hour', ts),
                     date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws,
             value
      FROM events
    )
    SELECT strftime(ws, '{_TS_FMT_DUCK}') AS window_start,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM x
    GROUP BY 1
    ORDER BY window_start
    """,
    tags=("streaming", "sliding-window"),
)
def q31_sliding_windows(spark, sf_dir):
    """Sliding 2h/1h window aggregation (each event lands in two
    epoch-aligned windows) — F.window(slideDuration) in batch; the
    oracle materializes the same two memberships explicitly."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.date_format("w.start", _TS_FMT_SPARK).alias("window_start"),
                "n_events", "total_value")
        .orderBy("window_start")
    )


# ---------------------------------------------------------------------- q32
@register(
    "q32_sessionization",
    oracle="""
    WITH ev AS (SELECT user_id, epoch_ms(ts) AS tms FROM events),
    g AS (
      SELECT user_id,
             CASE WHEN lag(tms) OVER w IS NULL
                    OR tms - lag(tms) OVER w > 1800000
                  THEN 1 ELSE 0 END AS new_session
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY tms)
    )
    SELECT user_id,
           CAST(sum(new_session) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM g
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("streaming", "session-window"),
)
def q32_sessionization(spark, sf_dir):
    """Sessionization with a 30-min inactivity gap — the classic
    gaps-and-islands window form in batch; the streaming twin uses
    F.session_window (streaming/events.py). Millisecond epoch keeps the
    gap arithmetic integer-exact across engines."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("tms")
    ev = e.select("user_id", F.unix_millis("ts").alias("tms"))
    prev = F.lag("tms").over(w)
    g = ev.withColumn(
        "new_session",
        F.when(prev.isNull() | (F.col("tms") - prev > 1800000), 1).otherwise(0))
    return (
        g.groupBy("user_id")
        .agg(F.sum("new_session").cast("bigint").alias("n_sessions"),
             F.count("*").alias("n_events"))
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------- q33
@register(
    "q33_event_dedup",
    oracle="""
    SELECT user_id, event_type, event_id, round(value, 4) AS value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) = 1
    ORDER BY user_id, event_type
    """,
    tags=("streaming", "dedup"),
)
def q33_event_dedup(spark, sf_dir):
    """Keep-first dedup per (user, event_type) — deterministic
    row_number form of dropDuplicates (the streaming twin is
    dropDuplicates + watermark). Tiebreak on event_id pins ties."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "event_type", "event_id",
                F.round("value", 4).alias("value"))
        .orderBy("user_id", "event_type")
    )


# ---------------------------------------------------------------------- q34
@register(
    "q34_json_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           round(avg(CAST(props->>'$.k' AS BIGINT)), 4) AS avg_k,
           CAST(sum(CASE WHEN CAST(props->>'$.k' AS BIGINT) > 50
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("json", "X-family"),
)
def q34_json_extract(spark, sf_dir):
    """JSON extraction from the props column (get_json_object ↔
    DuckDB ->> with a JSONPath) feeding a grouped aggregate."""
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.select("event_type", k.alias("_k"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.avg("_k"), 4).alias("avg_k"),
             F.sum(F.when(F.col("_k") > 50, 1).otherwise(0)).alias("n_high"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------- q78
@register(
    "q78_click_attribution",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           p.value AS purchase_value,
           (epoch_us(p.ts) - epoch_us(c.ts)) / 1000000.0 AS lag_sec
    FROM events c
    JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    ORDER BY click_id, purchase_id
    """,
    tags=("streaming", "interval-join", "attribution"),
)
def q78_click_attribution(spark, sf_dir):
    """Batch twin of the stream-stream interval join
    (streaming/events.py:click_purchase_attribution): every purchase
    attributed to same-user clicks in the preceding hour. In batch the
    watermarks are no-ops and Catalyst plans a plain time-bounded join
    shuffled once on user_id; in streaming the same expression becomes
    a watermarked two-stream join with bounded state. lag_sec is exact
    integer-microsecond arithmetic over one double division — no
    rounding needed for parity."""
    from sunat_rree_demo_spark.streaming.events import (
        click_purchase_attribution,
    )

    e = t(spark, sf_dir, "events")
    return (click_purchase_attribution(e)
            .orderBy("click_id", "purchase_id"))


# ---------------------------------------------------------------------- q94
@register(
    "q94_rolling_active_users",
    oracle="""
    WITH act AS (SELECT DISTINCT ts::DATE AS day, user_id FROM events),
    days AS (SELECT DISTINCT day FROM act)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           count(DISTINCT a.user_id) AS wau
    FROM days d JOIN act a ON a.day BETWEEN d.day - 6 AND d.day
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("events", "rolling-distinct"),
)
def q94_rolling_active_users(spark, sf_dir):
    """7-day rolling distinct active users (WAU) — the rolling-DISTINCT
    aggregate that window frames cannot express (COUNT(DISTINCT) is not
    a frameable function on either engine): each anchor day range-joins
    the preceding week of the deduped (day, user) activity grid and
    dedups users inside the group.

    Scale shape: activity is a (day, user) reduction of the events.
    The window membership is stated as an EXPLODED equi-join, not a
    range predicate: each activity row generates its ≤7 anchor days
    (sequence + explode — fan-out exactly the window width) and
    equi-joins the broadcast calendar of observed days, so the plan is
    a BroadcastHashJoin; the range-predicate formulation planned as a
    BroadcastNestedLoopJoin whose compare cost is |activity|×|days|.
    The distinct-count aggregate shuffles on the calendar-bounded
    anchor. For windows too wide to fan out, the sketch path is
    per-day HLL/KMV merged across the window (mergeability is exactly
    why q91's KMV matters)."""
    ev = t(spark, sf_dir, "events")
    act = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = act.select(F.col("day").alias("anchor")).distinct()
    fanned = act.select(
        "user_id",
        F.explode(F.sequence("day", F.date_add("day", 6))).alias("anchor"))
    return (
        fanned.join(F.broadcast(days), "anchor")
        .groupBy(F.date_format("anchor", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("wau"))
        .orderBy("day")
    )


# --------------------------------------------------------------------- q113
@register(
    "q113_click_attribution_outer",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           p.value AS purchase_value,
           (epoch_us(p.ts) - epoch_us(c.ts)) / 1000000.0 AS lag_sec
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = c.user_id
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    ORDER BY click_id, purchase_id
    """,
    tags=("streaming", "interval-join", "attribution", "outer"),
)
def q113_click_attribution_outer(spark, sf_dir):
    """Batch twin of the LEFT-OUTER stream-stream interval join
    (streaming/events.py:click_purchase_attribution_outer): every
    click, attributed or not — the funnel-loss grain. In batch the
    outer join emits NULL purchase rows immediately; in streaming the
    same expression holds them until the watermark closes the click's
    horizon (documented on the operator, pinned by the e2e test)."""
    from sunat_rree_demo_spark.streaming.events import (
        click_purchase_attribution_outer,
    )

    e = t(spark, sf_dir, "events")
    return (click_purchase_attribution_outer(e)
            .orderBy("click_id", "purchase_id"))


# --------------------------------------------------------------------- q125
@register(
    "q125_cohort_ltv",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    fm AS (
      SELECT user_id, min(date_trunc('month', ts)) AS m0
      FROM p GROUP BY 1
    ),
    sz AS (SELECT m0, CAST(count(*) AS BIGINT) AS n_users FROM fm
           GROUP BY 1),
    r AS (
      SELECT f.m0,
             CAST((year(ts) * 12 + month(ts))
                  - (year(f.m0) * 12 + month(f.m0)) AS BIGINT) AS age,
             CAST(sum(cents) AS BIGINT) AS cents
      FROM p JOIN fm f USING (user_id)
      GROUP BY 1, 2
    ),
    c AS (
      SELECT m0, age,
             CAST(sum(cents) OVER (PARTITION BY m0 ORDER BY age
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM r
    )
    SELECT strftime(c.m0, '%Y-%m') AS cohort, age, n_users,
           round(CAST(cum AS DOUBLE) / 100.0, 2) AS cum_revenue,
           CAST((2 * cum + n_users) // (2 * n_users) AS BIGINT) / 100.0
             AS ltv_per_user
    FROM c JOIN sz USING (m0)
    ORDER BY cohort, age
    """,
    tags=("events", "cohort", "ltv"),
)
def q125_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value curves: users grouped by first-purchase
    month, cumulative revenue per cohort at each month age, and LTV
    per user — the unit-economics report behind every retention deck
    (q86's counting triangle with money on it).

    Determinism: revenue is integer cents end to end, the cumulative
    window sums integers in a fixed order, and LTV-per-user is the
    integer half-up division. Scale shape: first-purchase and per-user
    revenue share the user_id partitioning; the (cohort, age) frame is
    calendar²-bounded, so its cumulative window costs nothing at any
    corpus size."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    p = (ev.filter((F.col("event_type") == "purchase")
                   & F.col("value").isNotNull())
         .select("user_id", "ts",
                 F.round(F.col("value") * 100, 0).cast("bigint")
                 .alias("cents")))
    fm = p.groupBy("user_id").agg(
        F.date_trunc("month", F.min("ts")).alias("m0"))
    sz = fm.groupBy("m0").agg(F.count("*").cast("bigint").alias("n_users"))
    mon = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    r = (p.join(fm, "user_id")
         .groupBy("m0", (mon(F.col("ts")) - mon(F.col("m0")))
                  .cast("bigint").alias("age"))
         .agg(F.sum("cents").cast("bigint").alias("cents")))
    cum = (F.sum("cents")
           .over(Window.partitionBy("m0").orderBy("age")
                 .rowsBetween(Window.unboundedPreceding, 0))
           .cast("bigint"))
    return (
        r.select("m0", "age", cum.alias("cum"))
        .join(sz, "m0")
        .select(F.date_format("m0", "yyyy-MM").alias("cohort"), "age",
                "n_users",
                F.round(F.col("cum").cast("double") / 100.0, 2)
                .alias("cum_revenue"),
                (F.expr("(2 * cum + n_users) div (2 * n_users)")
                 .cast("bigint") / 100.0).alias("ltv_per_user"))
        .orderBy("cohort", "age")
    )


#: q136 path prefix length and result size.
PATH_LEN = 5
TOP_PATHS = 10


# --------------------------------------------------------------------- q136
@register(
    "q136_top_event_paths",
    oracle=f"""
    WITH r AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    p AS (
      SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      FROM r WHERE rn <= {PATH_LEN} GROUP BY user_id
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_users
    FROM p GROUP BY 1
    ORDER BY n_users DESC, path LIMIT {TOP_PATHS}
    """,
    tags=("events", "sequence-mining"),
)
def q136_top_event_paths(spark, sf_dir):
    """Top-10 most common 5-event opening paths across users — the
    sequential-pattern view of the event log (the funnel query q77
    checks ONE fixed path; this mines which paths actually happen).
    Event order is total: (ts, event_id) breaks timestamp ties
    identically in both engines, and the path top-k tiebreaks on the
    path string.

    Scale shape: one shuffle on user_id for the ordering window (the
    same partitioning q32/q77/q85 use — user-grain, uniform), the
    prefix filter drops everything past rank 5 BEFORE the path
    aggregate, and the path count is a second uniform-key shuffle whose
    cardinality is bounded by |event_type|^5, with map-side combine."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = (e.select("user_id", "event_type", "ts", "event_id")
         .withColumn("rn", F.row_number().over(w))
         .filter(F.col("rn") <= PATH_LEN))
    p = (r.groupBy("user_id")
         .agg(F.array_join(
             F.transform(
                 F.array_sort(F.collect_list(
                     F.struct("rn", F.col("event_type").alias("et")))),
                 lambda s: s["et"]),
             ">").alias("path")))
    return (
        p.groupBy("path").agg(F.count("*").cast("bigint").alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(TOP_PATHS)
    )


#: q141 attribution lookback (24 h in ms).
ATTR_WINDOW_MS = 86400000


# --------------------------------------------------------------------- q141
@register(
    "q141_multi_touch_attribution",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, event_type, epoch_ms(ts) AS tms
      FROM events
    ),
    p AS (SELECT event_id AS purchase_id, user_id, tms FROM e
          WHERE event_type = 'purchase'),
    c AS (SELECT event_id AS click_id, user_id, tms FROM e
          WHERE event_type = 'click'),
    j AS (
      SELECT p.purchase_id, c.click_id, c.tms
      FROM p JOIN c ON p.user_id = c.user_id
       AND c.tms >= p.tms - {ATTR_WINDOW_MS} AND c.tms < p.tms
    ),
    f AS (SELECT purchase_id, click_id AS first_click FROM (
            SELECT purchase_id, click_id,
                   row_number() OVER (PARTITION BY purchase_id
                                      ORDER BY tms, click_id) AS rn
            FROM j) WHERE rn = 1),
    l AS (SELECT purchase_id, click_id AS last_click FROM (
            SELECT purchase_id, click_id,
                   row_number() OVER (PARTITION BY purchase_id
                                      ORDER BY tms DESC, click_id DESC)
                     AS rn
            FROM j) WHERE rn = 1)
    SELECT p.purchase_id, p.user_id, f.first_click, l.last_click
    FROM p LEFT JOIN f USING (purchase_id) LEFT JOIN l USING (purchase_id)
    ORDER BY purchase_id
    """,
    tags=("events", "attribution"),
)
def q141_multi_touch_attribution(spark, sf_dir):
    """First-touch AND last-touch click attribution for every purchase:
    the user's earliest and latest click in the strictly-preceding 24 h
    — the two canonical marketing attribution models, emitted side by
    side ((tms, event_id) total order; purchases with no prior click
    surface with NULLs).

    Scale shape: the oracle (and the naive plan) joins purchases ×
    clicks and ranks per purchase — a fan-out join. The engine instead
    uses ONE user-partitioned window with a millisecond RANGE frame
    [-24h, -1ms): min/max over a click-only struct computes both models
    in a single pass over the unified event stream — no join, no
    fan-out, one shuffle on user_id; the same restatement that turned
    q131's NOT-EXISTS into a sweep. Struct (tms, event_id) min/max
    gives the identical lexicographic tiebreak the oracle's
    row_number uses."""
    e = t(spark, sf_dir, "events")
    ev = e.select("event_id", "user_id", "event_type",
                  F.unix_millis("ts").alias("tms"))
    click = F.when(F.col("event_type") == "click",
                   F.struct("tms", "event_id"))
    w = (Window.partitionBy("user_id").orderBy("tms")
         .rangeBetween(-ATTR_WINDOW_MS, -1))
    return (
        ev.withColumn("_first", F.min(click).over(w))
        .withColumn("_last", F.max(click).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), "user_id",
                F.col("_first.event_id").alias("first_click"),
                F.col("_last.event_id").alias("last_click"))
        .orderBy("purchase_id")
    )


#: 30-min inactivity gap shared by the sessionization family
#: (q32 counts, q169/q175 interval analytics) and their oracles.
SESSION_GAP_MS = 1_800_000


def gap_session_intervals(ev, gap_ms: int = SESSION_GAP_MS):
    """Gaps-and-islands session intervals over a (user_id, tms) frame:
    (user_id, sid, lo, hi) with hi = last event + ``gap_ms`` (the
    active-until-timeout window). ONE copy of the lag/flag/running-sum
    block q169 and q175 (and their oracles, in SQL) both build on."""
    w = Window.partitionBy("user_id").orderBy("tms")
    prev = F.lag("tms").over(w)
    flag = F.when(prev.isNull() | (F.col("tms") - prev > gap_ms),
                  1).otherwise(0)
    return (
        ev.withColumn("ns", flag)
        .withColumn("sid", F.sum("ns").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(F.min("tms").alias("lo"),
             (F.max("tms") + F.lit(gap_ms)).alias("hi"))
    )


# --------------------------------------------------------------------- q169
@register(
    "q169_concurrent_sessions",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, event_type, epoch_ms(ts) AS tms FROM events),
    g AS (
      SELECT user_id, tms,
             CASE WHEN lag(tms) OVER w IS NULL
                    OR tms - lag(tms) OVER w > 1800000
                  THEN 1 ELSE 0 END AS ns
      FROM ev WHERE event_type IN ('click', 'view')
      WINDOW w AS (PARTITION BY user_id ORDER BY tms)),
    s AS (
      SELECT user_id, tms,
             sum(ns) OVER (PARTITION BY user_id ORDER BY tms
                           ROWS UNBOUNDED PRECEDING) AS sid
      FROM g),
    sess AS (
      SELECT user_id, min(tms) AS lo, max(tms) + 1800000 AS hi
      FROM s GROUP BY user_id, sid),
    p AS (SELECT event_id, tms FROM ev WHERE event_type = 'purchase'),
    c AS (
      SELECT p.event_id,
             count(*) AS n_active_sessions,
             count(DISTINCT sess.user_id) AS n_active_users
      FROM p JOIN sess ON p.tms BETWEEN sess.lo AND sess.hi
      GROUP BY p.event_id)
    SELECT p.event_id,
           coalesce(c.n_active_sessions, 0) AS n_active_sessions,
           coalesce(c.n_active_users, 0) AS n_active_users
    FROM p LEFT JOIN c USING (event_id)
    ORDER BY p.event_id
    """,
    tags=("events", "range-join", "sessionization"),
)
def q169_concurrent_sessions(spark, sf_dir):
    """Platform concurrency at purchase time: for every purchase, how
    many click/view sessions (30-min gap, active until gap timeout)
    were in progress ANYWHERE on the site, and how many distinct users
    they belonged to — the load-at-conversion metric. Zero-filled for
    purchases landing in dead air.

    There is deliberately NO equi key between the sides (any user's
    session counts), so the naive plan is the O(n·m) nested-loop range
    join Spark would pick for a bare BETWEEN. The engine instead uses
    operators.range_join.point_in_interval_join: session intervals
    explode into the 1-hour epoch buckets they cover, purchases map to
    exactly one bucket, and an ordinary hash equi-join on the bucket id
    plus the BETWEEN residual yields each qualifying pair exactly once
    — shuffle-partitioned, AQE-splittable, no broadcast of an unbounded
    interval table. All arithmetic is integer epoch-millis, so bucket
    edges are exact on both engines."""
    from sunat_rree_demo_spark.operators.range_join import (
        point_in_interval_join,
    )

    e = t(spark, sf_dir, "events")
    ev = e.select("event_id", "user_id", "event_type",
                  F.unix_millis("ts").alias("tms"))
    sess = (gap_session_intervals(
        ev.filter(F.col("event_type").isin("click", "view")))
        .select("user_id", "lo", "hi"))
    purch = (ev.filter(F.col("event_type") == "purchase")
             .select("event_id", "tms"))
    pairs = point_in_interval_join(purch, sess, "tms", "lo", "hi",
                                   bucket_width=3_600_000)
    counts = (
        pairs.groupBy("event_id")
        .agg(F.count("*").alias("n_active_sessions"),
             F.countDistinct("user_id").alias("n_active_users"))
    )
    return (
        purch.select("event_id")
        .join(counts, "event_id", "left")
        .select("event_id",
                F.coalesce("n_active_sessions", F.lit(0))
                .cast("bigint").alias("n_active_sessions"),
                F.coalesce("n_active_users", F.lit(0))
                .cast("bigint").alias("n_active_users"))
        .orderBy("event_id")
    )


# --------------------------------------------------------------------- q175
@register(
    "q175_session_error_overlap",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type, epoch_ms(ts) AS tms FROM events),
    sg AS (
      SELECT user_id, tms,
             CASE WHEN lag(tms) OVER w IS NULL
                    OR tms - lag(tms) OVER w > 1800000
                  THEN 1 ELSE 0 END AS ns
      FROM ev WHERE event_type IN ('click', 'view')
      WINDOW w AS (PARTITION BY user_id ORDER BY tms)),
    sess AS (
      SELECT user_id, sid, min(tms) AS lo, max(tms) + 1800000 AS hi
      FROM (SELECT user_id, tms,
                   sum(ns) OVER (PARTITION BY user_id ORDER BY tms
                                 ROWS UNBOUNDED PRECEDING) AS sid
            FROM sg)
      GROUP BY user_id, sid),
    eg AS (
      SELECT user_id, tms,
             CASE WHEN lag(tms) OVER w IS NULL
                    OR tms - lag(tms) OVER w > 1800000
                  THEN 1 ELSE 0 END AS ns
      FROM ev WHERE event_type = 'error'
      WINDOW w AS (PARTITION BY user_id ORDER BY tms)),
    burst AS (
      SELECT min(tms) AS b_lo, max(tms) + 1800000 AS b_hi
      FROM (SELECT user_id, tms,
                   sum(ns) OVER (PARTITION BY user_id ORDER BY tms
                                 ROWS UNBOUNDED PRECEDING) AS sid
            FROM eg)
      GROUP BY user_id, sid),
    hit AS (
      SELECT s.user_id, s.sid, count(*) AS n_bursts
      FROM sess s JOIN burst b ON s.lo <= b.b_hi AND b.b_lo <= s.hi
      GROUP BY s.user_id, s.sid),
    per_user AS (
      SELECT s.user_id,
             count(*) AS n_sessions,
             CAST(sum(CASE WHEN h.n_bursts IS NOT NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_overlapped,
             CAST(coalesce(sum(h.n_bursts), 0) AS BIGINT) AS n_burst_pairs
      FROM sess s LEFT JOIN hit h USING (user_id, sid)
      GROUP BY s.user_id)
    SELECT user_id, n_sessions, n_overlapped, n_burst_pairs
    FROM per_user ORDER BY user_id
    """,
    tags=("events", "range-join", "sessionization"),
)
def q175_session_error_overlap(spark, sf_dir):
    """Interval×interval overlap analytics: for every user, how many of
    their click/view sessions were concurrent with an error burst
    ANYWHERE on the platform (error events sessionized with the same
    30-min gap), and the total (session, burst) overlap pair count —
    the blast-radius readout of incident windows on browsing activity.

    Deliberately no equi key between sessions and bursts: the engine
    side runs operators.range_join.interval_overlap_join — both
    interval sets explode to their 1-hour epoch buckets, hash-join on
    the bucket id with the overlap residual, and keep each pair only
    in the bucket of greatest(lo, b_lo), so every overlapping pair
    counts exactly once with no distinct pass and no nested loop. The
    oracle's IEJoin re-derives the identical pair set."""
    from sunat_rree_demo_spark.operators.range_join import (
        interval_overlap_join,
    )

    e = t(spark, sf_dir, "events")
    ev = e.select("user_id", "event_type", F.unix_millis("ts").alias("tms"))
    sess = gap_session_intervals(
        ev.filter(F.col("event_type").isin("click", "view")))
    burst = (gap_session_intervals(
        ev.filter(F.col("event_type") == "error"))
        .select(F.col("lo").alias("b_lo"), F.col("hi").alias("b_hi")))
    pairs = interval_overlap_join(sess, burst, "lo", "hi", "b_lo", "b_hi",
                                  bucket_width=3_600_000)
    hit = (pairs.groupBy("user_id", "sid")
           .agg(F.count("*").alias("n_bursts")))
    return (
        sess.join(hit, ["user_id", "sid"], "left")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"),
             F.sum(F.when(F.col("n_bursts").isNotNull(), 1).otherwise(0))
             .cast("bigint").alias("n_overlapped"),
             F.coalesce(F.sum("n_bursts"), F.lit(0))
             .cast("bigint").alias("n_burst_pairs"))
        .orderBy("user_id")
    )


# --------------------------------------------------------------------- q194
@register(
    "q194_window_dedup_rank",
    oracle="""
    WITH r AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST((2 * sum(CAST(round(value * 10000, 0) AS BIGINT))
                 + count(*)) // (2 * count(*)) AS DOUBLE) / 10000.0
             AS avg_value
    FROM r WHERE rn = 1
    GROUP BY 1 ORDER BY 1
    """,
    tags=("events", "dedup", "window-rank"),
)
def q194_window_dedup_rank(spark, sf_dir):
    """Keep-latest WINDOW DEDUP — the CDC/changelog compaction every
    event pipeline runs before analytics: one survivor per (user,
    event_type) chosen by (ts, event_id) recency, then a per-type
    profile of the survivors (count + half-up 4dp mean value). The
    (event_id) tiebreak makes the survivor SET deterministic under
    same-timestamp bursts.

    Scale shape: the ranking window is partitioned on the dedup key —
    one hash shuffle of the facts, no global ordering; at 100 TB this
    is the same plan as a MAX_BY-per-key aggregate but keeps the full
    surviving row without a second self-join."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type") \
        .orderBy(F.desc("ts"), F.desc("event_id"))
    kept = (e.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1))
    return (
        kept.withColumn("vu", F.round(F.col("value") * 10000, 0)
                        .cast("bigint"))
        .groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("n_kept"),
             (F.expr("(2 * sum(vu) + count(*)) div (2 * count(*))")
              .cast("double") / 10000.0).alias("avg_value"))
        .orderBy("event_type")
    )
