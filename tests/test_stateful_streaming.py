"""applyInPandasWithState tests: state must persist across micro-batches
(two files, one per trigger) and converge to the batch ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def split_events_dir(spark, tmp_path_factory):
    """The events table split into two parquet files → two micro-batches."""
    from sunat_rree_demo_spark.sources.catalog import load_table

    d = tmp_path_factory.mktemp("events_split")
    e = load_table(spark, SF_SMOKE, "events")
    e.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(str(d / "a"))
    e.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(str(d / "b"))
    import shutil
    out = tmp_path_factory.mktemp("events_stream2")
    i = 0
    for sub in ("a", "b"):
        for f in (d / sub).glob("*.parquet"):
            shutil.copy(f, out / f"part{i}.parquet")
            i += 1
    return str(out)


def test_running_stats_converge_to_batch(spark, split_events_dir):
    from sunat_rree_demo_spark.streaming.events import (
        events_file_stream,
        run_available_now,
    )
    from sunat_rree_demo_spark.streaming.stateful import running_user_stats
    from sunat_rree_demo_spark.sources.catalog import load_table

    sdf = running_user_stats(events_file_stream(spark, split_events_dir))
    run_available_now(sdf, "t_stateful", output_mode="update")
    updates = spark.table("t_stateful")
    # multiple update rows per user (one per batch containing the user);
    # the row with max n_events is the final state
    final = {r.user_id: (r.n_events, r.total_value)
             for r in updates.orderBy("n_events").collect()}

    batch = load_table(spark, SF_SMOKE, "events")
    expect = {r.user_id: (r.n, r.tv)
              for r in batch.groupBy("user_id")
              .agg(F.count("*").alias("n"),
                   F.round(F.sum("value"), 2).alias("tv")).collect()}
    assert final.keys() == expect.keys()
    for k in expect:
        assert final[k][0] == expect[k][0]
        assert abs(final[k][1] - expect[k][1]) <= 0.02  # per-batch rounding

    # state genuinely crossed batches: some user must appear twice
    multi = (updates.groupBy("user_id").count().filter(F.col("count") > 1).count())
    assert multi > 0


LIVE_LATENCY_BUDGET = 60.0  # s from query start to first useful output


def _collector():
    """Driver-side foreachBatch sink: records (wall-clock, rows) per
    non-empty batch."""
    import time

    batches: list[tuple[float, list]] = []

    def on_batch(df, _epoch):
        rows = df.collect()
        if rows:
            batches.append((time.time(), rows))

    return batches, on_batch


def test_live_rate_running_stats_foreachbatch(spark):
    """applyInPandasWithState on a LIVE unbounded source (rate), not a
    file replay: state must accumulate across micro-batches under a real
    foreachBatch sink, with the first output inside the latency budget."""
    import time

    from sunat_rree_demo_spark.streaming.events import (
        rate_events,
        run_foreach_batch,
    )
    from sunat_rree_demo_spark.streaming.stateful import running_user_stats

    batches, on_batch = _collector()
    t0 = time.time()
    run_foreach_batch(
        running_user_stats(rate_events(spark, rows_per_second=400)),
        on_batch,
        should_stop=lambda: len(batches) >= 3,
        timeout=LIVE_LATENCY_BUDGET + 30,
    )
    assert len(batches) >= 2, "live stream produced too few update batches"
    assert batches[0][0] - t0 < LIVE_LATENCY_BUDGET

    # state genuinely accumulated: per user, n_events strictly grows
    # across batches and mean stays consistent with (total, n)
    last_n: dict[int, int] = {}
    grew = 0
    for _, rows in batches:
        for r in rows:
            if r.user_id in last_n:
                assert r.n_events >= last_n[r.user_id]
                grew += int(r.n_events > last_n[r.user_id])
            last_n[r.user_id] = r.n_events
            if r.n_events:
                assert abs(r.mean_value - r.total_value / r.n_events) < 0.01
    assert grew > 0, "no user's state advanced across live batches"


def test_live_rate_anomaly_flags_foreachbatch(spark):
    """The Welford anomaly detector on the live rate source: the
    deterministic 500.0 spikes (every 97th event) must be flagged with
    |z| above the threshold inside the latency budget."""
    import time

    from sunat_rree_demo_spark.streaming.events import (
        rate_events,
        run_foreach_batch,
    )
    from sunat_rree_demo_spark.streaming.stateful import anomaly_flags

    batches, on_batch = _collector()
    t0 = time.time()
    run_foreach_batch(
        anomaly_flags(rate_events(spark, rows_per_second=400),
                      sigma=3.0, min_history=10),
        on_batch,
        should_stop=lambda: sum(len(b[1]) for b in batches) >= 2,
        timeout=LIVE_LATENCY_BUDGET + 30,
    )
    flagged = [r for _, rows in batches for r in rows]
    assert flagged, "no anomalies flagged on the spiky live stream"
    assert batches[0][0] - t0 < LIVE_LATENCY_BUDGET
    for r in flagged:
        assert abs(r.zscore) > 3.0
        assert r.value == 500.0  # only the planted spikes qualify


def test_live_rate_session_window_foreachbatch(spark):
    """The built-in stateful session-window operator on the live rate
    source under foreachBatch. Session aggregations only support APPEND
    mode — a session row is emitted once the watermark passes its close,
    so the source must be bursty: each user emits `burst` consecutive
    events then goes quiet for 7 bursts while the others keep event time
    advancing past its gap. Finalized sessions must arrive inside the
    latency budget with start <= end and the burst's events inside."""
    import time

    from sunat_rree_demo_spark.streaming.events import (
        rate_events,
        run_foreach_batch,
        session_counts,
    )

    batches, on_batch = _collector()
    t0 = time.time()
    run_foreach_batch(
        session_counts(rate_events(spark, rows_per_second=400, burst=400),
                       gap="2 seconds", watermark="1 second"),
        on_batch,
        output_mode="append",
        should_stop=lambda: sum(len(b[1]) for b in batches) >= 2,
        timeout=LIVE_LATENCY_BUDGET + 30,
    )
    closed = [r for _, rows in batches for r in rows]
    assert closed, "no session closed on the live stream"
    assert batches[0][0] - t0 < LIVE_LATENCY_BUDGET
    for r in closed:
        assert r.session_start <= r.session_end
        assert r.n_events >= 1
    # a full burst is ~1s of one user's events — the closed session
    # must have aggregated many of them, not one per row
    assert max(r.n_events for r in closed) > 1


def test_anomaly_flags_zscores_sane(spark, split_events_dir):
    from sunat_rree_demo_spark.streaming.events import (
        events_file_stream,
        run_available_now,
    )
    from sunat_rree_demo_spark.streaming.stateful import anomaly_flags

    sdf = anomaly_flags(events_file_stream(spark, split_events_dir), sigma=2.0,
                        min_history=5)
    run_available_now(sdf, "t_anomaly", output_mode="update")
    rows = spark.table("t_anomaly").collect()
    for r in rows:
        assert abs(r.zscore) > 2.0


def test_heavy_hitters_misra_gries_guarantees(spark, tmp_path):
    """Replaying the events stream through the Misra-Gries operator
    must satisfy the sketch's guarantees against exact batch counts:
    every user with true count > N/(k+1) appears, and every kept
    counter underestimates by at most N/(k+1)."""
    import shutil

    from pyspark.sql import functions as F

    from sunat_rree_demo_spark.sources.catalog import load_table
    from sunat_rree_demo_spark.streaming.events import (
        events_file_stream,
        run_available_now,
    )
    from sunat_rree_demo_spark.streaming.stateful import heavy_hitters
    from tests.conftest import SF_SMOKE

    d = tmp_path / "hh_events"
    d.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "events.parquet")
    k = 8
    sdf = heavy_hitters(events_file_stream(spark, str(d)), k=k)
    run_available_now(sdf, "t_hh", output_mode="update")
    # keep only the FINAL summary per event_type: under a multi-batch
    # split the update-mode sink holds every batch's emission, and
    # earlier ones carry stale counters; the final batch is the one
    # with the maximal n_total for its type
    rows = spark.table("t_hh").collect()
    final_n = {}
    for r in rows:
        final_n[r.event_type] = max(final_n.get(r.event_type, 0), r.n_total)
    summary: dict = {}
    for r in rows:
        if r.n_total == final_n[r.event_type]:
            summary.setdefault(r.event_type, {})[r.user_id] = (
                r.est_count, r.n_total)

    truth = {(r.event_type, r.user_id): r.c
             for r in (load_table(spark, SF_SMOKE, "events")
                       .groupBy("event_type", "user_id")
                       .agg(F.count("*").alias("c")).collect())}
    n_per_type: dict = {}
    for (et, _), c in truth.items():
        n_per_type[et] = n_per_type.get(et, 0) + c

    assert summary
    for et, kept in summary.items():
        bound = n_per_type[et] / (k + 1)
        for (t_et, uid), c in truth.items():
            if t_et == et and c > bound:
                assert uid in kept, (et, uid, c, bound)
        for uid, (est, n_tot) in kept.items():
            true_c = truth[(et, uid)]
            assert est <= true_c <= est + bound, (et, uid, est, true_c)
            assert n_tot == n_per_type[et]


def test_transform_with_state_running_totals(spark, tmp_path):
    """Spark 4 transformWithStateInPandas: per-category running totals
    over the deterministic ticker stream must converge to the batch
    aggregation of exactly the rows that were emitted (exact integer
    cents under any micro-batch split). Requires the RocksDB state
    store; conf is set for the query and restored after.

    Environment gate: transformWithState's driver-side runner imports
    google.protobuf (Spark Connect wire format); this container ships
    without it, so the test SKIPS there — the operator is the real
    API usage either way (same policy as the codec-gated multimodal
    paths)."""
    import time

    import pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf unavailable: transformWithState's "
                    "streaming runner cannot start in this container")

    from pyspark.sql import functions as F

    from sunat_rree_demo_spark.sources.ticker_source import (
        TradeTickerDataSource,
        expected_ticks,
    )
    from sunat_rree_demo_spark.streaming.stateful import (
        category_running_totals,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
                          None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    try:
        spark.dataSource.register(TradeTickerDataSource)
        s = (spark.readStream.format("trade_ticker")
             .option("rows_per_batch", 50).load())
        out = category_running_totals(s)
        q = (out.writeStream.format("memory").queryName("tws_totals")
             .outputMode("update")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(processingTime="0 seconds").start())
        deadline = time.time() + 90
        while time.time() < deadline:
            n = (spark.sql("SELECT coalesce(sum(n_ticks), 0) c FROM "
                           "(SELECT max_by(n_ticks, n_ticks) AS n_ticks "
                           " FROM tws_totals GROUP BY category)")
                 .first()["c"])
            if n >= 150:
                break
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(30)
        # update mode emits one row per (category, batch); the LAST row
        # per category is the running state — max n_ticks wins
        final = {r["category"]: (r["n_ticks"], r["total_usd"])
                 for r in spark.sql(
                     "SELECT category, max_by(n_ticks, n_ticks) AS n_ticks,"
                     " max_by(total_usd, n_ticks) AS total_usd"
                     " FROM tws_totals GROUP BY category").collect()}
        n_emitted = int(sum(v[0] for v in final.values()))
        rows = expected_ticks(n_emitted)
        batch = spark.createDataFrame(
            rows, "tick_id long, ts timestamp, flow string, "
                  "category string, usd double")
        want = {r["category"]: (r["n"], r["usd"]) for r in
                batch.groupBy("category")
                .agg(F.count("*").alias("n"),
                     (F.sum(F.round(F.col("usd") * 100, 0).cast("bigint"))
                      .cast("double") / 100.0).alias("usd")).collect()}
        assert final == want and final
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev)
