"""Structured Streaming tests: file-source replay of the events parquet
through each streaming operator into a memory sink, cross-checked
against the batch twin on the same data."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "events.parquet")
    return str(d)


@pytest.fixture(scope="module")
def batch_events(spark):
    from sunat_rree_demo_spark.sources.catalog import load_table
    return load_table(spark, SF_SMOKE, "events").cache()


def test_tumbling_stream_matches_batch(spark, events_dir, batch_events):
    from sunat_rree_demo_spark.streaming.events import (
        events_file_stream,
        run_available_now,
        tumbling_counts,
    )

    sdf = tumbling_counts(events_file_stream(spark, events_dir))
    run_available_now(sdf, "t_tumbling", output_mode="complete")
    got = {(str(r.window_start), r.event_type): (r.n_events, r.total_value)
           for r in spark.table("t_tumbling").collect()}

    expect = {
        (str(r.ws), r.event_type): (r.n, r.tv)
        for r in (batch_events
                  .groupBy(F.date_trunc("hour", "ts").alias("ws"), "event_type")
                  .agg(F.count("*").alias("n"),
                       F.round(F.sum("value"), 2).alias("tv"))
                  .collect())
    }
    assert got == expect


def test_sliding_stream_matches_batch_twin(spark, events_dir, batch_events):
    from sunat_rree_demo_spark.streaming.events import (
        events_file_stream,
        run_available_now,
        sliding_totals,
    )

    sdf = sliding_totals(events_file_stream(spark, events_dir))
    run_available_now(sdf, "t_sliding", output_mode="complete")
    got = {str(r.window_start): (r.n_events, r.total_value)
           for r in spark.table("t_sliding").collect()}

    two = (batch_events
           .select(F.explode(F.array(
               F.date_trunc("hour", "ts"),
               F.date_trunc("hour", "ts") - F.expr("INTERVAL 1 HOUR")))
               .alias("ws"), "value"))
    expect = {str(r.ws): (r.n, r.tv)
              for r in two.groupBy("ws")
              .agg(F.count("*").alias("n"),
                   F.round(F.sum("value"), 2).alias("tv")).collect()}
    assert got == expect


def test_session_stream_produces_sessions(spark, events_dir):
    from sunat_rree_demo_spark.streaming.events import (
        events_file_stream,
        run_available_now,
        session_counts,
    )

    sdf = session_counts(events_file_stream(spark, events_dir))
    run_available_now(sdf, "t_sessions", output_mode="complete")
    rows = spark.table("t_sessions").collect()
    assert rows
    for r in rows[:50]:
        assert r.session_end >= r.session_start and r.n_events >= 1


def test_dedup_stream_keeps_one_per_key(spark, events_dir, batch_events):
    from sunat_rree_demo_spark.streaming.events import (
        dedup_events,
        events_file_stream,
        run_available_now,
    )

    sdf = dedup_events(events_file_stream(spark, events_dir))
    run_available_now(sdf, "t_dedup", output_mode="append")
    got = spark.table("t_dedup")
    n_keys = batch_events.select("user_id", "event_type").distinct().count()
    assert got.count() == n_keys
    assert got.select("user_id", "event_type").distinct().count() == n_keys


def test_stream_starts_on_empty_directory(spark, tmp_path, batch_events):
    """A file-source stream may legally start before the first file
    lands: the footer probe must fall back to the legacy schema instead
    of throwing UNABLE_TO_INFER_SCHEMA, and files arriving later must
    flow through (ts normalized like the batch twin)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sunat_rree_demo_spark.streaming.events import (
        events_file_stream,
        run_available_now,
        tumbling_counts,
    )

    d = tmp_path / "late_events"
    d.mkdir()
    stream = events_file_stream(spark, str(d))  # empty dir: must not raise
    assert stream.isStreaming

    # a legacy-layout file lands after the stream was defined: write ts
    # as int64 nanos (what TIMESTAMP(NANOS) reads as under nanosAsLong)
    rows = batch_events.limit(50).select(
        "event_id",
        (F.unix_micros("ts") * 1000).alias("ts"),
        "user_id", "event_type", "value", "props").collect()
    pq.write_table(pa.Table.from_pylist([r.asDict() for r in rows]),
                   d / "part1.parquet")
    # complete mode: count every window, including not-yet-finalized
    # ones the append-mode sink would hold back behind the watermark
    run_available_now(tumbling_counts(stream), "late_events_sink",
                      output_mode="complete")
    got = spark.sql("SELECT SUM(n_events) AS n FROM late_events_sink").first()
    assert got.n == 50


def test_attribution_stream_stream_join_matches_batch(spark, events_dir,
                                                      batch_events):
    """True stream-stream interval join: the SAME expression over two
    watermarked file streams must emit exactly the batch twin's pairs
    (q78). AvailableNow replay; append mode (stream-stream joins only
    support append)."""
    from sunat_rree_demo_spark.streaming.events import (
        click_purchase_attribution,
        events_file_stream,
        run_available_now,
    )

    sdf = click_purchase_attribution(events_file_stream(spark, events_dir))
    assert sdf.isStreaming
    run_available_now(sdf, "t_attr", output_mode="append")
    got = {(r.click_id, r.purchase_id): (r.user_id, r.purchase_value,
                                         r.lag_sec)
           for r in spark.table("t_attr").collect()}
    expect = {(r.click_id, r.purchase_id): (r.user_id, r.purchase_value,
                                            r.lag_sec)
              for r in click_purchase_attribution(batch_events).collect()}
    assert got == expect and len(got) > 0


def test_streaming_upsert_maintains_latest_state(spark, tmp_path):
    """Streaming view maintenance: events replayed in MULTIPLE
    micro-batches through foreachBatch + the CDC upsert sink must leave
    exactly the batch-computed latest-(ts, event_id) value per
    (user, day) — the incremental state-table pattern (same merge
    semantics as dedup_stream's index absorb, but over a keyed value
    table)."""
    import shutil

    from pyspark.sql import functions as F

    from sunat_rree_demo_spark.sources.catalog import load_table
    from sunat_rree_demo_spark.sources.sinks import upsert_partitioned
    from sunat_rree_demo_spark.streaming.events import events_file_stream

    ev = load_table(spark, SF_SMOKE, "events").filter(
        "event_type = 'purchase'")
    # two FILES at the dir root (write.parquet emits a directory; the
    # file source lists plain files) → two micro-batches at
    # maxFilesPerTrigger=1
    src = tmp_path / "src"
    src.mkdir()
    for name, pred in (("a", "event_id % 2 = 0"),
                       ("b", "event_id % 2 = 1")):
        out = tmp_path / f"_{name}"
        ev.filter(pred).coalesce(1).write.parquet(str(out))
        shutil.move(str(next(out.glob("part-*.parquet"))),
                    str(src / f"{name}.parquet"))
    state = str(tmp_path / "state")

    def absorb(batch_df, batch_id):
        latest = (batch_df
                  .withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
                  .withColumn("tk", F.struct("ts", "event_id"))
                  .groupBy("user_id", "day")
                  .agg(F.max_by("value", "tk").alias("value"),
                       F.max("tk").alias("tk"))
                  .select("user_id", "day", "value",
                          # microsecond version (a whole-second cast
                          # collides for same-second events and would
                          # lose the (ts, event_id) tiebreak)
                          F.unix_micros(F.col("tk.ts")).alias("ver")))
        upsert_partitioned(batch_df.sparkSession, latest, state,
                           ["user_id", "day"], "ver", "day")

    stream = (events_file_stream(spark, str(src), max_files_per_trigger=1)
              .filter("event_type = 'purchase'"))
    q = (stream.writeStream.foreachBatch(absorb)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    # the partition column reads back type-inferred (DATE) — normalize
    got = {(r["user_id"], str(r["day"])): r["value"]
           for r in spark.read.parquet(state).collect()}
    want = {(r["user_id"], r["day"]): r["value"]
            for r in (ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
                      .groupBy("user_id", "day")
                      .agg(F.max_by("value",
                                    F.struct("ts", "event_id")).alias("value"))
                      .collect())}
    assert got == want and len(got) > 0


def test_attribution_outer_join_emits_unmatched_after_watermark(
        spark, batch_events, tmp_path):
    """LEFT-OUTER stream-stream join: matched pairs must equal the
    batch twin's exactly; NULL (unmatched) rows surface only once the
    watermark closes a click's horizon. Null emission happens in the
    micro-batch AFTER the watermark advances, so the replay appends a
    far-future sentinel file as its own second batch — that makes the
    main file's unmatched clicks deterministically evictable, while
    the sentinel-era tail stays held back (the documented
    outer-join/watermark interaction)."""
    import datetime
    import os
    import shutil

    from pyspark.sql import functions as F

    from sunat_rree_demo_spark.streaming.events import (
        click_purchase_attribution_outer,
        events_file_stream,
        run_available_now,
    )

    d = tmp_path / "ev"
    d.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "events.parquet")
    max_ts = batch_events.agg(F.max("ts")).first()[0]
    sentinel_ts = max_ts + datetime.timedelta(days=1)
    (batch_events.limit(1)
     .select(F.lit(10**9).alias("event_id"),
             F.lit(sentinel_ts).alias("ts"),
             F.lit(-1).alias("user_id"),
             F.lit("view").alias("event_type"),
             F.lit(0.0).alias("value"), F.lit("{}").alias("props"))
     .coalesce(1).write.mode("overwrite").parquet(str(d / "_s")))
    part = next(f for f in os.listdir(d / "_s") if f.endswith(".parquet"))
    shutil.move(str(d / "_s" / part), str(d / "zz_sentinel.parquet"))
    shutil.rmtree(d / "_s")
    # file source orders batches by modification time: main file first
    now = os.path.getmtime(d / "zz_sentinel.parquet")
    os.utime(d / "events.parquet", (now - 100, now - 100))

    sdf = click_purchase_attribution_outer(
        events_file_stream(spark, str(d), ts_variant="micros"))
    assert sdf.isStreaming
    run_available_now(sdf, "t_attr_outer", output_mode="append")
    got = spark.table("t_attr_outer").collect()
    matched = {(r.click_id, r.purchase_id) for r in got
               if r.purchase_id is not None}
    nulls = {r.click_id for r in got if r.purchase_id is None}

    batch = click_purchase_attribution_outer(batch_events).collect()
    want_matched = {(r.click_id, r.purchase_id) for r in batch
                    if r.purchase_id is not None}
    want_nulls = {r.click_id for r in batch if r.purchase_id is None}

    assert matched == want_matched and matched
    # streaming nulls ⊆ batch nulls, and no click resolves both ways
    assert nulls <= want_nulls
    assert not (nulls & {c for c, _ in matched})
    # every unmatched click whose horizon the FIRST batch's watermark
    # closed (click + horizon + watermark < main-file max ts) must have
    # been evicted as a null during the sentinel batch
    click_ts = {r.event_id: r.ts for r in batch_events
                .filter(F.col("event_type") == "click").collect()}
    # the join's watermark is the MIN of the two per-stream watermarks
    # (max click ts, max purchase ts — each − 2h); a click evicts when
    # click_ts + horizon(1h) < that, i.e. click_ts < min(maxes) − 3h
    maxes = (batch_events.filter(F.col("event_type").isin("click",
                                                          "purchase"))
             .groupBy("event_type").agg(F.max("ts").alias("m")).collect())
    cutoff = min(r["m"] for r in maxes) - datetime.timedelta(hours=3)
    early_unmatched = {c for c in want_nulls if click_ts[c] < cutoff}
    assert early_unmatched and early_unmatched <= nulls
