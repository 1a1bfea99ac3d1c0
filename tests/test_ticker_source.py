"""Streaming Python DataSource (trade_ticker): deterministic emission,
gap-free offsets, and exactly-once checkpoint recovery."""

from __future__ import annotations

import time

from tests.conftest import SF_SMOKE  # noqa: F401  (fixture session)


def _drain(spark, query, count_fn, min_rows, timeout=60):
    """Poll ``count_fn()`` until it reaches ``min_rows`` (or timeout),
    then stop the query — the one replay-drain loop all three tests
    share."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        if count_fn() >= min_rows:
            break
        time.sleep(0.3)
    query.stop()
    query.awaitTermination(30)


def _table_count(spark, table):
    return lambda: spark.sql(f"SELECT count(*) c FROM {table}").first()["c"]


def test_ticker_emits_deterministic_gapless_rows(spark, tmp_path):
    from sunat_rree_demo_spark.sources.ticker_source import (
        TradeTickerDataSource,
        expected_ticks,
    )

    spark.dataSource.register(TradeTickerDataSource)
    s = (spark.readStream.format("trade_ticker")
         .option("rows_per_batch", 40).load())
    q = (s.writeStream.format("memory").queryName("tick_a")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(processingTime="0 seconds").start())
    _drain(spark, q, _table_count(spark, "tick_a"), 120)
    collected = spark.table("tick_a").collect()
    rows = {r["tick_id"]: (r["ts"], r["flow"], r["category"], r["usd"])
            for r in collected}
    n = len(rows)
    assert n >= 120
    # each index exactly once: the physical row count must equal the
    # distinct-id count (a dict alone would silently collapse dups)
    assert len(collected) == n
    # gap-free: exactly the first n indices
    assert set(rows) == set(range(n))
    # content (incl. the deterministic event-time clock) is the pure
    # function of the index
    assert rows == {i: (ts.replace(tzinfo=None), f, c, u)
                    for i, ts, f, c, u in expected_ticks(n)}


def test_ticker_checkpoint_recovery_is_exactly_once(spark, tmp_path):
    """Stop mid-stream, restart from the SAME checkpoint into the SAME
    file sink (the memory sink can't recover; the parquet sink's
    commit log is the exactly-once boundary): the final output must be
    gap-free and duplicate-free across both runs — the
    readBetweenOffsets replay contract end to end."""
    import time

    from sunat_rree_demo_spark.sources.ticker_source import (
        TradeTickerDataSource,
        expected_ticks,
    )

    spark.dataSource.register(TradeTickerDataSource)
    ck = str(tmp_path / "ck2")
    out = str(tmp_path / "out")

    def run(min_rows):
        s = (spark.readStream.format("trade_ticker")
             .option("rows_per_batch", 25).load())
        q = (s.writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ck)
             .trigger(processingTime="0 seconds").start())

        def count():
            try:
                return spark.read.parquet(out).count()
            except Exception:
                return 0

        _drain(spark, q, count, min_rows)
        return [r["tick_id"] for r in spark.read.parquet(out).collect()]

    first = run(75)
    combined = run(len(first) + 25)
    assert len(combined) > len(first)
    # exactly-once across the restart: every index once, no gaps
    assert sorted(combined) == list(range(len(combined)))
    # and replayed content is bit-identical to the pure function
    got = {r["tick_id"]: (r["flow"], r["category"], r["usd"])
           for r in spark.read.parquet(out).collect()}
    assert got == {i: (f, c, u)
                   for i, _ts, f, c, u in expected_ticks(len(combined))}


def test_ticker_feeds_watermarked_windows(spark, tmp_path):
    """The custom stream composes with the built-in watermark/window
    machinery: a 1-minute tumbling sum over the ticker must equal the
    batch aggregation of the deterministic rows that were emitted."""
    from pyspark.sql import functions as F

    from sunat_rree_demo_spark.sources.ticker_source import (
        TradeTickerDataSource,
    )

    spark.dataSource.register(TradeTickerDataSource)
    s = (spark.readStream.format("trade_ticker")
         .option("rows_per_batch", 60).load())
    agg = (s.withWatermark("ts", "10 minutes")
           .groupBy(F.window("ts", "1 minute").alias("w"), "flow")
           .agg(F.count("*").alias("n"),
                F.round(F.sum("usd"), 2).alias("usd")))
    q = (agg.writeStream.format("memory").queryName("tick_w")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckw"))
         .trigger(processingTime="0 seconds").start())
    _drain(spark, q,
           lambda: spark.sql("SELECT coalesce(sum(n), 0) c FROM tick_w")
           .first()["c"], 120)
    got = {(r["w"]["start"], r["flow"]): (r["n"], r["usd"])
           for r in spark.table("tick_w").collect()}
    n_emitted = int(sum(v[0] for v in got.values()))
    from sunat_rree_demo_spark.sources.ticker_source import expected_ticks
    rows = expected_ticks(n_emitted)
    batch = spark.createDataFrame(rows, "tick_id long, ts timestamp, "
                                        "flow string, category string, "
                                        "usd double")
    want = {(r["w"]["start"], r["flow"]): (r["n"], r["usd"])
            for r in batch.groupBy(F.window("ts", "1 minute").alias("w"),
                                   "flow")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("usd"), 2).alias("usd")).collect()}
    assert got == want and got
