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
