"""Streaming mergeable histogram sketch: drained quantiles equal the
batch operator AND q189's 'ALL' scope on the same data (three-way pin),
compaction preserves the sketch exactly, replays are no-ops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

_CENTS = "CAST(round(l_extendedprice * 100, 0) AS BIGINT)"


@pytest.fixture(scope="module")
def lineitem_three_files(spark, tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("li_sketch_stream")
    tbl = pq.read_table(f"{SF_SMOKE}/lineitem.parquet")
    third = tbl.num_rows // 3
    pq.write_table(tbl.slice(0, third), d / "part1.parquet")
    pq.write_table(tbl.slice(third, third), d / "part2.parquet")
    pq.write_table(tbl.slice(2 * third), d / "part3.parquet")
    return str(d)


def _cents_stream(spark, directory):
    schema = spark.read.parquet(directory).schema
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(directory)
            .selectExpr(f"{_CENTS} AS price_cents"))


def test_streamed_sketch_equals_batch_and_q189(spark, tmp_path,
                                               lineitem_three_files):
    from sunat_rree_demo_spark.operators.sketches import (
        equi_width_histogram,
        histogram_quantiles,
    )
    from sunat_rree_demo_spark.queries import REGISTRY
    from sunat_rree_demo_spark.streaming.sketch_stream import (
        load_sketch_quantiles,
        run_sketch_stream,
    )

    store = str(tmp_path / "sketch_store")
    run_sketch_stream(spark, _cents_stream(spark, lineitem_three_files),
                      store)
    got = {r.quantile: r.est_usd
           for r in load_sketch_quantiles(spark, store).collect()}

    full = (spark.read.parquet(lineitem_three_files)
            .selectExpr(f"{_CENTS} AS price_cents"))
    want = {r.quantile: r.est_usd for r in histogram_quantiles(
        equi_width_histogram(full, F.col("price_cents"))).collect()}
    assert got == want and set(got) == {"p50", "p90", "p99"}

    # the registered q189's 'ALL' scope computes the same numbers
    # (shared device) on the same lineitem rows
    q189 = {r.quantile: r.est_usd
            for r in REGISTRY["q189_quantile_sketch_merge"]
            .fn(spark, SF_SMOKE).collect() if r.scope == "ALL"}
    assert q189 == got


def test_sketch_compaction_and_replay(spark, tmp_path):
    from sunat_rree_demo_spark.streaming.sketch_stream import (
        compact_sketch,
        load_sketch_quantiles,
        merged_sketch,
        process_sketch_batch,
    )

    store = str(tmp_path / "c_store")
    b0 = spark.createDataFrame([(100,), (250,), (999,)], "price_cents long")
    b1 = spark.createDataFrame([(100,), (50_000,)], "price_cents long")
    process_sketch_batch(spark, b0, 0, store, width=100)
    process_sketch_batch(spark, b1, 1, store, width=100)
    before = {(r.bin, r.c) for r in merged_sketch(spark, store).collect()}
    q_before = [tuple(r) for r in
                load_sketch_quantiles(spark, store, width=100).collect()]

    process_sketch_batch(spark, b1, 1, store, width=100)  # replay no-op
    assert {(r.bin, r.c)
            for r in merged_sketch(spark, store).collect()} == before

    compact_sketch(spark, store)
    assert {(r.bin, r.c)
            for r in merged_sketch(spark, store).collect()} == before
    assert [tuple(r) for r in
            load_sketch_quantiles(spark, store, width=100).collect()] \
        == q_before
    # post-compaction absorb keeps working (epoch ids unaffected)
    process_sketch_batch(spark, b0, 2, store, width=100)
    assert sum(c for _, c in
               {(r.bin, r.c)
                for r in merged_sketch(spark, store).collect()}) == 8


def test_histogram_floor_bins_negative_values(spark):
    """r6 review fix: negative cents bin by FLOOR division (DuckDB //),
    never truncate-toward-zero — a -5000-cent refund lands in bin -1,
    not bin 0."""
    from sunat_rree_demo_spark.operators.sketches import (
        equi_width_histogram,
    )

    df = spark.createDataFrame(
        [(-5000,), (-10000,), (-1,), (0,), (5000,), (10000,)],
        "price_cents long")
    got = {r.bin: r.c for r in equi_width_histogram(
        df, F.col("price_cents"), width=10000).collect()}
    assert got == {-1: 3, 0: 2, 1: 1}


def test_sketch_compaction_crash_windows(spark, tmp_path):
    """Write-first compaction + _COVERS supersession (review finding
    r6: the delete-before-write ordering lost the histogram on a crash
    between the deletes and the write): (a) an absorbed batch whose
    directory a crashed delete phase left behind never double-counts,
    (b) a committed target WITHOUT its marker — crash before _COVERS —
    stays invisible and a re-run heals it under a fresh id, (c) the
    already-compacted path reaps leftovers without rewriting."""
    import os
    import shutil

    from sunat_rree_demo_spark.streaming.sketch_stream import (
        compact_sketch,
        merged_sketch,
        process_sketch_batch,
    )

    def hist():
        return {(r.bin, r.c)
                for r in merged_sketch(spark, store).collect()}

    store = str(tmp_path / "cw_store")
    b0 = spark.createDataFrame([(100,), (250,), (999,)],
                               "price_cents long")
    b1 = spark.createDataFrame([(100,), (50_000,)], "price_cents long")
    process_sketch_batch(spark, b0, 0, store, width=100)
    process_sketch_batch(spark, b1, 1, store, width=100)
    want = {(1, 2), (2, 1), (9, 1), (500, 1)}
    assert hist() == want

    snap = str(tmp_path / "snap1")
    shutil.copytree(f"{store}/hist/batch_id=1", snap)
    compact_sketch(spark, store)  # generation -1, _COVERS_1
    # (a) crash mid-delete: the absorbed batch 1 resurfaces — the
    # covers mark keeps it invisible, so no double count
    shutil.copytree(snap, f"{store}/hist/batch_id=1")
    assert hist() == want
    # (c) a re-run reaps the leftover in place (no new generation)
    compact_sketch(spark, store)
    assert not os.path.exists(f"{store}/hist/batch_id=1")
    assert os.path.exists(f"{store}/hist/batch_id=-1")
    assert hist() == want

    # (b) torn target: committed parquet (has _SUCCESS) but no covers
    # marker — the crash window between the write and the marker
    shutil.copytree(f"{store}/hist/batch_id=-1",
                    f"{store}/hist/batch_id=-5")
    for f in os.listdir(f"{store}/hist/batch_id=-5"):
        if f.startswith("_COVERS_"):
            os.remove(f"{store}/hist/batch_id=-5/{f}")
    assert hist() == want  # invisible, not doubled
    # healing run absorbs a fresh epoch too and reaps the torn target
    process_sketch_batch(spark, b0, 2, store, width=100)
    compact_sketch(spark, store)
    left = [d for d in os.listdir(f"{store}/hist")
            if d.startswith("batch_id=")]
    assert left == ["batch_id=-6"]
    assert hist() == {(1, 3), (2, 2), (9, 2), (500, 1)}


def test_sketch_heal_reaps_batch_zero_leftover(spark, tmp_path):
    """Stream epochs start at 0, so _COVERS_0 is a legitimate falsy
    marker value (review finding r7: `_covers_of(...) or -1` treated
    it as absent and the single-generation heal path never reaped a
    crash-left batch_id=0)."""
    import os
    import shutil

    from sunat_rree_demo_spark.streaming.sketch_stream import (
        compact_sketch,
        merged_sketch,
        process_sketch_batch,
    )

    store = str(tmp_path / "z_store")
    b0 = spark.createDataFrame([(100,), (250,)], "price_cents long")
    process_sketch_batch(spark, b0, 0, store, width=100)
    want = {(r.bin, r.c) for r in merged_sketch(spark, store).collect()}
    snap = str(tmp_path / "snap0")
    shutil.copytree(f"{store}/hist/batch_id=0", snap)
    compact_sketch(spark, store)  # gen -1, _COVERS_0
    shutil.copytree(snap, f"{store}/hist/batch_id=0")  # crash mid-delete
    assert {(r.bin, r.c)
            for r in merged_sketch(spark, store).collect()} == want
    compact_sketch(spark, store)  # heal must reap the 0-covered leftover
    assert not os.path.exists(f"{store}/hist/batch_id=0")
    assert {(r.bin, r.c)
            for r in merged_sketch(spark, store).collect()} == want
