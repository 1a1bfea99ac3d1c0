"""Contracts for the bucketed point-in-interval join
(operators/range_join.py): exact equivalence to the naive theta-join,
one-row-per-pair (no bucket-straddle dupes), boundary inclusivity,
negative-domain floor correctness, plan shape (equi-join, never a
nested loop), and input validation. q169's DuckDB oracle covers the
end-to-end analytics twin; these pin the operator itself."""

import pytest
from pyspark.sql import functions as F

from sunat_rree_demo_spark.operators.range_join import point_in_interval_join


def _naive(points, intervals, p, lo, hi):
    return points.join(
        intervals,
        on=[F.col(p) >= F.col(lo), F.col(p) <= F.col(hi)])


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("width", [1, 7, 100, 10_000])
def test_matches_naive_theta_join(spark, width):
    """Every (point, interval) pair with lo <= p <= hi appears exactly
    once, for bucket widths smaller, comparable, and larger than the
    interval lengths — including intervals straddling many buckets."""
    import random

    rng = random.Random(42)
    pts = [(i, rng.randrange(-500, 500)) for i in range(120)]
    ivs = []
    for j in range(60):
        a = rng.randrange(-500, 500)
        ivs.append((j, a, a + rng.randrange(0, 300)))
    points = spark.createDataFrame(pts, "pid long, p long")
    intervals = spark.createDataFrame(ivs, "iid long, lo long, hi long")
    got = _rows(point_in_interval_join(points, intervals, "p", "lo", "hi",
                                       bucket_width=width))
    want = _rows(_naive(points, intervals, "p", "lo", "hi"))
    assert got == want and len(want) > 0


def test_boundaries_inclusive_both_ends(spark):
    points = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 9), (4, 21)], "pid long, p long")
    intervals = spark.createDataFrame([(7, 10, 20)], "iid long, lo long, hi long")
    got = point_in_interval_join(points, intervals, "p", "lo", "hi", 8)
    assert sorted(r.pid for r in got.collect()) == [1, 2]


def test_negative_domain_floor_bucketing(spark):
    """floor semantics (not truncate-toward-zero) on negatives: a point
    at -1 and an interval [-5, -1] share bucket -1 with width 4, which
    truncation would split (DIV(-1,4)=0 vs floor=-1)."""
    points = spark.createDataFrame([(1, -1)], "pid long, p long")
    intervals = spark.createDataFrame([(7, -5, -1)], "iid long, lo long, hi long")
    got = point_in_interval_join(points, intervals, "p", "lo", "hi", 4)
    assert [r.pid for r in got.collect()] == [1]


def test_plan_is_equi_join_not_nested_loop(spark):
    points = spark.createDataFrame([(1, 5)], "pid long, p long")
    intervals = spark.createDataFrame([(7, 0, 10)], "iid long, lo long, hi long")
    joined = point_in_interval_join(points, intervals, "p", "lo", "hi", 4)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_rejects_bad_inputs(spark):
    points = spark.createDataFrame([(1, 5.0)], "pid long, p double")
    intervals = spark.createDataFrame([(7, 0, 10)], "iid long, lo long, hi long")
    with pytest.raises(TypeError, match="integral"):
        point_in_interval_join(points, intervals, "p", "lo", "hi", 4)
    ipoints = spark.createDataFrame([(1, 5)], "pid long, p long")
    with pytest.raises(ValueError, match="positive"):
        point_in_interval_join(ipoints, intervals, "p", "lo", "hi", 0)


@pytest.mark.parametrize("width", [1, 9, 128, 10_000])
def test_overlap_matches_naive_theta_join(spark, width):
    """Every overlapping (left, right) interval pair appears exactly
    once (the greatest-lo bucket election), across widths — including
    pairs whose shared span straddles many buckets."""
    import random

    from sunat_rree_demo_spark.operators.range_join import (
        interval_overlap_join,
    )

    rng = random.Random(7)

    def mk(n, tag):
        rows = []
        for j in range(n):
            a = rng.randrange(-400, 400)
            rows.append((j, a, a + rng.randrange(0, 250)))
        return spark.createDataFrame(
            rows, f"{tag}id long, {tag}lo long, {tag}hi long")

    left, right = mk(70, "l"), mk(70, "r")
    got = sorted(map(tuple, interval_overlap_join(
        left, right, "llo", "lhi", "rlo", "rhi", width).collect()))
    want = sorted(map(tuple, left.join(
        right, on=[F.col("llo") <= F.col("rhi"),
                   F.col("rlo") <= F.col("lhi")]).collect()))
    assert got == want and len(want) > 0


def test_overlap_touching_endpoints_inclusive(spark):
    from sunat_rree_demo_spark.operators.range_join import (
        interval_overlap_join,
    )

    left = spark.createDataFrame([(1, 0, 10)], "lid long, llo long, lhi long")
    right = spark.createDataFrame(
        [(1, 10, 20), (2, 11, 20)], "rid long, rlo long, rhi long")
    got = interval_overlap_join(left, right, "llo", "lhi", "rlo", "rhi", 4)
    assert [r.rid for r in got.collect()] == [1]
