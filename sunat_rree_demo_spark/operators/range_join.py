"""Bucketed point-in-interval (range) join — the shuffle-friendly form
of the theta-join Spark has no native optimization for.

A bare ``points JOIN intervals ON p BETWEEN lo AND hi`` with no equi
key plans as BroadcastNestedLoopJoin (or a cartesian SMJ): every point
is compared against every interval — O(n·m) work and a single-executor
broadcast of the interval side. The standard fix (the same idea behind
Databricks' range-join binning hint and the interval-join of stream
processors) is to discretize the domain into fixed-width buckets:

1. every interval explodes to the buckets it covers
   (``sequence(floor(lo/w), floor(hi/w))`` — integer arithmetic);
2. every point maps to exactly ONE bucket (``floor(p/w)``);
3. an ordinary equi-join on the bucket id co-partitions the two sides
   (hash shuffle, AQE-skew-splittable), and the original ``BETWEEN``
   predicate re-applied as the join residual removes the false
   candidates that merely share a bucket.

Because each point lives in one bucket and an interval appears at most
once per bucket, a qualifying (point, interval) pair meets in EXACTLY
one bucket — no post-join dedup is needed.

Cost model: work is Σ_intervals ceil(len/w) + n_points comparisons
within co-buckets, versus n·m for the nested loop. ``bucket_width``
should be of the order of the TYPICAL interval length: too small
explodes long intervals into many rows, too large packs unrelated
points and intervals into the same bucket. Pathologically long
intervals degrade gracefully (more replicas of one row, never a
cross product).

No reference counterpart (the reference's pandas layer has no join
optimizer at all); this is part of the engine's scale surface, cited
by SCALE.md. Semantics are inclusive on both ends; NULL points or
bounds never match (bucket arithmetic yields NULL → join drops them),
matching SQL BETWEEN.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["interval_overlap_join", "point_in_interval_join"]


def _check_integral(pairs) -> None:
    """Shared input validation: every range column must be integral —
    integer bucket arithmetic is exact, float division at bucket edges
    is not."""
    for df, cols in pairs:
        for c in cols:
            dt = df.schema[c].dataType.simpleString()
            if dt not in ("bigint", "int", "smallint", "tinyint"):
                raise TypeError(
                    f"range-join column {c!r} must be integral, got {dt}; "
                    "quantize (epoch millis / micro-units) before joining")


def _bucket(expr_sql: str, w: int) -> Column:
    """Exact integer floor-division bucket id of a SQL expression:
    subtracting pmod makes the numerator an exact multiple, so
    truncating DIV == floor for every sign, and no double arithmetic
    ever touches the value (float division would mis-bucket int64
    magnitudes beyond 2^53 at bucket edges)."""
    return F.expr(
        f"CAST(({expr_sql} - pmod({expr_sql}, {w})) DIV {w} AS BIGINT)")


def point_in_interval_join(points: DataFrame, intervals: DataFrame,
                           point_col: str, lo_col: str, hi_col: str,
                           bucket_width: int) -> DataFrame:
    """Inner-join ``points`` to every interval with
    ``lo_col <= point_col <= hi_col`` via bucketed equi-join.

    All three columns must be integral (epoch millis, integer keys —
    quantize floats first; integer bucket arithmetic is exact, float
    division at bucket edges is not). Column names must not collide
    across the two inputs apart from the internal ``__rj_bucket``.
    Output = points columns + intervals columns, one row per
    qualifying pair.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be a positive integer")
    _check_integral(((points, (point_col,)), (intervals, (lo_col, hi_col))))
    w = int(bucket_width)

    def _b(name: str) -> Column:
        return _bucket(f"`{name}`", w)

    iv = intervals.withColumn(
        "__rj_bucket",
        F.explode(F.sequence(_b(lo_col), _b(hi_col))))
    pt = points.withColumn("__rj_bucket", _b(point_col))
    return (
        pt.join(iv, on=[pt["__rj_bucket"] == iv["__rj_bucket"],
                        F.col(point_col) >= F.col(lo_col),
                        F.col(point_col) <= F.col(hi_col)])
        .drop(pt["__rj_bucket"]).drop(iv["__rj_bucket"])
    )


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          lo_l: str, hi_l: str, lo_r: str, hi_r: str,
                          bucket_width: int) -> DataFrame:
    """Inner-join two INTERVAL tables on overlap
    (``lo_l <= hi_r AND lo_r <= hi_l``, inclusive ends) via the same
    bucket discretization as :func:`point_in_interval_join`.

    Both sides explode to the buckets they cover, so an overlapping
    pair co-occurs in EVERY bucket their spans share; the join keeps
    the pair only in the bucket containing ``greatest(lo_l, lo_r)``
    (the overlap's left edge — a single, deterministic bucket both
    sides are guaranteed to cover), so each qualifying pair emerges
    exactly once with no distinct pass. Work is
    Σ ceil(len/w) per side + co-bucket comparisons; no nested loop,
    no cross product, AQE-splittable hash shuffle on the bucket id.
    Column sets must be disjoint."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be a positive integer")
    _check_integral(((left, (lo_l, hi_l)), (right, (lo_r, hi_r))))
    w = int(bucket_width)

    def _b(name: str) -> Column:
        return _bucket(f"`{name}`", w)

    lv = left.withColumn(
        "__rj_bl", F.explode(F.sequence(_b(lo_l), _b(hi_l))))
    rv = right.withColumn(
        "__rj_br", F.explode(F.sequence(_b(lo_r), _b(hi_r))))
    edge_bucket = _bucket(f"greatest(`{lo_l}`, `{lo_r}`)", w)
    return (
        lv.join(rv, on=[lv["__rj_bl"] == rv["__rj_br"],
                        F.col(lo_l) <= F.col(hi_r),
                        F.col(lo_r) <= F.col(hi_l)])
        .filter(F.col("__rj_bl") == edge_bucket)
        .drop(lv["__rj_bl"]).drop(rv["__rj_br"])
    )
