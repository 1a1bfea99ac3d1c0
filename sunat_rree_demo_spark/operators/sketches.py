"""Count-min sketch primitives shared by the q135 batch query and the
streaming ingest (streaming.cms_stream): one hash device, one partial-
counts shape, so the sketch is mergeable across batches by plain
addition — the property every distributed/streaming sketch rests on
(Cormode & Muthukrishnan 2005).

Geometry: ``CMS_DEPTH`` sha-48 hash rows (``cms{j}:`` domain
separators, the repo's shared device) × ``CMS_WIDTH`` counters — 256
distinct (j, bucket) keys at any corpus size, so the build shuffle is
constant-width and map-side combine does virtually all the work."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: count-min geometry: 4 hash rows × 64 counters.
CMS_DEPTH = 4
CMS_WIDTH = 64


def cms_bucket(term: Column, j: int) -> Column:
    """Row-``j`` counter index for a term (sha-48 ``cms{j}:`` domain)."""
    return (F.conv(F.substring(
        F.sha2(F.concat(F.lit(f"cms{j}:"), term), 256), 1, 12),
        16, 10).cast("bigint") % CMS_WIDTH)


def with_cms_rows(df: DataFrame, term: Column) -> DataFrame:
    """Append (j, bucket) rows: each input row fans out to one row per
    hash row — the depth is a constant, so this is a flat ×4 projection,
    not a shuffle."""
    jb = F.explode(F.array(*[
        F.struct(F.lit(j).cast("int").alias("j"),
                 cms_bucket(term, j).alias("bucket"))
        for j in range(CMS_DEPTH)])).alias("_jb")
    return df.select("*", jb).select(
        *df.columns, F.col("_jb.j").alias("j"),
        F.col("_jb.bucket").alias("bucket"))


def cms_partial_counts(terms: DataFrame, term_col: str = "term") -> DataFrame:
    """(j, bucket, c) partial counters for a term-row frame — ONE
    shuffle of ≤ DEPTH×WIDTH keys with map-side combine. Partials from
    disjoint inputs merge by summing ``c`` (additivity), which is what
    makes the sketch streamable batch-by-batch."""
    return (with_cms_rows(terms, F.col(term_col))
            .groupBy("j", "bucket")
            .agg(F.count("*").cast("bigint").alias("c")))


def cms_estimates(cms: DataFrame, probes: DataFrame,
                  term_col: str = "term") -> DataFrame:
    """Per-probe estimate = min over hash rows of the probed counter.
    ``cms`` holds ≤ DEPTH×WIDTH rows and is broadcast; ``probes``
    may be any size (each probe expands to DEPTH rows). Extra probe columns pass through.

    The join is LEFT from the probe rows: a counter nothing hashed to
    has no sketch row, and its value is 0 — an inner join would
    silently drop it, making an unseen term disappear from the output
    (or worse, report the min over only its COLLIDED buckets). With
    the 0-coalesce, a never-seen term correctly estimates 0."""
    pb = with_cms_rows(probes, F.col(term_col))
    keys = [c for c in probes.columns]
    # hint the BUILD side: the preserved (left) side of a left-outer
    # join can't be broadcast, so the hint must sit on the sketch —
    # which is the naturally tiny side anyway (≤ DEPTH×WIDTH rows)
    return (
        pb.join(F.broadcast(cms), ["j", "bucket"], "left")
        .groupBy(*keys)
        .agg(F.min(F.coalesce("c", F.lit(0).cast("bigint")))
             .alias("cms_est"))
    )
