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

from sunat_rree_demo_spark.localrel import local_df

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


# ------------------------------------------------- mergeable histogram
#: default equi-width bin: $100 of a cent-quantized money value
HIST_BIN_CENTS = 10000

#: the (numerator, denominator, label) quantile probes q189 and the
#: streaming sketch share
QUANTILE_PROBES = ((1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99"))


def equi_width_histogram(df: DataFrame, cents: Column,
                         width: int = HIST_BIN_CENTS) -> DataFrame:
    """(bin, c) partial histogram of an exact-integer cent column —
    THE mergeable quantile sketch: partials combine map-side within a
    job, across jobs/shards/stream batches by bin-wise count addition
    (associative + commutative), unlike rank-based sketches whose
    merge is approximate.

    Binning is exact-integer FLOOR division (via pmod — ``cast`` after
    ``/`` would truncate toward zero and merge the first negative bin
    into bin 0, diverging from DuckDB's ``//``; review finding r6), so
    refunds/negative values bin identically on every engine, and the
    decimal division stays exact beyond 2^53 cents."""
    fdiv = ((cents - F.pmod(cents, F.lit(width))).cast("decimal(38,0)")
            / width).cast("bigint")
    return (df.select(fdiv.alias("bin"))
            .groupBy("bin").agg(F.count("*").cast("bigint").alias("c")))


def merge_histograms(parts: DataFrame) -> DataFrame:
    """Bin-wise sum — the sketch merge."""
    return parts.groupBy("bin").agg(F.sum("c").cast("bigint").alias("c"))


def histogram_quantiles(hist: DataFrame,
                        probes=QUANTILE_PROBES,
                        width: int = HIST_BIN_CENTS,
                        scope_cols: tuple[str, ...] = ()) -> DataFrame:
    """(…scope_cols, quantile, est_usd) from a merged (bin, c)
    histogram: exact-integer ceil-rank selection + floor interpolation
    inside the hit bin — bit-identical on any engine or partitioning.
    ONE implementation shared by q189 (per-scope + 'ALL' merge) and the
    streaming sketch (review finding r6: the inline q189 copy and this
    device could drift). ``scope_cols`` partitions every window; with
    no scopes the windows run over the single bounded bin domain."""
    from pyspark.sql import Window

    spark = hist.sparkSession
    sc = list(scope_cols)
    wc = Window.partitionBy(*sc).orderBy("bin") \
        .rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.partitionBy(*sc)
    cum = (hist.withColumn("cum", F.sum("c").over(wc))
           .withColumn("n", F.sum("c").over(wn)))
    qs = local_df(spark, list(probes), "qn long, qd long, qname string")
    probe = cum.crossJoin(F.broadcast(qs)) \
        .withColumn("r", F.expr("(n * qn + qd - 1) div qd"))
    hit = (probe.filter(F.col("cum") >= F.col("r"))
           .groupBy(*sc, "qname").agg(F.min("bin").alias("bin")))
    est = (
        hit.join(cum, sc + ["bin"])
        .join(F.broadcast(qs), "qname")
        .withColumn("r", F.expr("(n * qn + qd - 1) div qd"))
        .withColumn("est_cents",
                    F.col("bin") * width
                    + F.expr(f"((r - (cum - c)) * {width}) div c"))
    )
    return (est.select(*sc, F.col("qname").alias("quantile"),
                       (F.col("est_cents").cast("double") / 100.0)
                       .alias("est_usd"))
            .orderBy(*sc, "quantile"))
