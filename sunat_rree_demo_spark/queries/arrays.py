"""Array-column and range-frame surface: vector-norm stats over the
embedding arrays, per-group quality ranking, and RANGE-frame trailing
windows (time-based frames — ROWS frames are covered by the KPI layer).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from sunat_rree_demo_spark.operators.similarity import as_double, norm
from sunat_rree_demo_spark.queries.base import register, t


# ---------------------------------------------------------------------- q58
@register(
    "q58_embedding_norms",
    oracle="""
    WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT label,
           count(*) AS n_vectors,
           round(avg(sqrt(list_dot_product(v, v))), 6) AS avg_norm,
           round(min(sqrt(list_dot_product(v, v))), 6) AS min_norm,
           round(max(sqrt(list_dot_product(v, v))), 6) AS max_norm
    FROM e
    GROUP BY label
    ORDER BY label
    """,
    tags=("arrays", "vector-stats"),
)
def q58_embedding_norms(spark, sf_dir):
    """Vector-norm stats per label — array columns as first-class
    aggregation inputs (the sequential fold is bit-identical to DuckDB's
    list_dot_product, so only the avg needs rounding)."""
    e = t(spark, sf_dir, "embeddings")
    nrm = norm(as_double(F.col("embedding")))
    return (
        e.select("label", nrm.alias("_n"))
        .groupBy("label")
        .agg(F.count("*").alias("n_vectors"),
             F.round(F.avg("_n"), 6).alias("avg_norm"),
             F.round(F.min("_n"), 6).alias("min_norm"),
             F.round(F.max("_n"), 6).alias("max_norm"))
        .orderBy("label")
    )


# ---------------------------------------------------------------------- q59
_Q = ("round(0.5 * (CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE)"
      " / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE))"
      " + 0.5 * least(CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) / 100.0, 1.0), 4)")


@register(
    "q59_quality_ranked_docs",
    oracle=f"""
    WITH scored AS (SELECT doc_id, lang, {_Q} AS quality FROM documents)
    SELECT lang, doc_id, quality,
           CAST(row_number() OVER (PARTITION BY lang
                                   ORDER BY quality DESC, doc_id) AS INT) AS rank
    FROM scored
    QUALIFY rank <= 3
    ORDER BY lang, rank
    """,
    tags=("text", "ranking"),
)
def q59_quality_ranked_docs(spark, sf_dir):
    """Top-3 documents per language by quality score — the data-curation
    selection step (rank on the rounded score so both engines agree
    under ties, doc_id tiebreak)."""
    from sunat_rree_demo_spark.operators.text import quality_score, tokens

    d = t(spark, sf_dir, "documents")
    scored = d.select("doc_id", "lang",
                      quality_score(tokens(F.col("text"))).alias("quality"))
    w = Window.partitionBy("lang").orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("lang", "doc_id", "quality", "rank")
        .orderBy("lang", "rank")
    )


# ---------------------------------------------------------------------- q60
@register(
    "q60_range_frame_window",
    oracle="""
    WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS tms FROM events)
    SELECT event_id, user_id,
           CAST(count(*) OVER (PARTITION BY user_id ORDER BY tms
                               RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_trailing_1h
    FROM e
    ORDER BY user_id, event_id
    """,
    tags=("range-frame", "W-time"),
)
def q60_range_frame_window(spark, sf_dir):
    """RANGE-frame window: per event, how many events the same user
    produced in the trailing hour (inclusive). Value-based frames are
    the time-series complement of the KPI layer's ROWS frames; the
    count is tie-order independent, so no tiebreak is needed."""
    e = t(spark, sf_dir, "events")
    ev = e.select("event_id", "user_id", F.unix_millis("ts").alias("tms"))
    w = (Window.partitionBy("user_id").orderBy("tms")
         .rangeBetween(-3600000, 0))
    return (
        ev.withColumn("n_trailing_1h", F.count("*").over(w).cast("bigint"))
        .select("event_id", "user_id", "n_trailing_1h")
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------- q67
@register(
    "q67_label_centroids",
    oracle="""
    WITH ex AS (
      SELECT label,
             unnest(list_transform(embedding::DOUBLE[],
                    (x, i) -> struct_pack(ord := i, val := x))) AS u
      FROM embeddings
    )
    SELECT label, CAST(u.ord - 1 AS BIGINT) AS pos,
           round(avg(u.val), 6) AS centroid
    FROM ex GROUP BY label, u.ord ORDER BY label, pos
    """,
    tags=("arrays", "centroids"),
)
def q67_label_centroids(spark, sf_dir):
    """Per-label centroid of the embedding vectors, long format
    (label, dimension position, mean component) — the class-prototype /
    cluster-centroid primitive. posexplode → two-phase avg per
    (label, pos): shuffle key cardinality = labels × dims, uniform, so
    the plan is flat at any corpus size (the explode is dim× the scan,
    all map-side)."""
    e = t(spark, sf_dir, "embeddings")
    ex = e.select(
        "label",
        F.posexplode(as_double(F.col("embedding"))).alias("pos", "val"))
    return (
        ex.groupBy("label", "pos")
        .agg(F.round(F.avg("val"), 6).alias("centroid"))
        .select("label", F.col("pos").cast("bigint").alias("pos"), "centroid")
        .orderBy("label", "pos")
    )
