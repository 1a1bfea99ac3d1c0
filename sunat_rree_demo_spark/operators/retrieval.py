"""Retrieval scoring operators: the BM25 pipeline shared by the q98
direct query and the plans.retrieval index-backed search — one scoring
implementation, two data paths, so the index build is provably
score-identical to scanning the corpus (SURVEY.md §7.4 extension; no
reference counterpart)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bm25_doc_scores(tf: DataFrame, dl: DataFrame, nd: DataFrame,
                    st: DataFrame, k1: float, b: float,
                    dfq: DataFrame | None = None) -> DataFrame:
    """Per-document BM25 totals from the four BM25 statistics tables:

    - ``tf``  (doc_id, term, tf): query-term frequencies per doc,
    - ``dl``  (doc_id, dl): document lengths,
    - ``nd``  1-row (n): corpus document count,
    - ``st``  1-row (avgdl): mean document length, pre-rounded to 6dp,
    - ``dfq`` (term, df) optional: per-term document frequencies — an
      index supplies the stored values; when None they derive from
      ``tf`` (exactly the same numbers: tf filtered to the query terms
      still contains every doc holding each term).

    Returns (doc_id, score_micro BIGINT, bm25 DOUBLE). Per-term scores
    quantize to integer micro-units (Lucene +1 idf, the q74/q98
    discipline) BEFORE the per-doc sum, so addend order can never move
    the 6dp result and both engines agree bit-for-bit.

    Scale shape: tf is the only corpus-grain input and shuffles once on
    the doc key for the final sum; idf is a |terms|-row broadcast; N
    and avgdl ride broadcast 1-row frames — no driver collect."""
    if dfq is None:
        dfq = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    idf = (dfq.join(F.broadcast(nd))
           .select("term",
                   F.round(F.log((F.col("n") - F.col("df") + 0.5)
                                 / (F.col("df") + 0.5) + 1.0)
                           * 1000000.0, 0).cast("bigint").alias("idf_u")))
    u = F.round(
        F.col("idf_u")
        * ((F.col("tf") * (k1 + 1.0))
           / (F.col("tf") + k1
              * ((1.0 - b) + b * (F.col("dl") / F.col("avgdl"))))), 0) \
        .cast("bigint")
    return (
        tf.join(dl, "doc_id")
        .join(F.broadcast(idf), "term")
        .join(F.broadcast(st))
        .select("doc_id", u.alias("u"))
        .groupBy("doc_id")
        .agg(F.sum("u").cast("bigint").alias("score_micro"))
        .withColumn("bm25", F.round(F.col("score_micro") / 1000000.0, 6))
    )
