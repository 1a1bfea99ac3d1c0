"""Corpus-quality queries for LLM-data curation (driver mandate /
SURVEY.md §7.4 extension; no reference counterpart — the reference's
analytics stop at trade KPIs): Gopher-style repetition filters, exact
length percentiles, and a unigram-LM surprisal ranking. Oracle SQL
shares the exact tokenizer with queries.text (``string_split_regex``)
and rounds at the same points.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sunat_rree_demo_spark.operators.text import (
    repetition_signals,
    unigram_surprisal,
)
from sunat_rree_demo_spark.queries.base import register, t

_L = "string_split_regex(trim(text), '\\s+')"


# ---------------------------------------------------------------------- q72
@register(
    "q72_repetition_signals",
    oracle=f"""
    WITH tt AS (SELECT doc_id, {_L} AS l FROM documents),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(l)),
                                   i -> l[i] || ' ' || l[i + 1])) AS bigram
      FROM tt
    ),
    mx AS (
      SELECT doc_id, max(c) AS max_bg
      FROM (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2)
      GROUP BY doc_id
    )
    SELECT tt.doc_id,
           CAST(len(l) AS BIGINT) AS n_tokens,
           round(1.0 - CAST(len(list_distinct(l)) AS DOUBLE) / len(l), 4)
             AS dup_token_frac,
           CASE WHEN len(l) > 1
                THEN round(coalesce(mx.max_bg, 0) * 1.0 / (len(l) - 1), 4)
                ELSE 0.0 END AS top_bigram_frac
    FROM tt LEFT JOIN mx USING (doc_id)
    ORDER BY doc_id
    """,
    tags=("quality", "repetition"),
)
def q72_repetition_signals(spark, sf_dir):
    """Gopher-style repetition signals per document: duplicate-token
    fraction and most-frequent-bigram coverage (Rae et al. 2021 §A1.1).
    Unigram side is array expressions on the scan; the bigram side
    shuffles once on the high-cardinality doc id (lead-window pair
    construction reuses that partitioning)."""
    d = t(spark, sf_dir, "documents")
    return repetition_signals(d, "doc_id", "text").orderBy("doc_id")


# ---------------------------------------------------------------------- q73
_QC = "round(quantile_cont(n_chars, {p}), 4)"


@register(
    "q73_length_percentiles",
    oracle=f"""
    SELECT lang,
           count(*) AS n_docs,
           {_QC.format(p=0.25)} AS p25,
           {_QC.format(p=0.5)} AS p50,
           {_QC.format(p=0.75)} AS p75,
           {_QC.format(p=0.99)} AS p99
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("quality", "percentiles"),
)
def q73_length_percentiles(spark, sf_dir):
    """Exact doc-length percentiles per language (linear interpolation —
    Spark ``percentile`` and DuckDB ``quantile_cont`` share the
    (n−1)·p definition). Exact percentiles buffer one group's values,
    which is fine for bounded-cardinality groups like ``lang``; the
    corpus-wide scale path is ``approx_percentile`` (GK sketch,
    mergeable, bounded memory) — its error bound is pinned against this
    exact form in tests/test_quality.py."""
    d = t(spark, sf_dir, "documents")
    pct = F.percentile(F.col("n_chars"),
                       F.array(*[F.lit(p) for p in (0.25, 0.5, 0.75, 0.99)]))
    return (
        d.groupBy("lang")
        .agg(F.count("*").alias("n_docs"), pct.alias("_p"))
        .select("lang", "n_docs",
                F.round(F.element_at("_p", 1), 4).alias("p25"),
                F.round(F.element_at("_p", 2), 4).alias("p50"),
                F.round(F.element_at("_p", 3), 4).alias("p75"),
                F.round(F.element_at("_p", 4), 4).alias("p99"))
        .orderBy("lang")
    )


# ---------------------------------------------------------------------- q74
@register(
    "q74_unigram_surprisal",
    oracle=f"""
    WITH tk AS (SELECT doc_id, unnest({_L}) AS tok FROM documents),
    freq AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
    tot AS (SELECT sum(c) AS n FROM freq),
    agg AS (
      SELECT doc_id,
             count(*) AS n_tokens,
             sum(CAST(round(-log2(CAST(c AS DOUBLE) / n) * 1000000, 0)
                      AS BIGINT)) AS ub
      FROM tk JOIN freq USING (tok), tot
      GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           CAST((2 * ub + 100 * n_tokens) // (200 * n_tokens) AS DOUBLE)
             / 10000.0 AS avg_surprisal
    FROM agg
    ORDER BY doc_id
    """,
    tags=("quality", "lm-score"),
)
def q74_unigram_surprisal(spark, sf_dir):
    """Mean unigram surprisal per document against the corpus's own
    unigram LM — the cheap perplexity proxy for quality-based selection
    (CCNet-style, Wenzek et al. 2020). Per-token surprisal is quantized
    to integer micro-bits on both engines so the per-doc sum is exact
    and addend-order-free (see operators.text.unigram_surprisal)."""
    d = t(spark, sf_dir, "documents")
    return unigram_surprisal(d, "doc_id", "text").orderBy("doc_id")
