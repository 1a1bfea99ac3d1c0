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
    tokens,
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
           CASE WHEN len(l) > 0
                THEN round(1.0 - CAST(len(list_distinct(l)) AS DOUBLE)
                           / len(l), 4)
                ELSE 0.0 END AS dup_token_frac,
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


# ---------------------------------------------------------------------- q80
@register(
    "q80_importance_weights",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, lang,
             ('0x' || substr(sha256('feat:' || tok), 1, 12))::UBIGINT % 256
               AS b
      FROM (SELECT doc_id, lang, unnest({_L}) AS tok FROM documents)
    ),
    cr AS (SELECT b, count(*) AS crn FROM tk GROUP BY b),
    ct AS (SELECT b, count(*) AS ctn FROM tk WHERE lang = 'en' GROUP BY b),
    tot AS (SELECT (SELECT sum(crn) FROM cr) AS nr,
                   (SELECT sum(ctn) FROM ct) AS nt),
    wt AS (
      SELECT cr.b,
             CAST(round(log2(((coalesce(ct.ctn, 0) + 1.0) / (cr.crn + 1.0))
                             * ((nr + 256.0) / (nt + 256.0)))
                        * 1000000, 0) AS BIGINT) AS w
      FROM cr LEFT JOIN ct USING (b), tot
    ),
    doc AS (
      SELECT doc_id, lang, count(*) AS n_tokens, sum(w) AS ub
      FROM tk JOIN wt USING (b)
      GROUP BY doc_id, lang
    )
    SELECT doc_id, lang, n_tokens,
           CAST((2 * (ub + n_tokens * 64000000) + 100 * n_tokens)
                // (200 * n_tokens) AS DOUBLE) / 10000.0 - 64.0
             AS avg_log_ratio
    FROM doc
    ORDER BY doc_id
    """,
    tags=("quality", "data-selection"),
)
def q80_importance_weights(spark, sf_dir):
    """DSIR-style importance weights (Xie et al. 2023,
    arXiv:2302.03169): score each document by the mean log-likelihood
    ratio of its hashed token features under the TARGET distribution
    (here: the lang='en' slice) vs the RAW corpus, with Laplace
    smoothing — the data-selection op that decides what to upsample
    into a pretraining mix.

    Determinism/parity: the feature hash is the sha-256-prefix device
    shared with hash_split/sample_bucket; per-BUCKET weights (256 of
    them) are quantized to integer micro-bits once, so the per-doc sum
    is exact integer arithmetic; the final 4dp mean uses the shifted
    half-up integer rounding (weights can be negative, and Spark's
    ``div`` truncates while DuckDB's ``//`` floors — shifting by +64
    bits keeps the dividend positive where both agree).

    Scale shape: see operators.text.importance_weights (one bucket
    shuffle + one doc shuffle, weight table and totals broadcast)."""
    from sunat_rree_demo_spark.operators.text import importance_weights

    d = t(spark, sf_dir, "documents")
    return (
        importance_weights(d, "doc_id", "text",
                           target=F.col("lang") == "en",
                           keep_cols=("lang",))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------- q83
@register(
    "q83_winsorized_stats",
    oracle=f"""
    WITH cuts AS (
      SELECT lang,
             round(quantile_cont(n_chars, 0.05), 6) AS lo,
             round(quantile_cont(n_chars, 0.95), 6) AS hi
      FROM documents GROUP BY lang
    ),
    clipped AS (
      SELECT d.lang,
             CAST(round(least(greatest(d.n_chars, c.lo), c.hi) * 1000000, 0)
                  AS BIGINT) AS wu
      FROM documents d JOIN cuts c USING (lang)
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST((2 * sum(wu) + 100 * count(*)) // (200 * count(*))
                AS DOUBLE) / 10000.0 AS mean_winsorized
    FROM clipped
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("quality", "robust-stats"),
)
def q83_winsorized_stats(spark, sf_dir):
    """Winsorized mean document length per language: clip to the
    [p05, p95] percentile band, then average — the robust-stats
    companion to the σ/MAD outlier queries (q27/q50) that tolerates
    heavy-tailed length distributions instead of discarding rows.

    Two-pass shape: pass 1 computes per-group cuts (exact interpolated
    percentiles, 6dp-rounded — bounded-cardinality groups; the
    corpus-wide path swaps in approx_percentile); the tiny cut table
    broadcasts back onto the scan for the clip. Clipped values are
    quantized to integer micro-units so the group sum is exact and the
    4dp mean uses the same integer half-up rounding as q74 (values
    non-negative, so Spark div == DuckDB //)."""
    d = t(spark, sf_dir, "documents")
    cuts = (
        d.groupBy("lang")
        .agg(F.round(F.percentile("n_chars", F.lit(0.05)), 6).alias("lo"),
             F.round(F.percentile("n_chars", F.lit(0.95)), 6).alias("hi"))
    )
    clipped = (
        d.join(F.broadcast(cuts), "lang")
        .select("lang",
                F.round(F.least(F.greatest(F.col("n_chars").cast("double"),
                                           F.col("lo")), F.col("hi"))
                        * 1000000.0, 0).cast("bigint").alias("wu"))
    )
    return (
        clipped.groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("wu").alias("_s"))
        .select("lang", "n_docs",
                (F.expr("(2 * _s + 100 * n_docs) div (200 * n_docs)")
                 .cast("double") / 10000.0).alias("mean_winsorized"))
        .orderBy("lang")
    )


# ---------------------------------------------------------------------- q84
@register(
    "q84_priority_sample",
    oracle="""
    WITH pri AS (
      SELECT doc_id, n_chars,
             CAST(('0x' || substr(sha256('ws:' || CAST(doc_id AS VARCHAR)),
                                  1, 12))::UBIGINT + 1 AS DOUBLE)
               / n_chars AS priority
      FROM documents
      WHERE n_chars > 0
    )
    SELECT doc_id, n_chars, priority
    FROM pri
    ORDER BY priority, doc_id
    LIMIT 50
    """,
    tags=("quality", "sampling"),
)
def q84_priority_sample(spark, sf_dir):
    """Weighted sample of 50 documents, weight ∝ length — priority
    sampling (Duffield, Lund & Thorup, JACM 2007): each row draws a
    deterministic uniform from the sha-256-prefix device (domain
    'ws:', disjoint from split/sample salts) and takes priority
    u/weight; the k smallest priorities are the sample. Content-stable
    across runs/engines/partitionings like every sampling op here — no
    RNG state. The (48-bit integer + 1)/weight division is ONE IEEE
    operation, so both engines get bit-identical priorities and the
    selected set needs no rounding guard; doc_id breaks exact ties.

    Scale shape: priorities are map-side expressions on the scan;
    top-k plans as TakeOrderedAndProject (per-partition k then merge —
    no global sort)."""
    d = t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    pri = (
        F.conv(F.substring(
            F.sha2(F.concat(F.lit("ws:"), F.col("doc_id").cast("string")),
                   256), 1, 12), 16, 10).cast("bigint") + 1
    ).cast("double") / F.col("n_chars")
    return (
        d.select("doc_id", "n_chars", pri.alias("priority"))
        .orderBy("priority", "doc_id")
        .limit(50)
    )


#: q133 vocabulary size.
VOCAB_V = 100


# --------------------------------------------------------------------- q132
@register(
    "q132_bigram_surprisal",
    oracle=f"""
    WITH tt AS (SELECT doc_id, {_L} AS l FROM documents),
    uc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
           FROM (SELECT unnest(l) AS tok FROM tt) GROUP BY 1),
    vs AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uc),
    bg AS (SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
           FROM tt, unnest(range(1, len(l))) AS u(i)),
    bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb
           FROM bg GROUP BY 1, 2),
    sc AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS nb,
             sum(CAST(round(log2(CAST(c1.c + vs.v AS DOUBLE) / (bc.cb + 1))
                            * 1000000, 0) AS BIGINT)) AS ub
      FROM bg JOIN bc USING (w1, w2) JOIN uc c1 ON bg.w1 = c1.tok, vs
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(sc.nb, 0) AS n_bigrams,
           CASE WHEN sc.nb IS NOT NULL THEN
             CAST((2 * ub + 100 * nb) // (200 * nb) AS DOUBLE) / 10000.0
           ELSE 0.0 END AS avg_surprisal
    FROM documents d LEFT JOIN sc USING (doc_id)
    ORDER BY d.doc_id
    """,
    tags=("quality", "lm-score", "bigram"),
)
def q132_bigram_surprisal(spark, sf_dir):
    """Mean add-one-smoothed bigram surprisal per doc against the
    corpus's own bigram LM — the next LM order up from q74's unigram
    proxy and the shape of the KenLM perplexity filters CCNet used for
    quality-based selection. Micro-bit integer quantization before the
    per-doc sum keeps both engines bit-identical at 4dp (see
    operators.text.bigram_surprisal)."""
    from sunat_rree_demo_spark.operators.text import bigram_surprisal

    d = t(spark, sf_dir, "documents")
    return bigram_surprisal(d, "doc_id", "text").orderBy("doc_id")


# --------------------------------------------------------------------- q133
@register(
    "q133_vocab_coverage",
    oracle=f"""
    WITH tk AS (SELECT doc_id, unnest({_L}) AS tok FROM documents),
    uc AS (SELECT tok, count(*) AS c FROM tk GROUP BY 1),
    vocab AS (SELECT tok FROM uc ORDER BY c DESC, tok LIMIT {VOCAB_V}),
    per AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov
      FROM tk LEFT JOIN vocab v USING (tok)
      GROUP BY 1
    )
    SELECT doc_id, n_tokens, n_oov,
           CAST((2 * 10000 * n_oov + n_tokens) // (2 * n_tokens) AS DOUBLE)
             / 10000.0 AS oov_rate
    FROM per ORDER BY doc_id
    """,
    tags=("quality", "vocab", "oov"),
)
def q133_vocab_coverage(spark, sf_dir):
    """Per-doc OOV rate against the corpus's own top-100 vocabulary
    (count DESC, token ASC tiebreak) — the tokenizer-coverage audit run
    before committing a vocab (high OOV docs are either noise or
    domains the vocab underserves). The rate is the half-up integer
    device at 4dp; the vocabulary is a bounded TakeOrdered broadcast,
    so the corpus shuffles only for its own token counts."""
    from sunat_rree_demo_spark.operators.text import oov_stats

    d = t(spark, sf_dir, "documents")
    return oov_stats(d, "doc_id", "text", VOCAB_V).orderBy("doc_id")


# --------------------------------------------------------------------- q156
@register(
    "q156_surprisal_yield_curve",
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
    ),
    per AS (
      SELECT doc_id, n_tokens,
             CAST((2 * ub + 100 * n_tokens) // (200 * n_tokens) AS DOUBLE)
               / 10000.0 AS avg_surprisal
      FROM agg
    ),
    dec AS (
      SELECT ntile(10) OVER (ORDER BY avg_surprisal, doc_id) AS decile,
             n_tokens,
             CAST(round(avg_surprisal * 10000, 0) AS BIGINT) AS su
      FROM per
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CAST(n_tokens AS BIGINT)) AS BIGINT) AS total_tokens,
           CAST((2 * sum(su) + count(*)) // (2 * count(*)) AS DOUBLE)
             / 10000.0 AS avg_surprisal
    FROM dec GROUP BY 1 ORDER BY 1
    """,
    tags=("quality", "lm-score", "selection-curve"),
)
def q156_surprisal_yield_curve(spark, sf_dir):
    """Perplexity-filter YIELD CURVE: docs bucketed into surprisal
    deciles (ntile over the exact 4dp per-doc mean, doc-id tiebreak),
    with per-decile doc count and token mass — the table a selection
    threshold is actually tuned from ("dropping the top-k deciles
    costs this many tokens", CCNet-style). Shares q74's micro-bit
    surprisal core; the decile average uses the integer micro-unit
    half-up mean.

    Scale shape (r6 rewrite of the one data-grain global window the r5
    verdict flagged): the decile is ``ntile(10)`` BY VALUE, not by
    window — ``domain_rank`` decomposes the global ``row_number() OVER
    (ORDER BY avg_surprisal, doc_id)`` into a distinct-value running
    count (the only unpartitioned window, bounded by the 4dp surprisal
    DOMAIN, not the corpus) plus a value-partitioned tiebreak rank,
    and ``ntile_from_rank`` reproduces the SQL ntile bucket boundaries
    arithmetically from (rank, total). Bit-identical to the DuckDB
    ``ntile`` oracle; no doc-grain row ever funnels through one task
    (pinned by tests/test_plan_contracts.py::
    test_q156_no_doc_grain_global_window)."""
    from sunat_rree_demo_spark.operators.windows import (
        domain_rank,
        ntile_from_rank,
    )

    d = t(spark, sf_dir, "documents")
    per = unigram_surprisal(d, "doc_id", "text")
    total = per.agg(F.count("*").cast("bigint").alias("_n"))
    dec = (
        domain_rank(per, "avg_surprisal", "doc_id", "rn")
        .join(F.broadcast(total))
        .withColumn("decile", ntile_from_rank(F.col("rn"), F.col("_n"), 10))
        .withColumn("su", F.round(F.col("avg_surprisal") * 10000, 0)
                    .cast("bigint"))
    )
    return (
        dec.groupBy("decile")
        .agg(F.count("*").cast("bigint").alias("n_docs"),
             F.sum("n_tokens").cast("bigint").alias("total_tokens"),
             (F.expr("(2 * sum(su) + count(*)) div (2 * count(*))")
              .cast("double") / 10000.0).alias("avg_surprisal"))
        .orderBy("decile")
    )


# --------------------------------------------------------------------- q171
@register(
    "q171_vocab_kl_divergence",
    oracle=f"""
    WITH tk AS (SELECT source, unnest({_L}) AS tok FROM documents),
    cs AS (SELECT source, tok, count(*) AS c FROM tk GROUP BY 1, 2),
    ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cs GROUP BY 1),
    g AS (SELECT tok, CAST(sum(c) AS BIGINT) AS gc FROM cs GROUP BY 1),
    tot AS (SELECT CAST(sum(gc) AS BIGINT) AS ng FROM g),
    w AS (
      SELECT cs.source, cs.c,
             CAST(round(log2((CAST(cs.c AS DOUBLE) * ng) /
                             (CAST(ns.n AS DOUBLE) * gc)) * 1000000, 0)
                  AS BIGINT) AS wb
      FROM cs JOIN ns USING (source) JOIN g USING (tok), tot),
    agg AS (
      SELECT source, CAST(sum(c * wb) AS BIGINT) AS ub,
             count(*) AS vocab_size
      FROM w GROUP BY source)
    SELECT a.source, ns.n AS n_tokens, a.vocab_size,
           CAST((2 * (ub + ns.n * 64000000) + 100 * ns.n) // (200 * ns.n)
                AS DOUBLE) / 10000.0 - 64.0 AS kl_bits
    FROM agg a JOIN ns USING (source)
    ORDER BY a.source
    """,
    tags=("quality", "corpus-stats", "data-selection"),
)
def q171_vocab_kl_divergence(spark, sf_dir):
    """Per-source vocabulary drift: KL(source unigram dist ‖ corpus
    unigram dist) in bits/token — the corpus-mixture diagnostic that
    flags a source whose token distribution diverges from the blend
    (domain skew, boilerplate, language drift) before it trains.
    KL = Σ_tok p·log2(p/q) with p the source's and q the global
    distribution; Gibbs' inequality keeps it ≥ 0.

    Same exactness device as q74/q80: each token TYPE's log-ratio is
    quantized to integer micro-bits, weighted by its exact integer
    count, summed (order-free), and the final per-token mean is rounded
    half-up in integer arithmetic with a +64-bit offset so the division
    is non-negative on both engines.

    Scale shape: one token-grain shuffle to (source, token) counts with
    map-side combine; everything after runs at VOCAB grain (sums per
    token, per source, the log-ratio join), orders of magnitude smaller
    than the corpus. The 1-row global total rides a broadcast."""
    d = t(spark, sf_dir, "documents")
    tk = d.select("source", F.explode(tokens(F.col("text"))).alias("_tok"))
    cs = tk.groupBy("source", "_tok").agg(F.count("*").alias("_c"))
    ns = cs.groupBy("source").agg(F.sum("_c").cast("bigint").alias("_n"))
    g = cs.groupBy("_tok").agg(F.sum("_c").cast("bigint").alias("_gc"))
    tot = g.agg(F.sum("_gc").cast("bigint").alias("_ng"))
    w = (
        cs.join(ns, "source").join(g, "_tok").join(F.broadcast(tot))
        .select("source", "_c", "_n",
                F.round(F.log2((F.col("_c").cast("double") * F.col("_ng"))
                               / (F.col("_n").cast("double") * F.col("_gc")))
                        * 1000000.0, 0).cast("bigint").alias("_wb"))
    )
    return (
        w.groupBy("source")
        .agg(F.first("_n").alias("n_tokens"),
             F.sum(F.col("_c") * F.col("_wb")).cast("bigint").alias("_ub"),
             F.count("*").alias("vocab_size"))
        .select("source", "n_tokens", "vocab_size",
                (F.expr("(2 * (_ub + n_tokens * 64000000) + 100 * n_tokens)"
                        " div (200 * n_tokens)").cast("double") / 10000.0
                 - 64.0).alias("kl_bits"))
        .orderBy("source")
    )
