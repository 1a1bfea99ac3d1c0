"""Corpus-processing queries beyond the q39-q42 dedup core: exact
substring-chunk dedup (Lee et al. 2021), prefix-filtered set-similarity
join (PPJoin family), and BM25 relevance scoring — the retrieval /
data-cleaning operations a training-data pipeline runs between dedup
and packing. All oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sunat_rree_demo_spark.operators.dedup import prefix_filter_jaccard_pairs
from sunat_rree_demo_spark.operators.text import tokens
from sunat_rree_demo_spark.queries.base import register, t
from sunat_rree_demo_spark.queries.dedup import _SHINGLE_CTE

#: non-overlapping chunk width for q96 (tokens per chunk)
CHUNK_N = 8

#: BM25 constants (Robertson-Spärck Jones defaults) + a fixed query.
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("spark", "dup", "stream")


# ---------------------------------------------------------------------- q96
@register(
    "q96_chunk_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
      FROM documents
    ),
    ch AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(0, len(tk) // {CHUNK_N}),
               i -> array_to_string(
                 tk[{CHUNK_N}*i+1 : {CHUNK_N}*i+{CHUNK_N}], ' ')))) AS chunk
      FROM toks WHERE len(tk) >= {CHUNK_N}
    ),
    cd AS (SELECT chunk, count(DISTINCT doc_id) AS nd FROM ch GROUP BY 1),
    per AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
      FROM ch JOIN cd USING (chunk) GROUP BY 1
    )
    SELECT doc_id, n_chunks, n_dup AS n_dup_chunks,
           CAST((2*10000*n_dup + n_chunks) // (2*n_chunks) AS DOUBLE)
             / 10000.0 AS dup_frac
    FROM per ORDER BY doc_id
    """,
    tags=("dedup", "substring"),
)
def q96_chunk_dedup(spark, sf_dir):
    """Exact substring-chunk dedup signal (Lee et al. 2021, 'Deduplicating
    Training Data Makes Language Models Better', at non-overlapping
    8-token chunk grain): per doc, how many of its distinct chunks
    also appear in ANOTHER document — the cross-doc boilerplate measure
    that drives substring-level dedup decisions.

    Scale shape: chunking rides the same Arrow-batched Python pass as
    the shinglers (at most len/8 chunks per doc — far lighter than
    shingling), then ONE uniform-key shuffle on the chunk string for the
    document-frequency aggregate and one back-join + doc-grain count.
    The dup fraction is integer half-up arithmetic ((2·10⁴·d + c) div 2c)
    so no float sum or round can drift between engines. (Operator:
    operators.dedup.chunk_dup_stats, also the curate plan's optional
    boilerplate gate.)"""
    from sunat_rree_demo_spark.operators.dedup import chunk_dup_stats

    d = t(spark, sf_dir, "documents")
    return chunk_dup_stats(d, "doc_id", "text", CHUNK_N).orderBy("doc_id")



# ---------------------------------------------------------------------- q97
@register(
    "q97_prefix_filter_pairs",
    memoize=False,  # builder localCheckpoints shingle arrays (eager-ish)
    oracle=f"""
      WITH {_SHINGLE_CTE},
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ),
      jac AS (
        SELECT id1, id2,
               CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS j
        FROM inter
        JOIN sizes sa ON id1 = sa.doc_id
        JOIN sizes sb ON id2 = sb.doc_id
      )
      SELECT id1, id2, round(j, 4) AS jaccard FROM jac WHERE j >= 0.8
      ORDER BY id1, id2
    """,
    tags=("dedup", "prefix-filter"),
)
def q97_prefix_filter_pairs(spark, sf_dir):
    """Exact 5-gram Jaccard pairs ≥ 0.8 via PREFIX FILTERING — the third
    independent plan for exact set-similarity (vs q40's grouped
    combinations and q71's LSH-verified tier): rare-first prefix join +
    candidate-scale exact verify, lossless at any threshold, sharpest
    at high ones. The oracle is q40's exhaustive SQL at the 0.8 cut, so
    the prefix pruning is proven to drop nothing."""
    from sunat_rree_demo_spark.queries.dedup import corpus_shingle_arrays

    d = t(spark, sf_dir, "documents")
    return (prefix_filter_jaccard_pairs(d, "doc_id", "text",
                                        n=5, threshold=0.8,
                                        arr=corpus_shingle_arrays(spark, sf_dir))
            .orderBy("id1", "id2"))


# ---------------------------------------------------------------------- q98
@register(
    "q98_bm25_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents
    ),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
           FROM toks GROUP BY 1),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    st AS (SELECT round(avg(dl), 6) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM toks WHERE term IN {BM25_TERMS!r} GROUP BY 1, 2
    ),
    dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    idf AS (
      SELECT term,
             CAST(round(ln((n - df + 0.5) / (df + 0.5) + 1.0)
                        * 1000000.0) AS BIGINT) AS idf_u
      FROM dfq, nd
    ),
    sc AS (
      SELECT tf.doc_id,
             CAST(round(idf_u * ((tf * {BM25_K1 + 1.0}) /
                  (tf + {BM25_K1} * ({1.0 - BM25_B} +
                   {BM25_B} * (dl / avgdl))))) AS BIGINT) AS u
      FROM tf JOIN dl USING (doc_id) JOIN idf USING (term), st
    )
    SELECT doc_id, CAST(sum(u) AS BIGINT) AS score_micro,
           round(CAST(sum(u) AS BIGINT) / 1000000.0, 6) AS bm25
    FROM sc GROUP BY doc_id
    ORDER BY score_micro DESC, doc_id LIMIT 15
    """,
    tags=("retrieval", "bm25"),
)
def q98_bm25_topk(spark, sf_dir):
    """BM25 top-15 documents for a fixed 3-term query (k1=1.2, b=0.75,
    Lucene's +1 idf smoothing) — the retrieval scoring pass a corpus
    pipeline runs for quality probes and eval-set mining.

    Scale shape: term frequencies shuffle once on the (doc, term) key
    FILTERED to the query terms (pushdown makes the scan emit only
    matching tokens); document length is a doc-grain aggregate reused
    from the same exploded scan; N, avgdl and the per-term idf table
    ride broadcast 1-row/|q|-row frames — no driver collect. Per-term
    scores quantize to integer micro-units before the per-doc sum (the
    q74 discipline) so addend order can't move the 6dp result, and the
    top-k carries (score_micro, doc_id) as a total tiebreak."""
    from sunat_rree_demo_spark.operators.retrieval import bm25_doc_scores

    d = t(spark, sf_dir, "documents")
    tk = d.select(F.col("doc_id"),
                  F.explode(tokens(F.col("text"))).alias("term"))
    dl = tk.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("dl"))
    nd = d.agg(F.count("*").cast("bigint").alias("n"))
    st = dl.agg(F.round(F.avg("dl"), 6).alias("avgdl"))
    tf = (tk.filter(F.col("term").isin(*BM25_TERMS))
          .groupBy("doc_id", "term")
          .agg(F.count("*").cast("bigint").alias("tf")))
    return (
        bm25_doc_scores(tf, dl, nd, st, BM25_K1, BM25_B)
        .orderBy(F.desc("score_micro"), "doc_id")
        .limit(15)
    )


#: PMI collocation parameters.
PMI_MIN_COUNT = 5
PMI_TOP_K = 20


# --------------------------------------------------------------------- q108
@register(
    "q108_pmi_collocations",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
      FROM documents
    ),
    uni AS (
      SELECT unnest(tk) AS w FROM toks
    ),
    uc AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY 1),
    tu AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM uc),
    bg AS (
      SELECT tk[i] AS w1, tk[i + 1] AS w2
      FROM toks, unnest(range(1, len(tk))) AS u(i)
    ),
    bc AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS n
      FROM bg GROUP BY 1, 2
    ),
    tb AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM bc)
    SELECT w1, w2, n,
           CAST(round(log2((CAST(n AS DOUBLE) / tb.t)
                           / ((CAST(c1.c AS DOUBLE) / tu.t)
                              * (CAST(c2.c AS DOUBLE) / tu.t)))
                      * 1000000.0) AS BIGINT) / 1000000.0 AS pmi
    FROM bc
    JOIN uc c1 ON bc.w1 = c1.w
    JOIN uc c2 ON bc.w2 = c2.w, tu, tb
    WHERE n >= {PMI_MIN_COUNT}
    ORDER BY CAST(round(log2((CAST(n AS DOUBLE) / tb.t)
                             / ((CAST(c1.c AS DOUBLE) / tu.t)
                                * (CAST(c2.c AS DOUBLE) / tu.t)))
                        * 1000000.0) AS BIGINT) DESC, w1, w2
    LIMIT {PMI_TOP_K}
    """,
    tags=("text", "pmi", "collocation"),
)
def q108_pmi_collocations(spark, sf_dir):
    """Top-20 adjacent-bigram collocations by pointwise mutual
    information, PMI = log2(p(w1w2)/(p(w1)p(w2))) — the collocation
    miner a corpus pipeline runs for tokenizer-merge candidates and
    phrase detection (Mikolov et al. 2013's phrase scoring is this
    with a discount).

    Determinism: PMI quantizes to integer micro-bits (the q74
    discipline) and the top-k sorts on that integer with a (w1, w2)
    tiebreak. Scale shape: one token-grain shuffle for unigram counts,
    one bigram-grain shuffle for pair counts — both uniform hash keys
    with map-side combine; totals ride broadcast 1-row frames; the
    candidate join keys on the word (vocabulary-sized, AQE broadcasts
    when small)."""
    d = t(spark, sf_dir, "documents")
    # zip-of-slices over a materialized token column — the inlined
    # element_at(tokens(text), i) lambda re-tokenized per element
    # (O(len²); the interpreted-HOF trap, see text.bigram_surprisal)
    tk = F.col("_tok")
    toks = d.select(tokens(F.col("text")).alias("_tok"))
    uni = toks.select(F.explode(tk).alias("w"))
    uc = uni.groupBy("w").agg(F.count("*").cast("bigint").alias("c"))
    tu = uc.agg(F.sum("c").cast("bigint").alias("t_u"))
    bigrams = F.zip_with(
        F.slice(tk, 1, F.size(tk) - 1),
        F.slice(tk, 2, F.size(tk) - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
    bg = (toks.select(F.explode(F.when(F.size(tk) >= 2, bigrams)
                                .otherwise(F.array()
                                           .cast("array<struct<w1:string,"
                                                 "w2:string>>"))).alias("b"))
          .select("b.w1", "b.w2"))
    bc = bg.groupBy("w1", "w2").agg(F.count("*").cast("bigint").alias("n"))
    tb = bc.agg(F.sum("n").cast("bigint").alias("t_b"))
    c1 = uc.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    c2 = uc.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    pmi_u = F.round(
        F.log2((F.col("n").cast("double") / F.col("t_b"))
               / ((F.col("c1").cast("double") / F.col("t_u"))
                  * (F.col("c2").cast("double") / F.col("t_u"))))
        * 1000000.0, 0).cast("bigint")
    return (
        bc.filter(F.col("n") >= PMI_MIN_COUNT)
        .join(c1, "w1").join(c2, "w2")
        .join(F.broadcast(tu)).join(F.broadcast(tb))
        .select("w1", "w2", "n", pmi_u.alias("_pmi_u"))
        .orderBy(F.desc("_pmi_u"), "w1", "w2")
        .limit(PMI_TOP_K)
        .select("w1", "w2", "n",
                (F.col("_pmi_u") / 1000000.0).alias("pmi"))
    )


# --------------------------------------------------------------------- q127
@register(
    "q127_chunk_dedup_rewrite",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
      FROM documents
    ),
    ch AS (
      SELECT doc_id, i AS j,
             array_to_string(tk[{CHUNK_N}*i+1 : {CHUNK_N}*i+{CHUNK_N}], ' ')
               AS chunk
      FROM toks, unnest(range(0, len(tk) // {CHUNK_N})) AS u(i)
    ),
    keep AS (
      SELECT doc_id, j, chunk,
             row_number() OVER (PARTITION BY chunk ORDER BY doc_id, j) AS rn
      FROM ch
    ),
    agg AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed,
             string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY j)
               AS kept
      FROM keep GROUP BY 1
    ),
    tails AS (
      SELECT doc_id,
             CASE WHEN len(tk) % {CHUNK_N} > 0 THEN
               array_to_string(tk[(len(tk) // {CHUNK_N}) * {CHUNK_N} + 1
                                  : len(tk)], ' ')
             END AS tail
      FROM toks
    )
    SELECT t.doc_id,
           coalesce(a.n_chunks, 0) AS n_chunks,
           coalesce(a.n_removed, 0) AS n_removed,
           concat_ws(' ', CASE WHEN a.kept <> '' THEN a.kept END, t.tail)
             AS new_text
    FROM tails t LEFT JOIN agg a USING (doc_id)
    ORDER BY doc_id
    """,
    tags=("dedup", "substring", "rewrite"),
)
def q127_chunk_dedup_rewrite(spark, sf_dir):
    """Exact substring-chunk dedup APPLIED (Lee et al. 2021): keep each
    distinct 8-token chunk's first corpus-wide occurrence (by doc id,
    then position), drop every other occurrence, and emit each doc's
    rewritten text — the corpus a substring-level dedup pass actually
    ships, where q96 only measures the duplication. The oracle rebuilds
    the same keep-first election and ordered reassembly in SQL, so the
    rewritten strings themselves are hash-checked."""
    from sunat_rree_demo_spark.operators.dedup import chunk_dedup_rewrite

    d = t(spark, sf_dir, "documents")
    return chunk_dedup_rewrite(d, "doc_id", "text", CHUNK_N).orderBy("doc_id")


# --------------------------------------------------------------------- q143
#: Rabin–Karp window-key term sum, generated from the SAME constants as
#: operators.dedup.rolling_chunk_stats (ROLL_BASE=1000003,
#: ROLL_MOD=2³¹−1, powers B^(n-1-i) mod M baked as literals) so the
#: oracle recomputes the exact rolling-hash keys, not a lookalike.
_ROLLING_ORACLE = """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
      FROM documents
    ),
    hs AS (
      SELECT doc_id,
             list_transform(tk, t ->
               ('0x' || substr(sha256(t), 1, 7))::BIGINT) AS hv
      FROM toks WHERE len(tk) >= 8
    ),
    keys AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, len(hv) - 6),
               j -> (((hv[j+0] * 57298384) % 2147483647) + ((hv[j+1] * 2061642598) % 2147483647) + ((hv[j+2] * 1953433226) % 2147483647) + ((hv[j+3] * 1604566856) % 2147483647) + ((hv[j+4] * 1049561761) % 2147483647) + ((hv[j+5] * 1426104154) % 2147483647) + ((hv[j+6] * 1000003) % 2147483647) + ((hv[j+7] * 1) % 2147483647)) % 2147483647))) AS key
      FROM hs
    ),
    kd AS (SELECT key, count(DISTINCT doc_id) AS nd FROM keys GROUP BY 1),
    per AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_windows,
             CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
      FROM keys JOIN kd USING (key) GROUP BY 1
    )
    SELECT doc_id, n_windows, n_dup AS n_dup_windows,
           CAST((2*10000*n_dup + n_windows) // (2*n_windows) AS DOUBLE)
             / 10000.0 AS dup_frac
    FROM per ORDER BY doc_id
    """


@register(
    "q143_rolling_chunk_dups",
    oracle=_ROLLING_ORACLE,
    tags=("dedup", "substring", "rolling-hash"),
)
def q143_rolling_chunk_dups(spark, sf_dir):
    """OVERLAPPING 8-token window duplication signal via Rabin–Karp
    rolling-hash keys — the boundary-proof upgrade of q96: a duplicated
    run straddling a fixed chunk boundary is invisible to
    non-overlapping chunking (both its halves differ across docs) but
    always covers at least one overlapping window, so window-grain
    document frequency catches every ≥8-token shared run regardless of
    alignment (the property test in tests/test_llm_pipeline.py pins
    exactly this case). Keys are 64-bit polynomial hashes recomputed
    window-by-window in the DuckDB oracle from the same constants, so
    cross-engine hash equality — not just row counts — is what the gate
    checks. (Operator: operators.dedup.rolling_chunk_stats; reference
    scoping note: the reference stops at pandas-level exact dup drops,
    sunat_rree_demo/app.py:214.)"""
    from sunat_rree_demo_spark.operators.dedup import rolling_chunk_stats

    d = t(spark, sf_dir, "documents")
    return rolling_chunk_stats(d, "doc_id", "text", n=8).orderBy("doc_id")


# --------------------------------------------------------------------- q150
#: q143's window-key CTEs with a first-occurrence election instead of
#: a document-frequency count — ONE generated key expression, so the
#: two oracles cannot drift.
_ROLLING_KEYS_CTES = _ROLLING_ORACLE[:_ROLLING_ORACLE.index("kd AS")]


@register(
    "q150_novelty_contribution",
    oracle=_ROLLING_KEYS_CTES + """
    firstseen AS (SELECT key, min(doc_id) AS first_id FROM keys GROUP BY 1),
    per AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_windows,
             CAST(sum(CASE WHEN first_id = doc_id THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_novel
      FROM keys JOIN firstseen USING (key) GROUP BY 1
    )
    SELECT doc_id, n_windows, n_novel,
           CAST((2*10000*n_novel + n_windows) // (2*n_windows) AS DOUBLE)
             / 10000.0 AS novelty_frac
    FROM per ORDER BY doc_id
    """,
    tags=("dedup", "substring", "novelty"),
)
def q150_novelty_contribution(spark, sf_dir):
    """Per-doc novelty contribution: the fraction of a doc's
    overlapping 8-token windows whose corpus-wide FIRST occurrence
    (min doc id) is the doc itself — the dedup-yield accounting view
    (a verbatim copy of an earlier doc scores 0, original text 1).
    Shares q143's Rabin–Karp window keys (one generated CTE, one
    operator-side key pass); the election is an in-place ``min(id)
    OVER (PARTITION BY key)``. (Operator:
    operators.dedup.rolling_novelty.)"""
    from sunat_rree_demo_spark.operators.dedup import rolling_novelty

    d = t(spark, sf_dir, "documents")
    return rolling_novelty(d, "doc_id", "text", n=8).orderBy("doc_id")


# --------------------------------------------------------------------- q215
def _rolling_key_expr(n: int = 8) -> str:
    """The q143 Rabin–Karp window-key expression, generated from the
    operator's OWN constants (roll_powers / ROLL_MOD) instead of baked
    literals — so this oracle and the operator cannot drift."""
    from sunat_rree_demo_spark.operators.dedup import ROLL_MOD, roll_powers

    terms = " + ".join(
        f"((hv[j+{i}] * {p}) % {ROLL_MOD})"
        for i, p in enumerate(roll_powers(n)))
    return f"({terms}) % {ROLL_MOD}"


@register(
    "q215_exact_substring_spans",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
      FROM documents
    ),
    hs AS (
      SELECT doc_id,
             list_transform(tk, t ->
               ('0x' || substr(sha256(t), 1, 7))::BIGINT) AS hv
      FROM toks WHERE len(tk) >= 8
    ),
    keysp AS (
      SELECT doc_id,
             unnest(range(1, len(hv) - 6)) - 1 AS j,
             unnest(list_transform(range(1, len(hv) - 6),
                                   j -> {_rolling_key_expr(8)})) AS key
      FROM hs
    ),
    kc AS (SELECT key, count(*) AS c FROM keysp GROUP BY 1),
    dup AS (
      SELECT doc_id, j FROM keysp JOIN kc USING (key) WHERE c >= 2
    ),
    isl AS (
      SELECT doc_id, j,
             j - row_number() OVER (PARTITION BY doc_id ORDER BY j)
               AS g
      FROM dup
    )
    SELECT doc_id,
           CAST(min(j) AS BIGINT) AS span_start,
           CAST(max(j) - min(j) + 8 AS BIGINT) AS span_len,
           CAST(count(*) AS BIGINT) AS n_dup_windows
    FROM isl GROUP BY doc_id, g
    ORDER BY doc_id, span_start
    """,
    tags=("dedup", "substring", "spans"),
)
def q215_exact_substring_spans(spark, sf_dir):
    """MAXIMAL repeated-substring spans — the ExactSubstr REMOVAL step
    (Lee et al. 2022 §3.1; their build is a single-node suffix array,
    this is the distributed relational equivalent): q143 measures the
    duplicated-window fraction, this emits the actual token ranges
    [span_start, span_start+span_len) a substring-level dedup pass
    deletes — every n-token window whose rolling-hash key occurs ≥ 2
    times anywhere (occurrence count, so self-repeats qualify, unlike
    q143's document frequency), with consecutive repeated starts
    merged into maximal spans by gaps-and-islands. The oracle rebuilds
    keys-with-positions, the occurrence census and the island merge in
    SQL from the operator's own constants. (Operator:
    operators.dedup.exact_substring_spans.)"""
    from sunat_rree_demo_spark.operators.dedup import exact_substring_spans

    d = t(spark, sf_dir, "documents")
    return (exact_substring_spans(d, "doc_id", "text", n=8)
            .orderBy("doc_id", "span_start"))


# --------------------------------------------------------------------- q218
@register(
    "q218_exact_substring_rewrite",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
      FROM documents
    ),
    hs AS (
      SELECT doc_id,
             list_transform(tk, t ->
               ('0x' || substr(sha256(t), 1, 7))::BIGINT) AS hv
      FROM toks WHERE len(tk) >= 8
    ),
    keysp AS (
      SELECT doc_id,
             unnest(range(1, len(hv) - 6)) - 1 AS j,
             unnest(list_transform(range(1, len(hv) - 6),
                                   j -> {_rolling_key_expr(8)})) AS key
      FROM hs
    ),
    kc AS (SELECT key, count(*) AS c FROM keysp GROUP BY 1),
    dup AS (
      SELECT doc_id, j FROM keysp JOIN kc USING (key) WHERE c >= 2
    ),
    isl AS (
      SELECT doc_id, j,
             j - row_number() OVER (PARTITION BY doc_id ORDER BY j)
               AS g
      FROM dup
    ),
    spans AS (
      SELECT doc_id, min(j) AS s, max(j) + 7 AS e
      FROM isl GROUP BY doc_id, g
    ),
    pos AS (
      SELECT doc_id,
             unnest(range(0, len(tk))) AS j,
             unnest(tk) AS tok
      FROM toks
    ),
    kept AS (
      SELECT p.doc_id, p.j, p.tok,
             EXISTS(SELECT 1 FROM spans s
                    WHERE s.doc_id = p.doc_id
                      AND p.j BETWEEN s.s AND s.e) AS rm
      FROM pos p
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           coalesce(string_agg(CASE WHEN NOT rm THEN tok END,
                               ' ' ORDER BY j), '') AS new_text
    FROM kept GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("dedup", "substring", "rewrite"),
)
def q218_exact_substring_rewrite(spark, sf_dir):
    """ExactSubstr dedup APPLIED (Lee et al. 2022 §3.1): q215 locates
    the maximal repeated spans, this deletes every covered token (ALL
    occurrences, the paper's rule) and emits each doc's rewritten
    text — the corpus a substring-level dedup pass actually ships.
    The rewritten strings themselves are hash-checked: the oracle
    rebuilds spans, the token⋈span coverage test and the ordered
    reassembly in SQL, so a span off-by-one or a reassembly-order bug
    surfaces as a text diff, not a row-count blip. (Operator:
    operators.dedup.exact_substring_rewrite; q127 is the
    non-overlapping-chunk contrast that keeps first occurrences.)"""
    from sunat_rree_demo_spark.operators.dedup import (
        exact_substring_rewrite,
    )

    d = t(spark, sf_dir, "documents")
    return (exact_substring_rewrite(d, "doc_id", "text", n=8)
            .orderBy("doc_id"))


# --------------------------------------------------------------------- q179
_RRF_K = 60
_RRF_DEPTH = 15
_RRF_OUT = 10
_RRF_QVEC = 0


@register(
    "q179_hybrid_rrf_fusion",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents
    ),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
           FROM toks GROUP BY 1),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    st AS (SELECT round(avg(dl), 6) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM toks WHERE term IN {BM25_TERMS!r} GROUP BY 1, 2
    ),
    dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    idf AS (
      SELECT term,
             CAST(round(ln((n - df + 0.5) / (df + 0.5) + 1.0)
                        * 1000000.0) AS BIGINT) AS idf_u
      FROM dfq, nd
    ),
    sc AS (
      SELECT tf.doc_id,
             CAST(round(idf_u * ((tf * {BM25_K1 + 1.0}) /
                  (tf + {BM25_K1} * ({1.0 - BM25_B} +
                   {BM25_B} * (dl / avgdl))))) AS BIGINT) AS u
      FROM tf JOIN dl USING (doc_id) JOIN idf USING (term), st
    ),
    lex AS (
      SELECT doc_id, CAST(row_number() OVER (
               ORDER BY sum(u) DESC, doc_id) AS BIGINT) AS lex_rank
      FROM sc GROUP BY doc_id
      ORDER BY lex_rank LIMIT {_RRF_DEPTH}
    ),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    sem AS (
      SELECT n_id AS doc_id, rank AS sem_rank FROM (
        SELECT e.vec_id AS n_id,
               CAST(row_number() OVER (
                 ORDER BY round(list_cosine_similarity(q.v, e.v), 6) DESC,
                          e.vec_id) AS BIGINT) AS rank
        FROM (SELECT v FROM e WHERE vec_id = {_RRF_QVEC}) q
        JOIN e ON e.vec_id <> {_RRF_QVEC})
      WHERE rank <= {_RRF_DEPTH}
    ),
    fused AS (
      SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
             coalesce(lex.lex_rank, 0) AS lex_rank,
             coalesce(sem.sem_rank, 0) AS sem_rank,
             CAST(CASE WHEN lex.lex_rank IS NULL THEN 0
                  ELSE 1000000000 // ({_RRF_K} + lex.lex_rank) END
                + CASE WHEN sem.sem_rank IS NULL THEN 0
                  ELSE 1000000000 // ({_RRF_K} + sem.sem_rank) END
                AS BIGINT) AS rrf_micro
      FROM lex FULL OUTER JOIN sem USING (doc_id)
    )
    SELECT doc_id, rrf_micro, lex_rank, sem_rank
    FROM fused
    ORDER BY rrf_micro DESC, doc_id LIMIT {_RRF_OUT}
    """,
    tags=("retrieval", "hybrid-search"),
)
def q179_hybrid_rrf_fusion(spark, sf_dir):
    """Hybrid retrieval via reciprocal-rank fusion (Cormack et al.
    SIGIR'09 — the default fusion of every RAG stack): the lexical
    BM25 top-15 (q98's integer-micro scoring) and the semantic exact-
    cosine top-15 for query vector {_RRF_QVEC} fuse by
    Σ floor(1e9/(60+rank)) — the reciprocal quantized to an integer
    quotient so both engines sum identical addends — and the fused
    top-10 reports each doc's contributing ranks (0 = absent from
    that ranking).

    Scale shape: both input rankings are already bounded top-k plans
    (TakeOrdered lexical side; blocked-matmul semantic side); the
    fusion itself is a full-outer join of two ≤k-row frames — driver-
    free, broadcast-sized. Doc ids and vec ids share the synthetic id
    space, standing in for the doc↔chunk-embedding mapping of a real
    store."""
    from sunat_rree_demo_spark.operators.retrieval import bm25_doc_scores
    from sunat_rree_demo_spark.operators.similarity import brute_force_topk

    d = t(spark, sf_dir, "documents")
    tk = d.select(F.col("doc_id"),
                  F.explode(tokens(F.col("text"))).alias("term"))
    dl = tk.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("dl"))
    nd = d.agg(F.count("*").cast("bigint").alias("n"))
    st = dl.agg(F.round(F.avg("dl"), 6).alias("avgdl"))
    tf = (tk.filter(F.col("term").isin(*BM25_TERMS))
          .groupBy("doc_id", "term")
          .agg(F.count("*").cast("bigint").alias("tf")))
    from pyspark.sql import Window

    # the global window is over the ALREADY top-k-limited 15-row frame
    # (TakeOrderedAndProject feeds it) — bounded by construction, not a
    # corpus-wide single-partition sort
    lex = (bm25_doc_scores(tf, dl, nd, st, BM25_K1, BM25_B)
           .orderBy(F.desc("score_micro"), "doc_id").limit(_RRF_DEPTH)
           .select("doc_id",
                   F.row_number().over(
                       Window.orderBy(F.desc("score_micro"), "doc_id"))
                   .cast("bigint").alias("lex_rank")))
    e = t(spark, sf_dir, "embeddings")
    sem = (brute_force_topk(e, e.filter(F.col("vec_id") == _RRF_QVEC),
                            k=_RRF_DEPTH)
           .select(F.col("n_id").alias("doc_id"),
                   F.col("rank").alias("sem_rank")))
    rr = (lex.join(sem, "doc_id", "full_outer")
          .select("doc_id",
                  F.coalesce("lex_rank", F.lit(0)).alias("lex_rank"),
                  F.coalesce("sem_rank", F.lit(0)).alias("sem_rank")))
    score = (
        F.when(F.col("lex_rank") > 0,
               F.expr(f"1000000000 div ({_RRF_K} + lex_rank)"))
        .otherwise(0)
        + F.when(F.col("sem_rank") > 0,
                 F.expr(f"1000000000 div ({_RRF_K} + sem_rank)"))
        .otherwise(0)
    ).cast("bigint")
    return (
        rr.withColumn("rrf_micro", score)
        .select("doc_id", "rrf_micro", "lex_rank", "sem_rank")
        .orderBy(F.desc("rrf_micro"), "doc_id")
        .limit(_RRF_OUT)
    )


# --------------------------------------------------------------------- q202
_CHUNK_W = 16   #: tokens per chunk window
_CHUNK_S = 8    #: stride (overlap = W - S)


@register(
    "q202_sliding_window_chunks",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
      FROM documents
    ),
    c AS (
      SELECT doc_id, len(tk) AS n_tokens,
             list_transform(range(1, len(tk) + 1, {_CHUNK_S}),
                            i -> array_to_string(
                                   tk[i:i + {_CHUNK_W - 1}], ' '))
               AS chunks
      FROM toks
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(len(chunks) AS BIGINT) AS n_chunks,
           sha256(array_to_string(chunks, '|')) AS chunks_sha
    FROM c ORDER BY doc_id
    """,
    tags=("corpus", "chunking", "rag", "llm-pipeline"),
)
def q202_sliding_window_chunks(spark, sf_dir):
    """Sliding-window document chunking with overlap (window
    {W} tokens, stride {S} — the RAG/embedding-prep shape: overlap
    keeps boundary-spanning context retrievable, cf. q96's disjoint
    chunks which exist for dedup). Emits per doc the token count,
    chunk count (= floor((len−1)/S)+1, trailing partial window kept),
    and the sha-256 of the '|'-joined chunk texts — the digest pins
    every chunk boundary and every token of every chunk cross-engine
    without shipping 25k chunk rows through the driver compare.

    Scale shape: one narrow map over the scan (zip/slice over a
    materialized token column — the r7 HOT_LAMBDA discipline; slice is
    O(W) per chunk), no shuffle before the doc-grain sort. At 100 TB
    the chunk EXPLODE (one row per chunk feeding an embedding model)
    would be the next operator; this query is its boundary oracle."""
    d = t(spark, sf_dir, "documents")
    tk = F.col("_tok")
    starts = F.sequence(F.lit(1), F.size(tk), F.lit(_CHUNK_S))
    chunks = F.transform(
        starts, lambda i: F.concat_ws(" ", F.slice(tk, i, _CHUNK_W)))
    return (
        d.select("doc_id", tokens(F.col("text")).alias("_tok"))
        .select("doc_id",
                F.size(tk).cast("bigint").alias("n_tokens"),
                chunks.alias("_chunks"))
        .select("doc_id", "n_tokens",
                F.size("_chunks").cast("bigint").alias("n_chunks"),
                F.sha2(F.array_join("_chunks", "|"), 256)
                .alias("chunks_sha"))
        .orderBy("doc_id")
    )
