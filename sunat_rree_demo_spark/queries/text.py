"""Text-analysis queries over the documents table (driver mandate,
SURVEY.md §7.4): token stats, quality scoring, language-ID,
fingerprinting. Oracle SQL shares the exact tokenizer
(``string_split_regex(trim(x), '\\s+')``) and stopword lists.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from sunat_rree_demo_spark.operators.text import (
    EN_STOPWORDS,
    ES_STOPWORDS,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
    tokens,
)
from sunat_rree_demo_spark.queries.base import register, t

_TOKS = "string_split_regex(trim(text), '\\s+')"


# ---------------------------------------------------------------------- q35
@register(
    "q35_token_stats",
    oracle=f"""
    SELECT lang,
           count(*) AS n_docs,
           round(avg(CAST(len({_TOKS}) AS BIGINT)), 4) AS avg_tokens,
           round(avg(CAST(length(text) AS BIGINT)), 4) AS avg_chars,
           CAST(max(len({_TOKS})) AS BIGINT) AS max_tokens
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("text", "token-count"),
)
def q35_token_stats(spark, sf_dir):
    """Token counting per language: regex-whitespace tokens, char
    lengths — all JVM-side expressions."""
    d = t(spark, sf_dir, "documents")
    n = token_count(F.col("text"))
    return (
        d.select("lang", n.alias("_n"),
                 F.length("text").cast("bigint").alias("_c"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"),
             F.round(F.avg("_n"), 4).alias("avg_tokens"),
             F.round(F.avg("_c"), 4).alias("avg_chars"),
             F.max("_n").alias("max_tokens"))
        .orderBy("lang")
    )


# ---------------------------------------------------------------------- q36
@register(
    "q36_quality_score",
    oracle=f"""
    WITH scored AS (
      SELECT source,
             round(0.5 * (CAST(len(list_distinct({_TOKS})) AS DOUBLE)
                          / CAST(len({_TOKS}) AS DOUBLE))
                   + 0.5 * least(CAST(len({_TOKS}) AS DOUBLE) / 100.0, 1.0),
                   4) AS q
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           round(avg(q), 4) AS avg_quality,
           round(min(q), 4) AS min_quality
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
    tags=("text", "quality"),
)
def q36_quality_score(spark, sf_dir):
    """Quality scoring per source: lexical diversity × length prior
    (operators.text.quality_score)."""
    d = t(spark, sf_dir, "documents")
    q = quality_score(tokens(F.col("text")))
    return (
        d.select("source", q.alias("_q"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"),
             F.round(F.avg("_q"), 4).alias("avg_quality"),
             F.round(F.min("_q"), 4).alias("min_quality"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------- q37
_EN = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
_ES = ", ".join(f"'{w}'" for w in ES_STOPWORDS)


@register(
    "q37_lang_id",
    oracle=f"""
    WITH pred AS (
      SELECT lang,
             CASE WHEN len(list_intersect({_TOKS}, [{_EN}])) > 0 THEN 'en'
                  WHEN len(list_intersect({_TOKS}, [{_ES}])) > 0 THEN 'es'
                  ELSE 'unknown' END AS predicted
      FROM documents
    )
    SELECT lang, predicted, count(*) AS n_docs
    FROM pred
    GROUP BY lang, predicted
    ORDER BY lang, predicted
    """,
    tags=("text", "lang-id"),
)
def q37_lang_id(spark, sf_dir):
    """Language-ID heuristic (stopword-overlap vote) cross-tabulated
    against the labeled lang column — the confusion-matrix view."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select("lang", lang_id(tokens(F.col("text"))).alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "predicted")
    )


# ---------------------------------------------------------------------- q38
@register(
    "q38_fingerprint",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')))
             AS n_unique
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    tags=("text", "fingerprint"),
)
def q38_fingerprint(spark, sf_dir):
    """Content fingerprinting: sha-256 of normalized text; distinct
    fingerprints per source = exact-dup detection at the source grain."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select("source", fingerprint(F.col("text")).alias("_fp"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"),
             F.countDistinct("_fp").alias("n_unique"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------- q92
@register(
    "q92_fuzzy_name_pairs",
    oracle="""
    WITH n AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name1, b.p_name AS name2,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
    FROM n a JOIN n b
      ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
     AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    ORDER BY name1, name2
    """,
    tags=("text", "fuzzy-join"),
)
def q92_fuzzy_name_pairs(spark, sf_dir):
    """Fuzzy string-similarity self-join: near-identical part names
    within edit distance 4 — the blocked join shape every
    entity-resolution pipeline uses. Blocking key = first token, so
    the O(N²) levenshtein verify runs only INSIDE blocks (an equi-join
    the planner hashes normally), never across the full cross
    product; the edit distance itself is exact integer arithmetic,
    identical on both engines.

    Scale notes: candidate volume is Σ|block|² — blocking-key choice is
    the knob (length bands or q-gram buckets refine hot blocks; a
    skewed block hits AQE's skew-join split). The name dimension is
    vocabulary-sized, deduplicated before pairing."""
    n = t(spark, sf_dir, "part").select("p_name").distinct()
    a = n.select(F.col("p_name").alias("name1"),
                 F.split("p_name", " ")[0].alias("_blk"))
    b = n.select(F.col("p_name").alias("name2"),
                 F.split("p_name", " ")[0].alias("_blk"))
    return (
        a.join(b, "_blk")
        .filter(F.col("name1") < F.col("name2"))
        .withColumn("edit_dist",
                    F.levenshtein("name1", "name2").cast("bigint"))
        .filter(F.col("edit_dist") <= 4)
        .select("name1", "name2", "edit_dist")
        .orderBy("name1", "name2")
    )


# --------------------------------------------------------------------- q145
_ZIPF_K = 100


@register(
    "q145_zipf_slope",
    oracle=f"""
    WITH tf AS (
      SELECT source, term, count(*) AS cnt
      FROM (SELECT source, unnest({_TOKS}) AS term FROM documents)
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT source, cnt,
             row_number() OVER (PARTITION BY source
                                ORDER BY cnt DESC, term ASC) AS rnk
      FROM tf
    )
    SELECT source,
           round(regr_slope(ln(CAST(cnt AS DOUBLE)),
                            ln(CAST(rnk AS DOUBLE))), 4) AS zipf_slope,
           CAST(count(*) AS BIGINT) AS n_terms
    FROM ranked WHERE rnk <= {_ZIPF_K}
    GROUP BY source ORDER BY source
    """,
    tags=("text", "zipf", "corpus-stats"),
)
def q145_zipf_slope(spark, sf_dir):
    """Zipf's-law fit per source: OLS slope of ln(freq) on ln(rank)
    over each source's top-100 terms — the corpus-health diagnostic
    data pipelines run per ingest source (natural text sits near −1;
    a flat or cliff-shaped slope flags boilerplate or spam). Rank ties
    break on the term string so both engines rank identically;
    ``regr_slope`` (Spark ≥3.4 / DuckDB, same covar/var definition)
    computes the fit in one aggregate. Plan: map-side-combined term
    counts, a source-partitioned top-k window over the per-source
    vocabulary, one tiny regression aggregate."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    tf = (d.select("source", F.explode(tokens(F.col("text"))).alias("term"))
          .groupBy("source", "term").agg(F.count("*").alias("cnt")))
    w = Window.partitionBy("source").orderBy(F.desc("cnt"), F.asc("term"))
    ranked = tf.withColumn("rnk", F.row_number().over(w)) \
        .filter(F.col("rnk") <= _ZIPF_K)
    return (
        ranked.groupBy("source")
        .agg(F.round(F.expr(
            "regr_slope(ln(CAST(cnt AS DOUBLE)), ln(CAST(rnk AS DOUBLE)))"),
            4).alias("zipf_slope"),
            F.count("*").cast("bigint").alias("n_terms"))
        .orderBy("source")
    )


# --------------------------------------------------------------------- q147
@register(
    "q147_seq_length_histogram",
    oracle=f"""
    SELECT lang,
           CAST(floor(log2(CAST(len({_TOKS}) AS DOUBLE))) AS BIGINT)
             AS len_bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CAST(len({_TOKS}) AS BIGINT)) AS BIGINT) AS total_tokens
    FROM documents
    WHERE len({_TOKS}) > 0
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("text", "packing", "histogram"),
)
def q147_seq_length_histogram(spark, sf_dir):
    """Sequence-length distribution per language, log₂-bucketed — the
    profile a packing/truncation policy is sized from (how much of the
    token mass sits in docs longer than the context budget). One
    map-side-combined aggregate over a zero-shuffle projection; the
    bucket is floor(log₂ n_tokens), BIGINT on both engines."""
    from sunat_rree_demo_spark.operators.text import token_count

    d = t(spark, sf_dir, "documents")
    n = token_count(F.col("text"))
    return (
        d.select("lang", n.alias("_n")).filter(F.col("_n") > 0)
        .groupBy("lang",
                 F.floor(F.log2(F.col("_n").cast("double")))
                 .cast("bigint").alias("len_bucket"))
        .agg(F.count("*").cast("bigint").alias("n_docs"),
             F.sum("_n").cast("bigint").alias("total_tokens"))
        .orderBy("lang", "len_bucket")
    )


# --------------------------------------------------------------------- q176
_LID_TOP = 20


@register(
    "q176_trigram_lang_id",
    oracle=f"""
    WITH d AS (SELECT doc_id, lang, lower(text) AS s FROM documents),
    tg AS (
      SELECT doc_id, lang,
             unnest(CASE WHEN length(s) >= 3
                         THEN list_transform(range(1, length(s) - 1),
                                             i -> substring(s, i, 3))
                         ELSE [] END) AS g
      FROM d),
    prof AS (
      SELECT lang AS plang, g FROM (
        SELECT lang, g, count(*) AS c,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY count(*) DESC, g) AS rn
        FROM tg WHERE doc_id % 10 < 3
        GROUP BY lang, g) WHERE rn <= {_LID_TOP}),
    hits AS (
      SELECT tg.doc_id, prof.plang, count(*) AS h
      FROM tg JOIN prof USING (g)
      GROUP BY tg.doc_id, prof.plang),
    pred AS (
      SELECT doc_id, plang AS predicted FROM (
        SELECT doc_id, plang,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY h DESC, plang) AS rn
        FROM hits) WHERE rn = 1)
    SELECT d.lang, coalesce(pred.predicted, 'unknown') AS predicted,
           count(*) AS n_docs
    FROM d LEFT JOIN pred USING (doc_id)
    GROUP BY 1, 2
    ORDER BY lang, predicted
    """,
    tags=("text", "lang-id"),
)
def q176_trigram_lang_id(spark, sf_dir):
    """Character-trigram language ID (the Cavnar–Trenkle 1994 n-gram
    profile method, top-20 profiles): docs with ``doc_id % 10 < 3``
    act as the labeled training slice; every language's 20 most
    frequent trigrams (ties lexicographic) form its profile, each doc
    is scored by trigram-occurrence overlap with every profile, and
    the argmax (ties to the alphabetically first language) is the
    prediction. Output = the confusion matrix against the ground-truth
    ``lang`` column — the eval a curation pipeline runs before
    trusting LID-based filtering; docs too short to hit any profile
    fall out as 'unknown'.

    Scale shape: the trigram explode is one pass; profiles are a
    ≤ |langs|·20-row broadcast; scoring is a broadcast hash join at
    trigram grain with map-side combinable counts; the per-doc argmax
    window partitions by doc_id. All counts integer — no float
    anywhere."""
    d = (t(spark, sf_dir, "documents")
         .select("doc_id", "lang", F.lower("text").alias("s")))
    tg = d.select(
        "doc_id", "lang",
        F.explode(F.expr(
            "CASE WHEN length(s) >= 3 THEN "
            "transform(sequence(1, length(s) - 2), i -> substring(s, i, 3)) "
            "ELSE array() END")).alias("g"))
    wp = Window.partitionBy("lang").orderBy(F.col("c").desc(), "g")
    prof = (tg.filter(F.col("doc_id") % 10 < 3)
            .groupBy("lang", "g").agg(F.count("*").alias("c"))
            .withColumn("rn", F.row_number().over(wp))
            .filter(F.col("rn") <= _LID_TOP)
            .select(F.col("lang").alias("plang"), "g"))
    hits = (tg.join(F.broadcast(prof), "g")
            .groupBy("doc_id", "plang").agg(F.count("*").alias("h")))
    wd = Window.partitionBy("doc_id").orderBy(F.col("h").desc(), "plang")
    pred = (hits.withColumn("rn", F.row_number().over(wd))
            .filter(F.col("rn") == 1)
            .select("doc_id", F.col("plang").alias("predicted")))
    return (
        d.join(pred, "doc_id", "left")
        .select("lang",
                F.coalesce("predicted", F.lit("unknown")).alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "predicted")
    )


# --------------------------------------------------------------------- q182
_SNM_W = 3  # neighbors each side inside a block


@register(
    "q182_sorted_neighborhood_pairs",
    oracle=f"""
    WITH n AS (SELECT DISTINCT p_name FROM part),
    o AS (
      SELECT p_name, split_part(p_name, ' ', 1) AS blk,
             row_number() OVER (PARTITION BY split_part(p_name, ' ', 1)
                                ORDER BY reverse(p_name), p_name) AS rn
      FROM n),
    cand AS (
      SELECT a.p_name AS name1, b.p_name AS name2
      FROM o a JOIN o b
        ON a.blk = b.blk
       AND b.rn > a.rn AND b.rn <= a.rn + {_SNM_W})
    SELECT least(name1, name2) AS name1,
           greatest(name1, name2) AS name2,
           CAST(levenshtein(name1, name2) AS BIGINT) AS edit_dist
    FROM cand
    WHERE levenshtein(name1, name2) <= 4
    ORDER BY name1, name2
    """,
    tags=("text", "fuzzy-join", "entity-resolution"),
)
def q182_sorted_neighborhood_pairs(spark, sf_dir):
    """Blocked sorted-neighborhood entity resolution (Hernández &
    Stolfo's merge/purge, SIGMOD'95): within each first-token block,
    sort names by a SECONDARY key chosen to bring suffix-variant
    duplicates together (the reversed string), and compare each name
    only to its next {_SNM_W} neighbors in that order — candidate
    volume Σ |block|·w instead of q92's Σ |block|², the other classic
    blocking trade-off (recall now depends on the sort key; q92's
    exhaustive in-block variant is the recall ceiling, and the shared
    edit-distance ≤ 4 verify keeps the two comparable).

    Scale shape: the sort is PARTITIONED by the block key (no global
    ordering), the neighbor join is an equi-join on the block plus a
    bounded rank-band residual, and the O(len²) levenshtein runs only
    on the w·|block| candidates."""
    n = t(spark, sf_dir, "part").select("p_name").distinct()
    o = n.select(
        "p_name",
        F.split("p_name", " ")[0].alias("blk"),
        F.reverse("p_name").alias("_rev"))
    w = Window.partitionBy("blk").orderBy("_rev", "p_name")
    o = o.withColumn("rn", F.row_number().over(w)).drop("_rev")
    a = o.select(F.col("p_name").alias("name1"), "blk",
                 F.col("rn").alias("rn1"))
    b = o.select(F.col("p_name").alias("name2"), "blk",
                 F.col("rn").alias("rn2"))
    return (
        a.join(b, "blk")
        .filter((F.col("rn2") > F.col("rn1"))
                & (F.col("rn2") <= F.col("rn1") + _SNM_W))
        .select(F.least("name1", "name2").alias("name1"),
                F.greatest("name1", "name2").alias("name2"))
        .withColumn("edit_dist",
                    F.levenshtein("name1", "name2").cast("bigint"))
        .filter(F.col("edit_dist") <= 4)
        .orderBy("name1", "name2")
    )


# --------------------------------------------------------------------- q184
def _snm_pass(names, blk: F.Column, order: F.Column, w: int, tag: int):
    """One sorted-neighborhood pass: rank by ``order`` (p_name tiebreak)
    inside each ``blk`` block, pair every name with its next ``w``
    neighbors, normalize orientation lexically, tag with the pass id."""
    o = (names.select("p_name", blk.alias("blk"), order.alias("_ord"))
         .withColumn("rn", F.row_number().over(
             Window.partitionBy("blk").orderBy("_ord", "p_name")))
         .drop("_ord"))
    a = o.select(F.col("p_name").alias("n1"), "blk",
                 F.col("rn").alias("rn1"))
    b = o.select(F.col("p_name").alias("n2"), "blk",
                 F.col("rn").alias("rn2"))
    return (
        a.join(b, "blk")
        .filter((F.col("rn2") > F.col("rn1"))
                & (F.col("rn2") <= F.col("rn1") + w))
        .select(F.least("n1", "n2").alias("name1"),
                F.greatest("n1", "n2").alias("name2"),
                F.lit(tag).alias("pass_id"))
    )


@register(
    "q184_multipass_blocking_pairs",
    oracle=f"""
    WITH n AS (SELECT DISTINCT p_name FROM part),
    o1 AS (
      SELECT p_name, split_part(p_name, ' ', 1) AS blk,
             row_number() OVER (PARTITION BY split_part(p_name, ' ', 1)
                                ORDER BY reverse(p_name), p_name) AS rn
      FROM n),
    o2 AS (
      SELECT p_name, regexp_extract(p_name, '([a-z]+)$', 1) AS blk,
             row_number() OVER (
               PARTITION BY regexp_extract(p_name, '([a-z]+)$', 1)
               ORDER BY p_name) AS rn
      FROM n),
    u AS (
      SELECT least(a.p_name, b.p_name) AS name1,
             greatest(a.p_name, b.p_name) AS name2, 1 AS pass_id
      FROM o1 a JOIN o1 b
        ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + {_SNM_W}
      UNION ALL
      SELECT least(a.p_name, b.p_name), greatest(a.p_name, b.p_name), 2
      FROM o2 a JOIN o2 b
        ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + {_SNM_W}),
    g AS (
      SELECT name1, name2,
             CAST(count(DISTINCT pass_id) AS BIGINT) AS n_passes
      FROM u GROUP BY 1, 2)
    SELECT name1, name2,
           CAST(levenshtein(name1, name2) AS BIGINT) AS edit_dist,
           n_passes
    FROM g
    WHERE levenshtein(name1, name2) <= 4
    ORDER BY name1, name2
    """,
    tags=("text", "fuzzy-join", "entity-resolution"),
)
def q184_multipass_blocking_pairs(spark, sf_dir):
    """MULTI-PASS sorted-neighborhood entity resolution — the canonical
    Hernández–Stolfo merge/purge shape (SIGMOD'95 §3.3): candidates
    from ≥2 INDEPENDENT (blocking key, sort key) passes are unioned
    before the expensive verify tier, because any single sort key
    misses duplicates whose variation hits that key's prefix. Pass 1 =
    q182's (first-token block, reversed-name sort); pass 2 = (last-
    token block, forward sort) — a genuinely different neighborhood
    structure, so it recovers pairs whose FIRST token differs (out of
    reach of any single-first-token blocking, including q92's
    exhaustive in-block ground truth). ``n_passes`` records how many
    passes proposed each surviving pair.

    Scale shape: each pass is block-partitioned (no global sort), the
    union is candidate-grain, verify (levenshtein ≤ 4) runs once per
    DISTINCT candidate after the group-by — multi-pass multiplies
    candidate volume by #passes, never the verify cost of a pair.
    Recall vs the q92 single-block ground truth is pinned by
    tests/test_dedup.py::test_multipass_snm_recall."""
    n = t(spark, sf_dir, "part").select("p_name").distinct()
    p1 = _snm_pass(n, F.split("p_name", " ")[0],
                   F.reverse(F.col("p_name")), _SNM_W, 1)
    p2 = _snm_pass(n, F.regexp_extract("p_name", "([a-z]+)$", 1),
                   F.col("p_name"), _SNM_W, 2)
    return (
        p1.unionByName(p2)
        .groupBy("name1", "name2")
        .agg(F.countDistinct("pass_id").cast("bigint").alias("n_passes"))
        .withColumn("edit_dist",
                    F.levenshtein("name1", "name2").cast("bigint"))
        .filter(F.col("edit_dist") <= 4)
        .select("name1", "name2", "edit_dist", "n_passes")
        .orderBy("name1", "name2")
    )
