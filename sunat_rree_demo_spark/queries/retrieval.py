"""Retrieval-evaluation queries: ranking metrics (recall@k / MRR /
nDCG) over the exact cosine ranking, inverted-index posting lists, and
hard-negative mining — the evaluation half of the similarity family
(q43-q45/q54/q69 build rankings; these grade and index them)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sunat_rree_demo_spark.queries.base import register, t

#: evaluation cut-off for q128 and the fixed query subset (q69's).
EVAL_K = 10
N_EVAL_QUERIES = 8


# --------------------------------------------------------------------- q128
@register(
    "q128_retrieval_eval",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
               FROM embeddings),
    exact AS (
      SELECT q_id, n_id, rank FROM (
        SELECT q.vec_id AS q_id, e.vec_id AS n_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY round(list_cosine_similarity(
                                      q.v, e.v), 6) DESC, e.vec_id) AS rank
        FROM (SELECT * FROM e WHERE vec_id < {N_EVAL_QUERIES}) q
        JOIN e ON e.vec_id <> q.vec_id) WHERE rank <= {EVAL_K}
    ),
    lc AS (SELECT label, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY 1),
    qr AS (SELECT q.vec_id AS q_id, q.label AS ql, lc.c - 1 AS n_rel
           FROM e q JOIN lc ON q.label = lc.label
           WHERE q.vec_id < {N_EVAL_QUERIES}),
    h AS (
      SELECT x.q_id,
             CAST(sum(CASE WHEN ne.label = qr.ql THEN 1 ELSE 0 END)
                  AS BIGINT) AS hits,
             min(CASE WHEN ne.label = qr.ql THEN rank END) AS first_rank,
             CAST(sum(CASE WHEN ne.label = qr.ql THEN
                    CAST(round(1000000.0 / log2(rank + 1.0)) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS dcg_u
      FROM exact x
      JOIN e ne ON ne.vec_id = x.n_id
      JOIN qr ON qr.q_id = x.q_id
      GROUP BY 1
    ),
    idcg AS (
      SELECT q_id,
             CAST(sum(CAST(round(1000000.0 / log2(i + 1.0)) AS BIGINT))
                  AS BIGINT) AS idcg_u
      FROM (SELECT q_id, unnest(range(1, least({EVAL_K}, n_rel) + 1)) AS i
            FROM qr)
      GROUP BY 1
    )
    SELECT qr.q_id, qr.n_rel,
           coalesce(h.hits, 0) AS rel_in_topk,
           CASE WHEN least({EVAL_K}, qr.n_rel) > 0 THEN
             round(CAST(coalesce(h.hits, 0) AS DOUBLE)
                   / least({EVAL_K}, qr.n_rel), 4)
           ELSE 0.0 END AS recall_at_k,
           CASE WHEN h.first_rank IS NOT NULL THEN
             round(1.0 / h.first_rank, 4)
           ELSE 0.0 END AS mrr_at_k,
           CASE WHEN coalesce(i.idcg_u, 0) > 0 THEN
             round(CAST(coalesce(h.dcg_u, 0) AS DOUBLE) / i.idcg_u, 4)
           ELSE 0.0 END AS ndcg_at_k
    FROM qr
    LEFT JOIN h USING (q_id)
    LEFT JOIN idcg i USING (q_id)
    ORDER BY q_id
    """,
    tags=("retrieval", "eval", "ndcg"),
)
def q128_retrieval_eval(spark, sf_dir):
    """Ranking-quality report card for the exact cosine retriever:
    per query (the q69 subset), recall@10, MRR@10 and binary-gain
    nDCG@10 against same-label relevance — the eval pass a retrieval /
    curriculum pipeline runs after building an index. DCG terms
    quantize to integer micro-units (round(1e6/log2(rank+1))) BEFORE
    the per-query sum, the q74 discipline, so float addend order can
    never move the 4dp metric; the ideal-DCG normalizer is the same
    quantized series over min(k, n_rel) ranks.

    Scale shape: the ranking is q43's one-pass numpy top-k (no pairwise
    shuffle); label lookups are equi-joins on the vector id; per-label
    corpus counts are one label-grain aggregate broadcast onto the
    8-row query frame; the ideal-DCG fold runs on that same 8-row
    frame — interpreted HOF cost bounded by queries, never corpus."""
    from sunat_rree_demo_spark.operators.similarity import brute_force_topk

    e = t(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") < N_EVAL_QUERIES)
    topk = brute_force_topk(e, qs, k=EVAL_K)
    labels = e.select(F.col("vec_id").alias("n_id"),
                      F.col("label").alias("_nl"))
    lc = e.groupBy("label").agg(F.count("*").cast("bigint").alias("_lc"))
    qr = (qs.select(F.col("vec_id").alias("q_id"),
                    F.col("label").alias("_ql"))
          .join(F.broadcast(lc), F.col("_ql") == F.col("label"))
          .select("q_id", "_ql", (F.col("_lc") - 1).alias("n_rel")))
    rel = F.col("_nl") == F.col("_ql")
    dcg_term = F.round(1000000.0 / F.log2(F.col("rank") + 1.0), 0) \
        .cast("bigint")
    h = (topk.join(labels, "n_id")
         .join(F.broadcast(qr), "q_id")
         .groupBy("q_id")
         .agg(F.sum(F.when(rel, 1).otherwise(0)).cast("bigint").alias("hits"),
              F.min(F.when(rel, F.col("rank"))).alias("first_rank"),
              F.sum(F.when(rel, dcg_term).otherwise(0)).cast("bigint")
              .alias("dcg_u")))
    m = F.least(F.lit(EVAL_K).cast("bigint"), F.col("n_rel"))
    idcg_u = F.when(m >= 1, F.aggregate(
        F.sequence(F.lit(1).cast("bigint"), m),
        F.lit(0).cast("bigint"),
        lambda acc, i: acc + F.round(1000000.0 / F.log2(i + 1.0), 0)
        .cast("bigint"))).otherwise(F.lit(0).cast("bigint"))
    return (
        qr.join(h, "q_id", "left")
        .select("q_id", "n_rel",
                F.coalesce("hits", F.lit(0)).cast("bigint")
                .alias("rel_in_topk"),
                F.when(m > 0,
                       F.round(F.coalesce("hits", F.lit(0)).cast("double")
                               / m, 4)).otherwise(0.0).alias("recall_at_k"),
                F.when(F.col("first_rank").isNotNull(),
                       F.round(1.0 / F.col("first_rank"), 4))
                .otherwise(0.0).alias("mrr_at_k"),
                F.when(idcg_u > 0,
                       F.round(F.coalesce("dcg_u", F.lit(0)).cast("double")
                               / idcg_u, 4)).otherwise(0.0)
                .alias("ndcg_at_k"))
        .orderBy("q_id")
    )


#: q129 posting-list head length and term count.
POSTINGS_HEAD = 8
TOP_TERMS = 50


# --------------------------------------------------------------------- q129
@register(
    "q129_inverted_index",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents
    ),
    tf AS (
      SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
      FROM toks GROUP BY 1, 2
    )
    SELECT term,
           CAST(count(*) AS BIGINT) AS df,
           CAST(sum(tf) AS BIGINT) AS cf,
           array_to_string(list_sort(list(doc_id))[1:{POSTINGS_HEAD}], ',')
             AS postings_head
    FROM tf GROUP BY term
    ORDER BY df DESC, term LIMIT {TOP_TERMS}
    """,
    tags=("retrieval", "inverted-index"),
)
def q129_inverted_index(spark, sf_dir):
    """Inverted-index construction: per term, document frequency,
    collection frequency, and the head of its sorted posting list
    (first 8 doc ids, comma-joined so the list itself is hash-checked)
    for the 50 highest-df terms — the index-build pass under BM25/boolean
    retrieval (q98's scoring assumes exactly these statistics).

    Scale shape: one (term, doc) shuffle with map-side combine builds
    term frequencies; the posting aggregate shuffles once on the term
    key. Per-term state is the term's own posting list — the classic
    index-build memory bound; the head cap keeps emitted rows small and
    a real index writer would spill each term's list to its shard file
    exactly here. df ties break on the term for a deterministic top-50."""
    from sunat_rree_demo_spark.operators.text import tokens

    d = t(spark, sf_dir, "documents")
    tk = d.select(F.col("doc_id"),
                  F.explode(tokens(F.col("text"))).alias("term"))
    tf = (tk.groupBy("term", "doc_id")
          .agg(F.count("*").cast("bigint").alias("tf")))
    return (
        tf.groupBy("term")
        .agg(F.count("*").cast("bigint").alias("df"),
             F.sum("tf").cast("bigint").alias("cf"),
             F.array_join(
                 F.slice(F.array_sort(F.collect_list("doc_id")),
                         1, POSTINGS_HEAD).cast("array<string>"),
                 ",").alias("postings_head"))
        .orderBy(F.desc("df"), "term")
        .limit(TOP_TERMS)
    )


#: q130 negatives per query.
NEG_K = 5


# --------------------------------------------------------------------- q130
@register(
    "q130_hard_negatives",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
               FROM embeddings)
    SELECT q_id, n_id, cos, rank FROM (
      SELECT q.vec_id AS q_id, e.vec_id AS n_id,
             round(list_cosine_similarity(q.v, e.v), 6) AS cos,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY round(list_cosine_similarity(
                                    q.v, e.v), 6) DESC, e.vec_id) AS rank
      FROM (SELECT * FROM e WHERE vec_id < {N_EVAL_QUERIES}) q
      JOIN e ON e.label <> q.label)
    WHERE rank <= {NEG_K}
    ORDER BY q_id, rank
    """,
    tags=("retrieval", "hard-negatives"),
)
def q130_hard_negatives(spark, sf_dir):
    """Hard-negative mining for contrastive training (DPR/Contriever
    recipe): per query, the 5 most cosine-similar corpus vectors with a
    DIFFERENT label — filtered inside the scoring pass, so negatives
    that sit beyond the unfiltered top-k are still found (a post-filter
    of q43's output would silently lose them). Cos rounds to 6dp before
    ranking with an id tiebreak, both engines identically."""
    from sunat_rree_demo_spark.operators.similarity import hard_negative_topk

    e = t(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") < N_EVAL_QUERIES)
    return (hard_negative_topk(e, qs, k=NEG_K)
            .select("q_id", "n_id", "cos", "rank")
            .orderBy("q_id", "rank"))


#: PQ constants (q134): 4 subspaces × 16 dims, 8 codebook entries.
PQ_M = 4
PQ_K = 8
_PQ_SUB = 16


# --------------------------------------------------------------------- q134
@register(
    "q134_pq_encode",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS c, v FROM e WHERE vec_id < {PQ_K}),
    d AS (
      SELECT e.vec_id, ms.m, cent.c,
             CAST(round(
               list_distance(e.v[ms.m * {_PQ_SUB} + 1
                                 : (ms.m + 1) * {_PQ_SUB}],
                             cent.v[ms.m * {_PQ_SUB} + 1
                                    : (ms.m + 1) * {_PQ_SUB}]) ** 2
               * 1000000) AS BIGINT) AS d2u
      FROM e, (SELECT unnest(range(0, {PQ_M})) AS m) ms, cent
    ),
    best AS (
      SELECT vec_id, m, c, d2u,
             row_number() OVER (PARTITION BY vec_id, m
                                ORDER BY d2u, c) AS rn
      FROM d
    )
    SELECT vec_id,
           MAX(CASE WHEN m = 0 THEN c END) AS code_0,
           MAX(CASE WHEN m = 1 THEN c END) AS code_1,
           MAX(CASE WHEN m = 2 THEN c END) AS code_2,
           MAX(CASE WHEN m = 3 THEN c END) AS code_3,
           CAST(sum(d2u) AS BIGINT) AS err_micro,
           CAST(sum(d2u) AS BIGINT) / 1000000.0 AS err
    FROM best WHERE rn = 1
    GROUP BY vec_id
    ORDER BY vec_id
    """,
    tags=("similarity", "pq", "quantization"),
)
def q134_pq_encode(spark, sf_dir):
    """Product-quantization codes for every corpus vector (Jégou et al.
    2011): 4 subspaces × 16 dims, 8-entry deterministic codebook (the
    first 8 vectors, the q54/q75 iters=0 device), plus the integer
    micro-unit reconstruction error. The oracle re-derives codebook,
    assignment (d2u, centroid-id tiebreak) and error in SQL — so the
    compression itself is hash-checked, not just row counts."""
    from sunat_rree_demo_spark.operators.similarity import pq_encode

    e = t(spark, sf_dir, "embeddings")
    return pq_encode(e, PQ_K, PQ_M).orderBy("vec_id")


# --------------------------------------------------------------------- q148
_ADC_Q = 4   #: query batch = first 4 corpus vectors by id
_ADC_K = 3


@register(
    "q148_pq_adc_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS c, v FROM e WHERE vec_id < {PQ_K}),
    ms AS (SELECT unnest(range(0, {PQ_M})) AS m),
    d AS (
      SELECT e.vec_id, ms.m, cent.c,
             CAST(round(
               list_distance(e.v[ms.m * {_PQ_SUB} + 1
                                 : (ms.m + 1) * {_PQ_SUB}],
                             cent.v[ms.m * {_PQ_SUB} + 1
                                    : (ms.m + 1) * {_PQ_SUB}]) ** 2
               * 1000000) AS BIGINT) AS d2u
      FROM e, ms, cent
    ),
    best AS (
      SELECT vec_id, m, c,
             row_number() OVER (PARTITION BY vec_id, m
                                ORDER BY d2u, c) AS rn
      FROM d
    ),
    lut AS (
      SELECT q.vec_id AS qid, ms.m, cent.c,
             CAST(round(
               list_distance(q.v[ms.m * {_PQ_SUB} + 1
                                 : (ms.m + 1) * {_PQ_SUB}],
                             cent.v[ms.m * {_PQ_SUB} + 1
                                    : (ms.m + 1) * {_PQ_SUB}]) ** 2
               * 1000000) AS BIGINT) AS lutu
      FROM e q, ms, cent
      WHERE q.vec_id < {_ADC_Q}
    ),
    adc AS (
      SELECT l.qid, b.vec_id, CAST(sum(l.lutu) AS BIGINT) AS adc_micro
      FROM best b JOIN lut l ON b.m = l.m AND b.c = l.c
      WHERE b.rn = 1 AND b.vec_id != l.qid
      GROUP BY 1, 2
    ),
    rk AS (
      SELECT qid, vec_id, adc_micro,
             row_number() OVER (PARTITION BY qid
                                ORDER BY adc_micro, vec_id) AS rank
      FROM adc
    )
    SELECT qid, vec_id, adc_micro, CAST(rank AS BIGINT) AS rank
    FROM rk WHERE rank <= {_ADC_K}
    ORDER BY qid, rank
    """,
    tags=("similarity", "pq", "adc", "ann"),
)
def q148_pq_adc_topk(spark, sf_dir):
    """PQ asymmetric-distance top-k (Jégou et al. 2011 §IV) — the query
    half of the IVF-PQ stack over q134's codes: un-quantized queries,
    per-subspace lookup tables of exact micro-unit sub-distances, and
    a corpus scan that reads only the M stored codes per vector. The
    oracle re-derives codebook, codes, LUT and the BIGINT ADC sums in
    SQL, so the whole compressed-search path — not just row counts —
    is hash-checked cross-engine. (Operator:
    operators.similarity.pq_adc_topk.)"""
    from sunat_rree_demo_spark.operators.similarity import pq_adc_topk

    e = t(spark, sf_dir, "embeddings")
    return (pq_adc_topk(e, _ADC_Q, _ADC_K, PQ_K, PQ_M)
            .orderBy("qid", "rank"))
