"""Deduplication queries over the documents table (driver mandate):
exact, n-gram Jaccard (oracle-checked), MinHash+LSH and SimHash
(sha-derived hashes; MinHash/SimHash are golden-tested in
tests/test_dedup.py against pure-Python implementations and registered
rows-only — the banded-bucket plans aren't naturally SQL-expressible).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sunat_rree_demo_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from sunat_rree_demo_spark.queries.base import register, t


# ---------------------------------------------------------------------- q39
@register(
    "q39_exact_dedup",
    oracle="""
    WITH canon AS (
      SELECT min(doc_id) AS doc_id
      FROM documents
      GROUP BY sha256(text)
    )
    SELECT d.lang, count(*) AS n_kept, round(sum(d.n_chars), 2) AS total_chars
    FROM documents d
    JOIN canon c ON d.doc_id = c.doc_id
    GROUP BY d.lang
    ORDER BY d.lang
    """,
    tags=("dedup", "exact"),
)
def q39_exact_dedup(spark, sf_dir):
    """Exact dedup: keep min-doc_id per content hash (hash-groupBy, one
    uniform-key shuffle), then summarize survivors per language."""
    d = t(spark, sf_dir, "documents")
    kept = exact_dedup(d, "text", "doc_id")
    return (
        kept.groupBy("lang")
        .agg(F.count("*").alias("n_kept"),
             F.round(F.sum("n_chars"), 2).alias("total_chars"))
        .orderBy("lang")
    )


# ---------------------------------------------------------------------- q40
@register(
    "q40_ngram_jaccard_pairs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(tk) - 3, 1)),
               i -> array_to_string(tk[i:i+4], ' ')))) AS shingle
      FROM toks WHERE len(tk) >= 5
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id1, id2,
           round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON id1 = sa.doc_id
    JOIN sizes sb ON id2 = sb.doc_id
    WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.3
    ORDER BY id1, id2
    """,
    tags=("dedup", "ngram-jaccard"),
)
def q40_ngram_jaccard_pairs(spark, sf_dir):
    """Exact 5-gram Jaccard near-dup pairs ≥ 0.3 — the ground-truth
    near-dup operator (shingle self-join; MinHash-LSH is the scale
    path)."""
    d = t(spark, sf_dir, "documents")
    return (
        ngram_jaccard_pairs(d, "doc_id", "text", n=5, threshold=0.3)
        .orderBy("id1", "id2")
    )


# ---------------------------------------------------------------------- q41
@register(
    "q41_minhash_lsh_pairs",
    oracle=None,  # banded LSH plan; golden-tested in tests/test_dedup.py
    tags=("dedup", "minhash-lsh"),
)
def q41_minhash_lsh_pairs(spark, sf_dir):
    """MinHash(32) + LSH(8 bands × 4 rows) candidate pairs with
    estimated Jaccard ≥ 0.3 — the 100 TB dedup path: shuffle key is
    (band, bucket), never the raw shingle."""
    d = t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, "doc_id", "text", threshold=0.3).orderBy("id1", "id2")


# ---------------------------------------------------------------------- q42
@register(
    "q42_simhash",
    oracle=None,  # golden-tested in tests/test_dedup.py
    tags=("dedup", "simhash"),
)
def q42_simhash(spark, sf_dir):
    """Per-doc 32-bit SimHash fingerprints (signed bit votes over token
    hashes); hamming-band pair generation shares the LSH shape."""
    d = t(spark, sf_dir, "documents")
    return simhash(d, "doc_id", "text").orderBy("doc_id")
