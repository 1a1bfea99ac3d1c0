"""Search-index build + query: materialize the inverted index (posting
lists, document lengths, corpus stats) to parquet, then answer BM25
queries from the INDEX — reading only the query terms' postings — with
scores provably identical to q98's direct corpus scan (one shared
scorer: operators.retrieval.bm25_doc_scores; equivalence is
test-pinned in tests/test_retrieval_plan.py).

Artifacts under ``<out_dir>/``:

- ``postings/``  (term, df, cf, postings: array<struct<doc_id, tf>>),
  repartitioned BY RANGE on the term so each parquet file covers a
  sorted term interval — min/max footer stats then prune non-matching
  files for a term-equality query (the poor-man's term index; at
  warehouse scale this is the sharded lexicon layout).
- ``doclen/``    (doc_id, dl)
- ``stats/``     one row (n_docs, avgdl) — avgdl pre-rounded to 6dp at
  build time, the same materialization point the direct query uses.

Scale shape: the build is the q129 posting aggregate (one (term, doc)
shuffle + one term shuffle, per-term state = that term's own posting
list). Search reads postings with the term filter PUSHED to the scan,
explodes only the matching lists (|query| rows → |candidate docs|
rows), and joins doclen on the doc key; stats ride broadcast 1-row
frames. No corpus scan at query time."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from sunat_rree_demo_spark.operators.retrieval import bm25_doc_scores
from sunat_rree_demo_spark.operators.text import tokens
from sunat_rree_demo_spark.queries.corpus import BM25_B, BM25_K1


def build_search_index(docs: DataFrame, out_dir: str,
                       id_col: str = "doc_id", text_col: str = "text",
                       n_shards: int = 8) -> None:
    """Materialize the BM25 index artifacts for ``docs`` to
    ``out_dir`` (overwrites)."""
    tk = docs.select(F.col(id_col).alias("doc_id"),
                     F.explode(tokens(F.col(text_col))).alias("term"))
    tf = (tk.groupBy("term", "doc_id")
          .agg(F.count("*").cast("bigint").alias("tf")))
    postings = (
        tf.groupBy("term")
        .agg(F.count("*").cast("bigint").alias("df"),
             F.sum("tf").cast("bigint").alias("cf"),
             F.array_sort(F.collect_list(F.struct("doc_id", "tf")))
             .alias("postings"))
        .repartitionByRange(n_shards, "term")
    )
    postings.write.mode("overwrite").parquet(f"{out_dir}/postings")
    dl = tk.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("dl"))
    dl.write.mode("overwrite").parquet(f"{out_dir}/doclen")
    (docs.agg(F.count("*").cast("bigint").alias("n_docs"))
     .join(dl.agg(F.round(F.avg("dl"), 6).alias("avgdl")))
     .write.mode("overwrite").parquet(f"{out_dir}/stats"))


def bm25_search(spark: SparkSession, index_dir: str,
                terms: tuple[str, ...], k: int = 15) -> DataFrame:
    """Top-k documents for ``terms`` answered from the index: postings
    pruned to the query terms at the scan, stored df used for idf, one
    doc-key shuffle for the final sum — byte-identical scores to the
    direct q98 pipeline."""
    p = (spark.read.parquet(f"{index_dir}/postings")
         .filter(F.col("term").isin(*terms)))
    tf = p.select("term", F.explode("postings").alias("_p")) \
        .select("term", F.col("_p.doc_id").alias("doc_id"),
                F.col("_p.tf").alias("tf"))
    dfq = p.select("term", "df")
    dl = spark.read.parquet(f"{index_dir}/doclen")
    stats = spark.read.parquet(f"{index_dir}/stats")
    nd = stats.select(F.col("n_docs").alias("n"))
    st = stats.select("avgdl")
    return (
        bm25_doc_scores(tf, dl, nd, st, BM25_K1, BM25_B, dfq=dfq)
        .orderBy(F.desc("score_micro"), "doc_id")
        .limit(k)
    )
