"""Persisted MinHash index + incremental near-dup detection — the
production dedup shape at corpus scale: signatures are computed ONCE
per document and stored; each new ingest batch signatures only its own
docs and probes the index, instead of re-running pairwise dedup over
the whole corpus per batch (the reference pipeline, like q41, is
batch-global; this is its incremental twin).

Index layout (two parquet tables under one root):
- ``sigs/``  — (id, sig array<bigint>): one row per doc.
- ``bands/`` — (id, band, bucket): LSH band rows, the join key layout.

Scale design: an ingest batch is small relative to the corpus, so the
batch's band rows BROADCAST and the stored band table is probed by a
map-side hash join — the corpus-side shuffle is zero. Estimates then
join signatures for just the candidate ids (semi-join-sized reads).
Appending a batch is an append-mode parquet write of its own rows; no
index rewrite. With the bucketed-table sink (plans/bucketed) the bands
table can additionally be bucketed by ``bucket`` for shuffle-free
index-vs-index joins; plain parquet keeps this module engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from sunat_rree_demo_spark.operators.dedup import (
    LSH_BANDS,
    MINHASH_K,
    band_rows,
    estimate_pairs,
    minhash_signatures,
)


def _read_or_empty(spark: SparkSession, path: str, schema) -> DataFrame:
    """The not-yet-bootstrapped index reads as empty (first streaming
    micro-batch probes before anything was ever appended). ONLY the
    path-missing case falls back — a corrupt or unreadable existing
    index must fail loudly, not silently drop every cross-batch pair."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.schema(schema).parquet(path)
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" in str(exc):
            return spark.createDataFrame([], schema)
        raise


def write_minhash_index(docs: DataFrame, path: str, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 5,
                        k: int = MINHASH_K, bands: int = LSH_BANDS,
                        mode: str = "overwrite") -> None:
    """Materialize (or with ``mode='append'``, extend) the index."""
    sig = minhash_signatures(docs, id_col, text_col, n, k).localCheckpoint()
    sig.write.mode(mode).parquet(f"{path}/sigs")
    band_rows(sig, id_col, k, bands).write.mode(mode).parquet(f"{path}/bands")


def append_minhash_index(docs: DataFrame, path: str, **kw) -> None:
    write_minhash_index(docs, path, mode="append", **kw)


def incremental_near_dup_pairs(spark: SparkSession, new_docs: DataFrame,
                               path: str, id_col: str = "doc_id",
                               text_col: str = "text", n: int = 5,
                               k: int = MINHASH_K, bands: int = LSH_BANDS,
                               threshold: float = 0.3) -> DataFrame:
    """Near-dup pairs (id1 < id2, jaccard_est ≥ threshold) touching the
    new batch: new-vs-index plus new-vs-new. Identical estimates to the
    batch-global ``minhash_lsh_pairs`` restricted to pairs with at
    least one new doc — pinned by tests/test_dedup_index.py."""
    new_sig = minhash_signatures(new_docs, id_col, text_col, n, k) \
        .localCheckpoint()
    new_bands = band_rows(new_sig, id_col, k, bands)
    idx_bands = _read_or_empty(spark, f"{path}/bands", new_bands.schema)
    idx_sigs = _read_or_empty(spark, f"{path}/sigs", new_sig.schema)

    # candidates sharing any (band, bucket): corpus side probes the
    # broadcast batch; within-batch pairs from the tiny self-join
    nb = new_bands.select("band", "bucket", F.col(id_col).alias("_nid"))
    cross = (
        idx_bands.join(F.broadcast(nb), ["band", "bucket"])
        .select(F.least(id_col, "_nid").alias("id1"),
                F.greatest(id_col, "_nid").alias("id2"))
    )
    within = (
        new_bands.alias("a")
        .join(F.broadcast(new_bands.alias("b")), ["band", "bucket"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id1"),
                F.col(f"b.{id_col}").alias("id2"))
    )
    cand = cross.union(within).filter("id1 != id2").distinct()

    # a doc id present in BOTH (foreachBatch replay, or a re-ingested
    # edited doc) must resolve deterministically: the NEW batch's
    # signature wins (latest-write semantics), never an arbitrary row
    sigs = (idx_sigs.join(new_sig.select(id_col), id_col, "left_anti")
            .union(new_sig))
    return estimate_pairs(cand, sigs, id_col, k, threshold)
