"""r12 A/B (verdict ask #6): curate()'s edges path (read a persisted
full-corpus near-dup pair graph, restrict to survivors with two
semi-joins) vs the arr path (re-derive MinHash signatures from the
shingle-array table over the survivors, band, estimate) at a
COMPUTE-BOUND scale — 10x the sf0.1 documents corpus (each replica's
text perturbed with a distinct suffix token so exact dedup keeps it
and the signature pass has real work; content is irrelevant to the
question, volume is the variable). Both prerequisite tables (shingle
arrays, pair graph) are materialized to parquet ONCE, exactly like the
session memos the real q204 reads, so the A/B measures only the
per-call funnel cost.

    python scripts/ab_r12_q204_scale.py [replicas] [reps]
"""
from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    work = "/tmp/r12_ab_q204"

    from sunat_rree_demo_spark.operators.dedup import (
        doc_shingle_arrays,
        minhash_lsh_pairs,
    )
    from sunat_rree_demo_spark.plans.curate import curate, curate_summary
    from sunat_rree_demo_spark.session import get_spark

    spark = get_spark("ab_r12_q204_scale")
    shutil.rmtree(work, ignore_errors=True)

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    off = 10_000_000
    docs = None
    for i in range(replicas):
        rep = base.select(
            (F.col("doc_id") + F.lit(i * off)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" rr{i}")).alias("text"))
        docs = rep if docs is None else docs.unionByName(rep)
    docs.write.mode("overwrite").parquet(f"{work}/documents")
    docs = spark.read.parquet(f"{work}/documents")
    print(f"corpus: {docs.count()} docs ({replicas}x)")

    doc_shingle_arrays(docs, "doc_id", "text", 5) \
        .write.mode("overwrite").parquet(f"{work}/arr")
    arr = spark.read.parquet(f"{work}/arr")
    minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.3, arr=arr) \
        .select("id1", "id2") \
        .write.mode("overwrite").parquet(f"{work}/edges")
    edges = spark.read.parquet(f"{work}/edges")
    print(f"pair graph: {edges.count()} edges")

    def run_edges():
        t0 = time.monotonic()
        out = curate_summary(curate(docs, edges=edges,
                                    edges_threshold=0.3)).collect()
        return time.monotonic() - t0, out

    def run_arr():
        t0 = time.monotonic()
        out = curate_summary(curate(docs, arr=arr)).collect()
        return time.monotonic() - t0, out

    te, ta = [], []
    ref = None
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"ab:q204_edges#r{i}")
        t, oe = run_edges()
        te.append(t)
        spark.sparkContext.setJobDescription(f"ab:q204_arr#r{i}")
        t, oa = run_arr()
        ta.append(t)
        assert oe == oa, "result mismatch between edges and arr paths"
        ref = oe
    print(f"edges path: {[round(t, 3) for t in te]} min={min(te):.3f}")
    print(f"arr   path: {[round(t, 3) for t in ta]} min={min(ta):.3f}")
    print("summary rows:", ref)
    spark.stop()


if __name__ == "__main__":
    main()
