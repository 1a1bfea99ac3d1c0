"""Scale-robustness probe: run the heavy dedup/index operators on N×
replicas of the sf0.1 documents corpus (ids shifted per replica, so
every replica's docs are near-dups of their twins — the worst case for
pair generation) and print per-step wall-clock at 1× and N×.

Purpose: evidence for SCALE.md's linearity claims — banded LSH pair
generation, index build, and bucketed index-vs-index joins should grow
~linearly in corpus size; anything super-linear here is a plan bug the
sf0.1 bench can't see. This is a LOCAL experiment over derived data;
the oracle-checked testdata stays untouched.

Usage: python scripts/scale_probe.py [N] [sf_dir]   (defaults 10, sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from sunat_rree_demo_spark.operators.dedup import (
        doc_shingle_arrays,
        minhash_lsh_pairs,
    )
    from sunat_rree_demo_spark.operators.dedup_index import (
        cross_index_candidates,
        write_minhash_index,
    )
    from sunat_rree_demo_spark.session import get_spark
    from sunat_rree_demo_spark.sources.catalog import load_table

    spark = get_spark("scale_probe")
    base = load_table(spark, sf_dir, "documents")
    n_base = base.count()

    def replicate(k: int):
        """SYMMETRIC preparation for every scale (review finding r6:
        an asymmetric probe — checkpointed 10x vs parquet-backed 1x,
        with the 10x materialization running before the 1x timings —
        skews the growth ratios it exists to measure): each scale is
        repartitioned and checkpointed identically, lazily, right
        before ITS measurements."""
        out = base
        for i in range(1, k):
            out = out.unionByName(
                base.withColumn("doc_id",
                                F.col("doc_id") + F.lit(i * 10_000_000)))
        return out.repartition(32).localCheckpoint()

    import shutil
    import tempfile

    # JVM/codegen warmup outside the measurements
    doc_shingle_arrays(base.limit(50), "doc_id", "text", 5).count()

    results = {"n_replicas": n, "base_docs": n_base, "steps": {}}
    roots = []
    for scale, k in (("1x", 1), (f"{n}x", n)):
        docs = replicate(k)
        tag = {}
        t0 = time.monotonic()
        arr = doc_shingle_arrays(docs, "doc_id", "text", 5).localCheckpoint()
        tag["shingle_sec"] = round(time.monotonic() - t0, 2)

        t0 = time.monotonic()
        pairs = minhash_lsh_pairs(docs, "doc_id", "text",
                                  threshold=0.3, arr=arr)
        n_pairs = pairs.count()
        tag["lsh_pairs_sec"] = round(time.monotonic() - t0, 2)
        tag["n_pairs"] = n_pairs

        root = tempfile.mkdtemp(prefix=f"probe_{scale}_")
        roots.append(root)
        t0 = time.monotonic()
        write_minhash_index(docs.filter("doc_id % 2 = 0"), f"{root}/a")
        write_minhash_index(docs.filter("doc_id % 2 = 1"), f"{root}/b")
        tag["index_build_sec"] = round(time.monotonic() - t0, 2)

        t0 = time.monotonic()
        cand = cross_index_candidates(
            spark, f"{root}/a", f"{root}/b",
            f"probe_a_{scale}", f"probe_b_{scale}")
        tag["n_cross_candidates"] = cand.count()
        tag["index_join_sec"] = round(time.monotonic() - t0, 2)
        results["steps"][scale] = tag

    # clean up the probe's warehouse tables (fixed names, no app id)
    # AND the temp index roots (two full MinHash trees per run
    # otherwise accumulate under /tmp — review finding r6)
    for root in roots:
        shutil.rmtree(root, ignore_errors=True)
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir").removeprefix("file:")
    for scale in ("1x", f"{n}x"):
        for side in ("a", "b"):
            spark.sql(f"DROP TABLE IF EXISTS probe_{side}_{scale}")
            shutil.rmtree(f"{warehouse}/probe_{side}_{scale}",
                          ignore_errors=True)

    one, big = results["steps"]["1x"], results["steps"][f"{n}x"]
    results["growth"] = {
        k: round(big[k] / one[k], 2)
        for k in ("shingle_sec", "lsh_pairs_sec", "index_build_sec",
                  "index_join_sec") if one[k] > 0
    }
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
