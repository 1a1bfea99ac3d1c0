"""Scale-robustness probe for the ExactSubstr family (r8):
``exact_substring_spans`` and ``exact_substring_rewrite`` at 1× vs N×
document replication with per-replica id shifts and UNCHANGED text —
the worst case for span extraction, because every window in every doc
becomes corpus-duplicated (coverage jumps from the natural ~small
fraction to 100%), so the duplicated-position set, the island windows
and the rewrite's removal join all grow with the FULL corpus.

Claims under test (each a SCALE.md row):

* spans cost grows ~linearly in windows (the key census shuffles
  8-byte longs with map-side partial counts; islands are doc-grain) —
  no quadratic pair stage exists anywhere.
* the rewrite adds NO Python pass beyond the span keys (tokens come
  from a JVM posexplode) and its removal join is doc-grain equi-keyed,
  so 100% coverage (every token removed) costs the same shape as
  sparse coverage.

Both scales are prepared symmetrically (repartition + localCheckpoint,
JVM pre-warmed) per the probe discipline scripts/scale_probe.py
established. Usage: python scripts/scale_probe_substr.py [N] [sf_dir].
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from sunat_rree_demo_spark.operators.dedup import (
        exact_substring_rewrite,
        exact_substring_spans,
    )
    from sunat_rree_demo_spark.session import get_spark
    from sunat_rree_demo_spark.sources.catalog import load_table

    spark = get_spark("scale_probe_substr")
    results: dict = {"n_replicas": n, "steps": {}}

    base = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "text").repartition(32).localCheckpoint())
    reps = [base.select(
        (F.col("doc_id") + k * 10_000_000).alias("doc_id"), "text")
        for k in range(n)]
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    big = big.repartition(32).localCheckpoint()
    results["rows_1x"] = base.count()
    results["rows_nx"] = big.count()

    # warm the JVM + python workers on the small scale first
    exact_substring_spans(base, "doc_id", "text", 8).count()

    for label, df in (("1x", base), (f"{n}x", big)):
        t0 = time.monotonic()
        n_spans = exact_substring_spans(df, "doc_id", "text", 8).count()
        spans_sec = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        removed = (exact_substring_rewrite(df, "doc_id", "text", 8)
                   .agg(F.sum("n_removed").alias("r"),
                        F.sum("n_tokens").alias("t"))
                   .collect()[0])
        rewrite_sec = round(time.monotonic() - t0, 2)
        results["steps"][label] = {
            "spans_sec": spans_sec, "n_spans": n_spans,
            "rewrite_sec": rewrite_sec,
            "tokens_removed": int(removed["r"] or 0),
            "tokens_total": int(removed["t"] or 0),
        }
        print(label, results["steps"][label], flush=True)

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
