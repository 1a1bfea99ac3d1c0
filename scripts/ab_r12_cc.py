"""r12 A/B: min-label connected components — old (join+agg+join per
round) vs new (closed-neighborhood join+agg per round) on the real
q61/q204 inputs at the bench scale factor. Alternating reps, one warm
session, per-rep seconds printed; the measured object (label
propagation rounds, one count job per round) is unchanged.

    python scripts/ab_r12_cc.py [sf_dir] [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def cc_old(edges, src="id1", dst="id2", max_rounds=50):
    raw = edges.select(F.col(src).alias("a"),
                       F.col(dst).alias("b")).localCheckpoint()
    sym = (
        raw.union(raw.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        sym.groupBy(F.col("a").alias("node"))
        .agg(F.least(F.min("b"), F.min("a")).alias("comp"))
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        nbr_min = (
            sym.join(labels.select(F.col("node").alias("b"),
                                   F.col("comp").alias("nbr_comp")), "b")
            .groupBy("a").agg(F.min("nbr_comp").alias("nbr_min"))
        )
        proposed = (
            labels.join(nbr_min.select(F.col("a").alias("node"), "nbr_min"),
                        "node", "left")
            .select("node",
                    F.col("comp").alias("old_comp"),
                    F.least("comp", F.coalesce("nbr_min", "comp"))
                    .alias("comp"))
            .localCheckpoint(eager=False)
        )
        changed = proposed.filter(F.col("comp") != F.col("old_comp")).count()
        labels = proposed.select("node", "comp")
        if changed == 0:
            return labels
    raise RuntimeError("no converge")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from sunat_rree_demo_spark.operators.components import (
        connected_components as cc_new,
    )
    from sunat_rree_demo_spark.queries.llm_pipeline import dup_pair_edges
    from sunat_rree_demo_spark.session import get_spark

    spark = get_spark("ab_r12_cc")
    edges = dup_pair_edges(spark, sf_dir)  # memo build = warmup
    edges.count()

    def run(fn):
        t0 = time.monotonic()
        n = fn(edges).count()
        return time.monotonic() - t0, n

    olds, news = [], []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"ab:cc_old#r{i}")
        t, n_old = run(cc_old)
        olds.append(t)
        spark.sparkContext.setJobDescription(f"ab:cc_new#r{i}")
        t, n_new = run(cc_new)
        news.append(t)
        assert n_old == n_new, (n_old, n_new)
    # label equality, full check once
    a = {(r.node, r.comp) for r in cc_old(edges).collect()}
    b = {(r.node, r.comp) for r in cc_new(edges).collect()}
    assert a == b, "label mismatch"
    print(f"old: {[round(t,3) for t in olds]} min={min(olds):.3f}")
    print(f"new: {[round(t,3) for t in news]} min={min(news):.3f}")
    print(f"labels identical over {len(a)} nodes")
    spark.stop()


if __name__ == "__main__":
    main()
