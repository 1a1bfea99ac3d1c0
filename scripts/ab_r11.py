"""Round-11 same-session A/B adjudication (VERDICT r10 task #1).

ONE warm Spark session at sf0.1, back-to-back variants:

  q144  A: eager containment_pairs (the ≤r10 shape — per-call grouped
           pair emit over the session shingle memo)
        B: containment_scores over the session pair-intersection memo
           (the r11 registered shape) — plus the DuckDB twin.
  q206  re-A/B: the registered query vs its DuckDB twin (the r8
           sanction row cites 1.3×; the r10 driver draw said 2.4×).

Prints one JSON line for the BASELINE.md ledger.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    import duckdb

    from sunat_rree_demo_spark.operators.dedup import (
        containment_pairs,
        containment_scores,
    )
    from sunat_rree_demo_spark.queries import REGISTRY
    from sunat_rree_demo_spark.queries.base import t
    from sunat_rree_demo_spark.queries.dedup import (
        corpus_pair_intersections,
        corpus_shingle_arrays,
    )
    from sunat_rree_demo_spark.session import get_spark

    spark = get_spark("ab_r11")
    REGISTRY["q01_annual_balance"].fn(spark, SF_DIR).toArrow()  # warm JVM

    con = duckdb.connect()
    for tbl in ("region nation customer supplier part orders lineitem "
                "events documents embeddings").split():
        con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM "
                f"'{SF_DIR}/{tbl}.parquet'")

    def reps(fn, n=3):
        out = []
        for _ in range(n):
            t0 = time.monotonic()
            fn()
            out.append(round(time.monotonic() - t0, 3))
        return out

    res: dict[str, object] = {"sf_dir": SF_DIR}

    # ---- q144 ----
    # Warm the shingle memo first so variant A measures the pair emit,
    # not Python shingling (that is exactly what the driver bench sees).
    corpus_shingle_arrays(spark, SF_DIR).toArrow()

    def q144_eager():
        (containment_pairs(t(spark, SF_DIR, "documents"), "doc_id",
                           "text", n=5, threshold=0.5,
                           arr=corpus_shingle_arrays(spark, SF_DIR))
         .orderBy("id1", "id2").toArrow())

    res["q144_eager"] = reps(q144_eager)

    # Build the pair-intersection memo (cold, once per session), then
    # measure the registered serving shape.
    t0 = time.monotonic()
    corpus_pair_intersections(spark, SF_DIR).toArrow()
    res["immemo_build_cold"] = round(time.monotonic() - t0, 3)

    def q144_served():
        (containment_scores(corpus_pair_intersections(spark, SF_DIR),
                            threshold=0.5)
         .orderBy("id1", "id2").toArrow())

    res["q144_served"] = reps(q144_served)
    res["q144_twin"] = reps(
        lambda: con.sql(REGISTRY["q144_containment_pairs"].oracle).arrow(),
        2)

    # ---- q206 ----
    res["q206_spark"] = reps(
        lambda: REGISTRY["q206_ivf_recall_curve"].fn(spark, SF_DIR)
        .toArrow())
    res["q206_twin"] = reps(
        lambda: con.sql(REGISTRY["q206_ivf_recall_curve"].oracle).arrow(),
        2)

    for k in ("q144_served", "q206_spark"):
        twin = min(res[k.split("_")[0] + "_twin"])  # type: ignore[arg-type]
        res[k + "_ratio"] = round(min(res[k]) / twin, 2)  # type: ignore

    print("ABRESULT " + json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
