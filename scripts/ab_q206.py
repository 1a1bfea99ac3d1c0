"""q206 re-A/B on an idle box (the ab_r11.py q206 draw was contaminated
by a concurrent parity run — two JVMs on one box violates the bench
protocol). Spark vs DuckDB twin, 4 reps / 3 reps, one session."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    import duckdb

    from sunat_rree_demo_spark.queries import REGISTRY
    from sunat_rree_demo_spark.session import get_spark

    spark = get_spark("ab_q206")
    REGISTRY["q01_annual_balance"].fn(spark, SF_DIR).toArrow()

    con = duckdb.connect()
    for tbl in ("region nation customer supplier part orders lineitem "
                "events documents embeddings").split():
        con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM "
                f"'{SF_DIR}/{tbl}.parquet'")

    def reps(fn, n):
        out = []
        for _ in range(n):
            t0 = time.monotonic()
            fn()
            out.append(round(time.monotonic() - t0, 3))
        return out

    res = {
        "q206_spark": reps(
            lambda: REGISTRY["q206_ivf_recall_curve"].fn(spark, SF_DIR)
            .toArrow(), 4),
        "q206_twin": reps(
            lambda: con.sql(REGISTRY["q206_ivf_recall_curve"].oracle)
            .arrow(), 3),
    }
    res["ratio"] = round(min(res["q206_spark"]) / min(res["q206_twin"]), 2)
    print("ABRESULT " + json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
