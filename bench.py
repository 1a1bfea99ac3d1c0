"""Benchmark harness: runs every registered query at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Also times the DuckDB oracle for each query on the same parquet (the
operative baseline per BASELINE.md) under "oracle_sec"; "ratio" is
spark_total / duckdb_total.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    from sunat_rree_demo_spark.queries import REGISTRY
    from sunat_rree_demo_spark.session import get_spark

    spark = get_spark("bench")

    # warmup: JVM + parquet footer caches, excluded from timings
    REGISTRY["q01_annual_balance"].fn(spark, sf_dir).count()

    # steady-state protocol: two runs per query, report the faster (the
    # first run pays one-off codegen/compile; both engines get the same
    # treatment below). Cold totals are preserved under "cold_sec".
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name, q in REGISTRY.items():
        runs = []
        for _ in range(2):
            t0 = time.monotonic()
            q.fn(spark, sf_dir).count()
            runs.append(time.monotonic() - t0)
        cold[name] = round(runs[0], 3)
        timings[name] = round(min(runs), 3)

    oracle_timings: dict[str, float] = {}
    try:
        import duckdb

        con = duckdb.connect()
        for t in ("region nation customer supplier part orders lineitem events "
                  "documents embeddings").split():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        for name, q in REGISTRY.items():
            if q.oracle is None:
                continue
            runs = []
            for _ in range(2):
                t0 = time.monotonic()
                con.sql(q.oracle).fetchall()
                runs.append(time.monotonic() - t0)
            oracle_timings[name] = round(min(runs), 3)
    except Exception:  # noqa: BLE001 - oracle timing is informative only
        pass

    total = round(sum(timings.values()), 3)
    oracle_total = round(sum(oracle_timings.values()), 3) if oracle_timings else None
    out = {
        "metric": "full_query_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "n_queries": len(timings),
        "cold_sec": cold,
        "cold_total_sec": round(sum(cold.values()), 3),
        "oracle_sec": oracle_timings,
        "oracle_total_sec": oracle_total,
        "ratio_vs_duckdb": round(total / oracle_total, 3) if oracle_total else None,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
