"""Interactive perf lab: `python -i scripts/lab.py` gives a warm Spark
session at sf0.1 plus helpers.

    tq("q49_correlation")        # time warm (2 runs, min) via toArrow
    ex("q49_correlation")        # formatted physical plan
    od("q49_correlation")        # time the DuckDB oracle
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from sunat_rree_demo_spark.queries import REGISTRY  # noqa: E402
from sunat_rree_demo_spark.session import get_spark  # noqa: E402

spark = get_spark("lab")
REGISTRY["q01_annual_balance"].fn(spark, SF_DIR).toArrow()  # warmup


def tq(name: str, runs: int = 3) -> float:
    ts = []
    for _ in range(runs):
        t0 = time.monotonic()
        REGISTRY[name].fn(spark, SF_DIR).toArrow()
        ts.append(time.monotonic() - t0)
    best = min(ts)
    print(f"{name}: warm {best:.3f}s  (runs: {[round(x,3) for x in ts]})")
    return best


def ex(name: str) -> None:
    REGISTRY[name].fn(spark, SF_DIR).explain("formatted")


def od(name: str, runs: int = 2) -> float:
    import duckdb
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    ts = []
    for _ in range(runs):
        t0 = time.monotonic()
        con.sql(REGISTRY[name].oracle).arrow()
        ts.append(time.monotonic() - t0)
    best = min(ts)
    print(f"{name}: oracle {best:.3f}s")
    return best


def reload_queries() -> None:
    """Re-import query modules after an edit (clears the registry)."""
    import importlib

    REGISTRY.clear()
    mods = [m for m in list(sys.modules) if m.startswith("sunat_rree_demo_spark")]
    for m in mods:
        del sys.modules[m]
    import sunat_rree_demo_spark.queries  # noqa: F401
    from sunat_rree_demo_spark.queries import REGISTRY as R2
    REGISTRY.update(R2)
    print(f"reloaded: {len(REGISTRY)} queries")
