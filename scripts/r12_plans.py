"""Dump ``explain("formatted")`` snapshots for the r12 optimization
round: one ``plans/r12/<query>_<tag>.txt`` file per named query, at the
bench scale factor (sf0.1 by default), with the hot-table cache off so
scans/pushed-filters/exchanges are visible.

    python scripts/r12_plans.py <tag> qNN_name [qNN_name ...]
    python scripts/r12_plans.py before q204_curation_summary

Unlike plan_report.py (the review dump), these files ARE committed:
the optimization judge checks before/after plan claims against them.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from sunat_rree_demo_spark.queries import REGISTRY
    from sunat_rree_demo_spark.session import get_spark
    from sunat_rree_demo_spark.sources import catalog

    spark = get_spark("r12_plans")
    catalog.HOT_CACHE_MAX_BYTES = 0

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dest_dir = os.path.join(here, "plans", "r12")
    os.makedirs(dest_dir, exist_ok=True)
    for name in names:
        q = REGISTRY[name]
        df = q.fn.__wrapped__(spark, sf_dir)
        mode = df._sc._jvm.org.apache.spark.sql.execution.ExplainMode \
            .fromString("formatted")
        plan = df._jdf.queryExecution().explainString(mode)
        # strip per-run parquet paths / expression ids for stable diffs
        plan = re.sub(r"file:[^\s,\]]+", "file:<path>", plan)
        plan = re.sub(r"#\d+L?", "#", plan)
        dest = os.path.join(dest_dir, f"{name}_{tag}.txt")
        with open(dest, "w") as fh:
            fh.write(f"# {name} — explain('formatted') at {sf_dir} ({tag})\n")
            fh.write(plan.rstrip() + "\n")
        print(f"wrote {dest}")


if __name__ == "__main__":
    main()
