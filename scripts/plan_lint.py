"""Lint registry query plans for scale smells (plans/lint.py).

    python scripts/plan_lint.py [sf_dir] [qNN_name ...]

No names → every registered query. Prints per-query findings (errors
and warnings; pass -v for info too) and exits 1 if any error-level
finding appears.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "-v"]
    verbose = "-v" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    from sunat_rree_demo_spark.plans.lint import audit
    from sunat_rree_demo_spark.queries import REGISTRY
    from sunat_rree_demo_spark.session import get_spark

    names = args[1:] or list(REGISTRY)
    spark = get_spark("plan_lint", cpus=8, shuffle_partitions=8)
    n_err = 0
    for name in names:
        findings = audit(REGISTRY[name].fn.__wrapped__(spark, sf_dir))
        shown = [f for f in findings
                 if verbose or f.severity in ("error", "warning")]
        n_err += sum(f.severity == "error" for f in findings)
        if shown:
            print(f"== {name}")
            for f in shown:
                print(f"  [{f.severity}] {f.code}: {f.message}")
    print(f"\n{len(names)} plans linted, {n_err} error-level findings")
    return 1 if n_err else 0


if __name__ == "__main__":
    raise SystemExit(main())
