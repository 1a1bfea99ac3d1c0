"""Local simulation of the driver's DuckDB-oracle correctness gate.

For each query in the registry: run the Spark DataFrame and the oracle SQL
on the same parquet, then compare row count, sorted column names, and an
order-insensitive value comparison (exact for strings/ints, tiny epsilon
for floats so we see *near* misses distinctly from hard mismatches).

Usage: python scripts/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    """Sort columns by name, then rows — the driver's order-insensitive
    compare. Floats rounded to 9 significant-ish digits for sorting."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def keyify(v):
        if v is None:
            return (0, "")
        if isinstance(v, float):
            if math.isnan(v):
                return (1, "nan")
            return (2, f"{v:.6f}")
        return (3, str(v))

    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(out, key=lambda r: [keyify(v) for v in r])


def values_equal(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return abs(fa - fb) <= 1e-6 * max(1.0, abs(fa), abs(fb))
    return str(a) == str(b)


def compare(name: str, spark_df, duck_rows, duck_cols) -> list[str]:
    problems = []
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    if sorted(s_cols) != sorted(duck_cols):
        problems.append(f"schema: spark={sorted(s_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(s_rows) != len(duck_rows):
        problems.append(f"rowcount: spark={len(s_rows)} duck={len(duck_rows)}")
    a = normalize(s_rows, s_cols)
    b = normalize(duck_rows, duck_cols)
    n_bad = 0
    for i, (ra, rb) in enumerate(zip(a, b)):
        for va, vb in zip(ra, rb):
            if not values_equal(va, vb):
                if n_bad < 3:
                    problems.append(f"row {i}: {ra} != {rb}")
                n_bad += 1
                break
    if n_bad:
        problems.append(f"{n_bad}/{len(a)} rows differ")
    return problems


def main() -> int:
    sys.path.insert(0, "/root/repo")
    from sunat_rree_demo_spark.queries import REGISTRY
    from sunat_rree_demo_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("parity-check")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failed = []
    for name, q in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            sdf = q.fn(spark, sf_dir)
            if q.oracle is None:
                n = sdf.count()
                print(f"  {name}: rows-only check, {n} rows")
                continue
            rel = con.sql(q.oracle)
            duck_cols = list(rel.columns)
            duck_rows = rel.fetchall()
            problems = compare(name, sdf, duck_rows, duck_cols)
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION {type(e).__name__}: {e}"]
        if problems:
            failed.append(name)
            print(f"✗ {name}")
            for p in problems[:6]:
                print(f"    {p}")
        else:
            print(f"✓ {name}")
    print(f"\n{len(REGISTRY) - len(failed)}/{len(REGISTRY)} queries match")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
