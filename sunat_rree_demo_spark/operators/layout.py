"""Data-layout operators: Z-order (Morton) interleaving for
multi-dimensional clustering — the file-skipping layout optimizer
behind Delta/Iceberg ``OPTIMIZE ZORDER BY``. Writing a 100 TB table
sorted by the Morton code of its two hottest filter columns makes
min/max file statistics selective on BOTH columns at once, so scans
filtered on either dimension prune most files.

The bit-interleave is generated from one ``range(bits)`` loop in two
renderings — a Spark Column expression and a SQL string — so the two
engines cannot drift structurally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def morton_code(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative bigints:
    x's bit i lands at position 2i, y's at 2i+1 — the Z-order curve.
    Pure JVM bit expressions (shift/and/add), codegen'd."""
    terms: list[Column] = []
    for i in range(bits):
        terms.append(F.shiftleft(
            F.shiftright(x, i).bitwiseAND(F.lit(1)).cast("bigint"), 2 * i))
        terms.append(F.shiftleft(
            F.shiftright(y, i).bitwiseAND(F.lit(1)).cast("bigint"),
            2 * i + 1))
    out = terms[0]
    for c in terms[1:]:
        out = out + c
    return out


def morton_sql(x: str, y: str, bits: int = 16) -> str:
    """The same interleave as a SQL expression string (DuckDB oracle
    twin — identical bit layout by construction)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def with_scaled_bits(df: DataFrame, value_col: str, min_col: str,
                     max_col: str, out_col: str,
                     bits: int = 16) -> DataFrame:
    """Add ``out_col`` mapping ``value_col`` into [0, 2^bits) by EXACT
    integer arithmetic: ((v − min) · (2^bits − 1)) div (max − min) —
    integer ``div`` in both engines, so no float rounding can shift a
    bucket boundary. A degenerate (max == min) domain maps to 0.
    Implemented via named intermediates because Spark's integer ``div``
    is only reachable through SQL expression text."""
    top = (1 << bits) - 1
    return (
        df.withColumn("_sc", (F.col(value_col).cast("bigint")
                              - F.col(min_col).cast("bigint")) * top)
        .withColumn("_sp", F.col(max_col).cast("bigint")
                    - F.col(min_col).cast("bigint"))
        .withColumn(out_col, F.expr(
            "CASE WHEN _sp > 0 THEN _sc div _sp ELSE CAST(0 AS BIGINT) END"))
        .drop("_sc", "_sp")
    )
