"""Spanish month-name mapping (operator F7, SURVEY.md §2.2).

The reference keeps months as Spanish strings and maps name↔number on
demand with a Python dict (``metrics.py:49-53``) or a 12-arm SQL CASE
(``models/metrics.sql:10-23``). Here the map is a Catalyst ``create_map``
literal — a constant-folded JVM-side lookup, no UDF, codegen-friendly at
any scale.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, functions as F

#: ``etl.py:11-14`` — canonical month order.
MONTH_NAMES_ES = (
    "Enero", "Febrero", "Marzo", "Abril", "Mayo", "Junio",
    "Julio", "Agosto", "Septiembre", "Octubre", "Noviembre", "Diciembre",
)

_NAME_TO_NUM = {name: i + 1 for i, name in enumerate(MONTH_NAMES_ES)}


def _as_map(pairs) -> Column:
    # built lazily: F.lit requires an active SparkContext
    return F.create_map(*[F.lit(x) for x in chain.from_iterable(pairs)])


def month_num_from_name(month: Column | str) -> Column:
    """Spanish month name → 1..12 (NULL for 'Total' QA rows, like the
    reference's ``.map`` which yields NaN for unknown keys)."""
    m = _as_map((n, i + 1) for i, n in enumerate(MONTH_NAMES_ES))
    return m[F.col(month) if isinstance(month, str) else month]


def month_name_es(month_num: Column | str) -> Column:
    """1..12 → Spanish month name (inverse map, ``eda.py:98``)."""
    m = _as_map((i + 1, n) for i, n in enumerate(MONTH_NAMES_ES))
    return m[F.col(month_num) if isinstance(month_num, str) else month_num]


def month_name_es_sql(col: str) -> str:
    """The same mapping as an ANSI CASE expression — shared verbatim by the
    Spark SQL entry and the DuckDB oracle so both sides agree by
    construction (mirrors ``models/metrics.sql:10-23``)."""
    arms = "\n".join(
        f"WHEN {i + 1} THEN '{n}'" for i, n in enumerate(MONTH_NAMES_ES)
    )
    return f"CASE {col} {arms} END"


def month_num_from_name_sql(col: str = "month") -> str:
    """Inverse CASE (name → 1..12) — the single source for every SQL
    consumer (view layer, oracles); generated from MONTH_NAMES_ES so the
    two directions can never desynchronize."""
    arms = "\n".join(
        f"WHEN '{n}' THEN {i + 1}" for i, n in enumerate(MONTH_NAMES_ES)
    )
    return f"CASE {col} {arms} END"
