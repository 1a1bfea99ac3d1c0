"""Driver-literal DataFrames as JVM LocalRelations.

``spark.createDataFrame(list_of_tuples, schema)`` builds a *Python
RDD*-backed frame: every downstream action schedules
``defaultParallelism`` pickled-Python tasks (32 on the bench box,
~0.3 s per action) just to re-emit a handful of rows the driver
already holds, and a broadcast of such a frame must run that job
first. Routing the same rows through pandas + Arrow instead yields a
``LocalTableScan`` whenever the payload sits under
``spark.sql.execution.arrow.localRelationThreshold`` (48 MB default):
collected driver-side without a job, broadcast without a job, and
visible to the optimizer as a literal relation.

Guide §4 (eliminate the Python boundary) applied to the *driver* side:
probe tables, centroid lookups, and ≤k result frames are decisions the
driver made; executors should never run Python to reconstruct them.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import pandas as pd


def local_df(spark, rows: Iterable[Sequence], schema):
    """Small literal DataFrame without the Python-RDD path.

    ``rows`` are driver-side tuples (or an empty list), ``schema`` a DDL
    string or StructType — the same signature as ``createDataFrame``.
    Values are mapped positionally into the declared schema, exactly as
    the classic path does. Falls back to the classic path when the
    Arrow conversion declines (exotic types, Arrow disabled)."""
    rows = list(rows)
    names = (schema.fieldNames() if hasattr(schema, "fieldNames")
             else [f.split()[0].strip("`")
                   for f in _split_ddl(schema)])
    pdf = pd.DataFrame(rows if rows else None, columns=names)
    try:
        return spark.createDataFrame(pdf, schema)
    except Exception:  # pragma: no cover - Arrow-less fallback
        return spark.createDataFrame(rows, schema)


def _split_ddl(ddl: str) -> list[str]:
    """Top-level comma split of a DDL schema string (commas inside
    ``array<...>`` / ``struct<...>`` / ``decimal(...)`` don't count)."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(ddl):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(ddl[start:i].strip())
            start = i + 1
    parts.append(ddl[start:].strip())
    return [p for p in parts if p]
