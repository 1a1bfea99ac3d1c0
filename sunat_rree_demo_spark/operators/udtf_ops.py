"""Python UDTF surface (SURVEY.md §2.11 — the reference has no UDTF; the
declared engine surface covers it with the unpivot/explode equivalents
plus this real table function).

A UDTF is the row-generating slow path: per input row, arbitrary Python
yielding output rows. Prefer explode/posexplode/inline for anything
expressible as array ops (JVM-side); use a UDTF when the expansion
logic is genuinely imperative (parsers, tokenizers with state,
segmenters).
"""

from __future__ import annotations

from pyspark.sql.functions import lit, udtf


@udtf(returnType="pos int, shingle string")
class ShingleUDTF:
    """Word n-gram expansion as a table function — the UDTF twin of
    operators.dedup.shingles (kept tiny; the production path is the
    array expression / mapInPandas shingler)."""

    def eval(self, text: str, n: int = 3):  # noqa: D102
        if text is None:
            return
        toks = text.strip().split()
        for i in range(max(len(toks) - n + 1, 0)):
            yield i, " ".join(toks[i:i + n])


def register_udtfs(spark) -> list[str]:
    """Register the UDTF surface for the SQL entry point:
    ``SELECT * FROM shingle_udtf('a b c d', 3)``."""
    spark.udtf.register("shingle_udtf", ShingleUDTF)
    return ["shingle_udtf"]


__all__ = ["ShingleUDTF", "register_udtfs", "lit"]
