"""Markup→text extraction queries (r7): the web-crawl curation FRONT
DOOR — a real user hits tag stripping, boilerplate removal and
mojibake repair before any dedup/quality pass (reference has no such
stage; driver-mandated LLM-pipeline extension, SURVEY.md §7.4).

Oracle devices (the q186 'oracle never sees the codec' pattern):

* q198 — both engines CONSTRUCT the same HTML from ``documents``
  (script/style/head blocks, entities, tag-wrapped words), Spark
  extracts with ``operators.extract.html_to_text`` (pure JVM regexp
  chain), and the oracle runs the IDENTICAL RE2 patterns via
  ``html_to_text_sql`` — generated from the same pattern tables, so
  the engines cannot drift. A wrong drop-block, entity order or
  whitespace collapse breaks the hash.
* q199 — both engines derive the same multi-line text, Spark picks the
  densest run with the Arrow-batched ``main_content`` picker, the
  oracle replays the Kohlschütter line-density rule as gaps-and-islands
  SQL (run = qualifying lines at consecutive indexes; best run by
  total words, FIRST on ties — Python ``max`` semantics).
* q200 — both engines build the same accented CLEAN text; Spark
  deterministically BREAKS it (UTF-8 bytes mis-decoded as Latin-1 —
  the classic double-encoding corruption) and repairs it with
  ``fix_mojibake``; the oracle simply returns the clean text, so the
  hash match proves the repair is an exact inverse, pass-through rows
  included.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sunat_rree_demo_spark.operators.extract import (
    fix_mojibake,
    html_to_text,
    html_to_text_sql,
    main_content,
)
from sunat_rree_demo_spark.queries.base import register, t

#: deterministic HTML construction — a single SQL expression valid in
#: BOTH engines (`||` concat + literal replace), so the input markup is
#: bit-identical on the two sides: real drop-blocks with attributes, a
#: comment, entity escapes (named, decimal) and tag-wrapped words.
_HTML_EXPR = (
    "'<html><head><title>t</title><script type=\"x\">var v=1;</script>"
    "<style>.m{}</style></head><body><h1>' || lang || '</h1><p>' || "
    "replace(replace(text, 'table', '<b>table</b>'), "
    "'data', 'data &amp; more') || "
    "'</p><br><div>footer &copy; 2026 &#8212; fin</div>"
    "<!-- hidden --></body></html>'"
)

#: deterministic multi-line text: literal word→newline replaces apply
#: identically (left-to-right, non-overlapping) in both engines
_LINES_EXPR = "replace(replace(text, ' the ', chr(10)), ' a ', chr(10))"

#: deterministic accent injection for the mojibake round trip — the
#: em-dash replace runs FIRST ('á' would break the ' spark ' match),
#: covering 2-byte (á) and 3-byte (—) UTF-8 sequences
_CLEAN_EXPR = (
    "CASE WHEN lang IN ('es', 'de') THEN "
    "replace(replace(text, ' spark ', ' — '), 'a', 'á') "
    "ELSE text END"
)

_MIN_WORDS = 5


@register(
    "q198_html_to_text",
    oracle=f"""
    WITH h AS (SELECT doc_id, {_HTML_EXPR} AS h FROM documents)
    SELECT doc_id,
           {html_to_text_sql('h')} AS txt,
           CAST(length({html_to_text_sql('h')}) AS BIGINT) AS n_chars
    FROM h ORDER BY doc_id
    """,
    tags=("extraction", "text", "llm-pipeline"),
)
def q198_html_to_text(spark, sf_dir):
    """Markup-stripped text through the real extraction chain: drop
    script/style/head/comment blocks, break on block-level tags,
    strip the rest, decode entities (amp-last single-decode order),
    collapse whitespace. Whole-stage-codegen'd JVM regexp chain — a
    narrow map over the scan, no shuffle, no Python (the purity
    contract is test-pinned at tests/test_extract.py).

    Scale shape: at 100 TB this is the classic CPU-bound narrow stage;
    every byte is touched exactly once per pattern inside codegen, and
    Catalyst fuses the whole chain into one stage with the scan."""
    d = t(spark, sf_dir, "documents")
    txt = html_to_text(F.expr(_HTML_EXPR))
    return (d.select("doc_id", txt.alias("txt"))
            .withColumn("n_chars", F.length("txt").cast("bigint"))
            .orderBy("doc_id"))


@register(
    "q199_main_content",
    oracle=f"""
    WITH src AS (SELECT doc_id, {_LINES_EXPR} AS s FROM documents),
    l AS (
      SELECT doc_id,
             unnest(string_split(s, chr(10))) AS ln,
             unnest(generate_series(1, len(string_split(s, chr(10)))))
               AS i
      FROM src
    ),
    w AS (
      SELECT doc_id, ln, i,
             len(regexp_extract_all(ln, '[^ ]+')) AS wc
      FROM l
    ),
    q AS (
      SELECT *, i - row_number() OVER (PARTITION BY doc_id ORDER BY i)
               AS grp
      FROM w WHERE wc >= {_MIN_WORDS}
    ),
    runs AS (
      SELECT doc_id, grp, sum(wc) AS score, min(i) AS start_i,
             string_agg(ln, chr(10) ORDER BY i) AS content,
             count(*) AS n_kept
      FROM q GROUP BY doc_id, grp
    ),
    best AS (
      SELECT doc_id, content, n_kept,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, start_i) AS rn
      FROM runs
    ),
    tot AS (SELECT doc_id, count(*) AS n_total FROM w GROUP BY doc_id)
    SELECT t.doc_id,
           coalesce(b.content, '') AS content,
           CAST(coalesce(b.n_kept, 0) AS INT) AS n_lines_kept,
           CAST(t.n_total AS INT) AS n_lines_total
    FROM tot t
    LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
    ORDER BY doc_id
    """,
    tags=("extraction", "text", "llm-pipeline"),
)
def q199_main_content(spark, sf_dir):
    """Boilerplate removal by line-density (simplified Kohlschütter):
    keep the densest maximal run of lines with ≥5 words — short-line
    navigation/footer noise drops out. One Arrow-batched mapInPandas
    pass at document grain (per-line run state is the honest Python
    case); the oracle replays the rule as gaps-and-islands SQL with
    Python-``max`` tie semantics (first maximal run wins).

    Scale shape: zero shuffle before the output sort — each document
    is scored inside the task that scanned it."""
    d = t(spark, sf_dir, "documents")
    src = d.select("doc_id", F.expr(_LINES_EXPR).alias("text"))
    out = main_content(src, id_col="doc_id", text_col="text",
                       min_words=_MIN_WORDS)
    return out.orderBy("doc_id")


@register(
    "q200_fix_mojibake",
    oracle=f"""
    WITH c AS (SELECT doc_id, text, {_CLEAN_EXPR} AS clean
               FROM documents)
    SELECT doc_id,
           clean AS fixed,
           clean <> text AS was_repaired,
           CAST(length(clean) AS BIGINT) AS n_chars
    FROM c ORDER BY doc_id
    """,
    tags=("extraction", "text", "llm-pipeline"),
)
def q200_fix_mojibake(spark, sf_dir):
    """Double-encoding repair proven by exact inversion: the engine
    BREAKS deterministic accented text (its UTF-8 bytes re-read as
    Latin-1 — 'á'→'Ã¡', '—'→'â€”') and ``fix_mojibake`` must restore
    it byte-for-byte; ASCII rows pass through the guards untouched.
    The oracle never runs the repair — it returns the clean text, so
    any false repair, guard miss or partial decode breaks the hash.

    Pure JVM encode/decode/when expressions; narrow, codegen'd, no
    shuffle (same scale shape as q198)."""
    d = t(spark, sf_dir, "documents")
    clean = F.expr(_CLEAN_EXPR)
    broken = F.decode(F.encode(clean, "UTF-8"), "ISO-8859-1")
    fixed = fix_mojibake(broken)
    return (d.select(
                "doc_id",
                fixed.alias("fixed"),
                (fixed != F.col("text")).alias("was_repaired"),
                F.length(fixed).cast("bigint").alias("n_chars"))
            .orderBy("doc_id"))
