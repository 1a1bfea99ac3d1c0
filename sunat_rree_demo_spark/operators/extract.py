"""Markup → text extraction (the web-crawl curation stage before any
quality/dedup pass): tag stripping and entity decoding as PURE JVM
expressions (whole-stage-codegen'd regexp_replace chains — no Python in
the hot path), plus an Arrow-batched main-content selector for the
boilerplate-removal step that genuinely needs per-line state.

Every regex is RE2-compatible (no backreferences, no lookbehind) so a
DuckDB oracle twin can run the SAME patterns when a q-slot opens
(r7 window) — the repo's cross-engine regex discipline.

Scale: ``html_to_text`` is a narrow map over the scan (no shuffle, no
UDF); ``main_content`` is one mapInPandas pass at document grain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: paired-container content to drop entirely (scripts, styles, head):
#: separate alternatives per tag — RE2 has no backreferences, so the
#: usual <(script|style)>.*?</\1> form is off the table by design.
_DROP_BLOCKS = [
    r"(?is)<script[^>]*>.*?</script>",
    r"(?is)<style[^>]*>.*?</style>",
    r"(?is)<head[^>]*>.*?</head>",
    r"(?is)<!--.*?-->",
]

#: minimal entity table (the ones that dominate real crawls); numeric
#: entities decode separately below
_ENTITIES = {
    "&amp;": "&", "&lt;": "<", "&gt;": ">",
    "&quot;": '"', "&#39;": "'", "&apos;": "'", "&nbsp;": " ",
    "&copy;": "\u00a9", "&reg;": "\u00ae", "&mdash;": "\u2014",
    "&ndash;": "\u2013", "&hellip;": "\u2026",
    "&rsquo;": "\u2019", "&lsquo;": "\u2018",
    "&rdquo;": "\u201d", "&ldquo;": "\u201c",
}


#: the FULL ordered extraction pipeline, shared verbatim by the Column
#: chain and the DuckDB SQL generator (review finding r7: only the two
#: table loops were generated before; the other ten steps were
#: hand-duplicated literals — an edit to one side silently broke the
#: q198 twin). (kind, pattern-or-literal, replacement); decode order
#: matters: '&amp;' must go LAST, or double-escaped entities
#: double-decode — '&amp;lt;' means the literal text '&lt;', not '<'
#: (html.parser decodes in ONE pass; a re-scanning replace chain only
#: matches that if the '&' materializes after every other entity rule
#: has run — review finding r6). The final regex exists because trim()
#: strips spaces only, not edge newlines.
_H2T_STEPS: tuple[tuple[str, str, str], ...] = tuple(
    [("re", pat, " ") for pat in _DROP_BLOCKS]
    + [("re", r"(?i)<br[^>]*>|</p>|</div>|</li>|</tr>", "\n"),
       ("re", r"(?s)<[^>]+>", " ")]
    + [("lit", ent, ch) for ent, ch in _ENTITIES.items()
       if ent != "&amp;"]
    + [("re", r"&#[0-9]{1,7};", " "),           # decimal code points
       ("re", r"&#x[0-9a-fA-F]{1,6};", " "),    # hex code points
       ("lit", "&amp;", "&"),
       ("re", r"[ \t\r\f]+", " "),
       ("re", r" ?\n ?", "\n"),
       ("re", r"\n{2,}", "\n"),
       ("re", r"^\n+|\n+$", "")]
)


def html_to_text(col: Column) -> Column:
    """Markup-stripped text: drop script/style/head/comment blocks,
    turn block-level tag boundaries into spaces, strip remaining tags,
    decode common + numeric character entities, collapse whitespace —
    ``_H2T_STEPS`` applied in order as JVM ``regexp_replace``/
    ``replace`` expressions; stays inside codegen, no Python, no
    shuffle."""
    out = col
    for kind, pat, rep in _H2T_STEPS:
        if kind == "re":
            out = F.regexp_replace(out, pat, rep)
        else:
            out = F.replace(out, F.lit(pat), F.lit(rep))
    return F.trim(out)


def main_content(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 min_words: int = 5) -> DataFrame:
    """Boilerplate removal by LINE-DENSITY selection (the Kohlschütter
    boilerpipe heuristic, simplified): within each already-stripped
    document, keep maximal runs of lines whose word count ≥
    ``min_words``, preferring the densest run — navigation menus,
    cookie banners and footers are short-line noise; body prose is a
    long dense run. Returns (id, content, n_lines_kept, n_lines_total).

    Per-document Python with per-line state — the honest mapInPandas
    case (a window over lines per doc would shuffle line grain for no
    reason); Arrow-batched, zero shuffle.

    WORD RULE: a word is a maximal run of non-SPACE characters
    (``ln.split(" ")`` with empties dropped) — deliberately narrower
    than Python's ``str.split()``, whose Unicode-whitespace set
    (tabs, \x0b, NBSP, …) has no exact RE2/DuckDB twin; the q199
    oracle's ``regexp_extract_all(ln, '[^ ]+')`` matches this rule
    byte-for-byte (review finding r7: the two rules diverged on tabs,
    latent until a non-space-separated corpus arrived)."""
    import pandas as pd

    def _wc(ln: str) -> int:
        return sum(1 for w in ln.split(" ") if w)

    def pick(it):
        for pdf in it:
            out = []
            for did, s in zip(pdf[id_col], pdf[text_col]):
                lines = (s or "").split("\n")
                runs, cur = [], []
                for ln in lines:
                    if _wc(ln) >= min_words:
                        cur.append(ln)
                    elif cur:
                        runs.append(cur)
                        cur = []
                if cur:
                    runs.append(cur)
                best = max(runs, key=lambda r: sum(_wc(x) for x in r),
                           default=[])
                out.append((did, "\n".join(best), len(best), len(lines)))
            yield pd.DataFrame(out, columns=[
                id_col, "content", "n_lines_kept", "n_lines_total"])

    return docs.select(id_col, text_col).mapInPandas(
        pick, schema=f"{id_col} long, content string, "
                     "n_lines_kept int, n_lines_total int")


def fix_mojibake(col: Column) -> Column:
    """Repair the classic double-encoding corruption ("Ã©" for "é"):
    text that was UTF-8 encoded, then mis-decoded as Latin-1, re-reads
    correctly after a Latin-1 round trip — ``decode(encode(s,
    'ISO-8859-1'), 'UTF-8')``, pure JVM expressions. GUARDED: the
    repair is used only when (a) the input shows mojibake lead bytes
    (Â/Ã/â), (b) the Latin-1 bytes are genuinely valid UTF-8
    (``is_valid_utf8`` on the bytes — checked BEFORE any decode
    appears in an evaluated branch, since ANSI decode raises on
    malformed input), and (c) it shortened the string (a genuine
    repair always does; ASCII is a fixed point) — otherwise the
    original passes through untouched, so clean text can never be
    corrupted by the fixer."""
    # ANSI encode RAISES on characters outside Latin-1 (em-dashes,
    # CJK, emoji — routine in mixed crawls), and ANSI decode raises on
    # malformed bytes, so BOTH live strictly inside nested WHEN
    # branches behind their pre-guards; plain & conjunctions are not
    # enough (the optimizer may reorder conjuncts — only CASE WHEN
    # guarantees conditional evaluation). Review finding r6, repro:
    # 'Ã© broken plus — emdash' crashed the unguarded encode.
    mappable_and_broken = col.rlike("[ÂÃâ]") \
        & ~col.rlike("[^\u0000-\u00ff]")
    latin = F.encode(col, "ISO-8859-1")
    repaired = F.decode(latin, "UTF-8")
    return F.when(
        mappable_and_broken,
        F.when(
            F.is_valid_utf8(latin),
            F.when(F.length(repaired) < F.length(col), repaired)
            .otherwise(col)
        ).otherwise(col)
    ).otherwise(col)


def _sql_str(s: str) -> str:
    """A DuckDB single-quoted STANDARD string literal: quotes doubled,
    backslashes left alone (no escape processing outside e'…')."""
    return "'" + s.replace("'", "''") + "'"


def html_to_text_sql(expr: str) -> str:
    """The DuckDB oracle twin of ``html_to_text``: GENERATED from the
    same ``_H2T_STEPS`` table the Column chain iterates — every
    pattern, literal and ordering decision exists in exactly one place,
    so the two engines cannot drift (the q186 'oracle never sees the
    codec' device, applied to markup). ``expr`` is any DuckDB VARCHAR
    expression. Replacement newlines render as e'\\n' escape-string
    literals; patterns pass through as standard literals (DuckDB does
    not escape-process them, RE2 sees the backslashes)."""
    out = expr
    for kind, pat, rep in _H2T_STEPS:
        if kind == "re":
            sql_rep = "e'\\n'" if rep == "\n" else _sql_str(rep)
            out = (f"regexp_replace({out}, {_sql_str(pat)}, "
                   f"{sql_rep}, 'g')")
        else:
            out = f"replace({out}, {_sql_str(pat)}, {_sql_str(rep)})"
    return f"trim({out})"
