"""Text-analysis operators for LLM-data pipelines (SURVEY.md §7.4 /
driver mandate; no reference counterpart — the reference's only text ops
are the X1-X4 scalar family).

All core paths are pure Column expressions (split/array HOFs — JVM-side,
codegen'd); nothing here drops to Python. Token model: whitespace
tokenization via regex split, shared verbatim with the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: tiny deterministic stopword lists for the language-ID heuristic.
EN_STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")
ES_STOPWORDS = ("el", "la", "de", "que", "y", "los", "en")

TOKEN_PATTERN = r"\s+"


def tokens(text: Column) -> Column:
    """Whitespace tokenizer (shared semantics with DuckDB
    ``string_split_regex(trim(x), '\\s+')``)."""
    return F.split(F.trim(text), TOKEN_PATTERN)


def token_count(text: Column) -> Column:
    """Token counting — BIGINT for oracle type parity."""
    return F.size(tokens(text)).cast("bigint")


def unique_token_ratio(tok: Column) -> Column:
    """Lexical diversity: |distinct tokens| / |tokens|."""
    return F.size(F.array_distinct(tok)).cast("double") / F.size(tok).cast("double")


def quality_score(tok: Column, target_len: int = 100) -> Column:
    """Quality scoring: 0..1 blend of lexical diversity and a length
    prior (docs shorter than ``target_len`` tokens are penalized
    linearly). Deterministic, SQL-expressible, trivially extendable with
    punctuation/stopword ratios."""
    diversity = unique_token_ratio(tok)
    length_prior = F.least(F.size(tok).cast("double") / float(target_len), F.lit(1.0))
    return F.round(0.5 * diversity + 0.5 * length_prior, 4)


def lang_id(tok: Column) -> Column:
    """Language-ID heuristic: stopword-overlap vote (n-gram-free variant;
    a real model would be a pandas UDF — this stays JVM-side). Spanish
    wins ties toward 'es' only when no English stopword is present."""
    en = F.arrays_overlap(tok, F.array(*[F.lit(w) for w in EN_STOPWORDS]))
    es = F.arrays_overlap(tok, F.array(*[F.lit(w) for w in ES_STOPWORDS]))
    return (
        F.when(en, F.lit("en"))
        .when(es, F.lit("es"))
        .otherwise(F.lit("unknown"))
    )


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed
    whitespace."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def fingerprint(text: Column) -> Column:
    """Document fingerprint: sha-256 of the normalized text (content-
    addressed identity; the hash both engines share — see also the
    rolling/simhash fingerprints in operators.dedup for near-dup use)."""
    return F.sha2(normalize_text(text), 256)
