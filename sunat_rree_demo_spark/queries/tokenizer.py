"""Tokenizer-training queries: distributed BPE merge mining over the
documents corpus. The operators a training-data pipeline runs to learn
a subword vocabulary before token counting / packing (no reference
counterpart — driver mandate extension, like the rest of the LLM
family)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sunat_rree_demo_spark.operators.text import bpe_merge_rounds
from sunat_rree_demo_spark.queries.base import register, t

#: number of BPE training rounds mined by q126.
BPE_ROUNDS = 3

#: the double-space symbol separator shared with the oracle (see
#: operators.text.bpe_merge_rounds for why two spaces).
_SEP = "  "


def _round_ctes(r: int) -> str:
    """One BPE round as SQL: pair counts over v{r-1}, argmax m{r},
    merged vocab v{r}."""
    return f"""
    p{r} AS (
      SELECT sym[i] AS l, sym[i + 1] AS r, CAST(sum(c) AS BIGINT) AS n
      FROM (SELECT string_split(trim(s), '{_SEP}') AS sym, c FROM v{r - 1}) t,
           unnest(range(1, len(sym))) AS u(i)
      GROUP BY 1, 2
    ),
    m{r} AS (SELECT l, r, n FROM p{r} ORDER BY n DESC, l, r LIMIT 1),
    v{r} AS (
      SELECT w, replace(s, ' ' || l || '{_SEP}' || r || ' ',
                        ' ' || l || r || ' ') AS s, c
      FROM v{r - 1}, m{r}
    )"""


#: shared SQL prefix: corpus → word counts → spaced vocab → the merge
#: round CTEs (v0..v{BPE_ROUNDS}, m1..m{BPE_ROUNDS}); `w` rides every
#: vocab CTE so the apply query (q137) can join the final vocabulary.
_BPE_PREFIX = (
    """
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents
    ),
    wc AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1),
    v0 AS (
      SELECT w, '"""
    + _SEP
    + r"""' || regexp_replace(w, '(.)', '\1"""
    + _SEP
    + """', 'g') AS s, c FROM wc
    ),"""
    + ",".join(_round_ctes(r) for r in range(1, BPE_ROUNDS + 1))
)

_BPE_SQL = (
    _BPE_PREFIX
    + "\n    "
    + "\n    UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_round, l AS left_sym,"
        f" r AS right_sym, l || r AS merged, n AS pair_count FROM m{r}"
        for r in range(1, BPE_ROUNDS + 1))
    + "\n    ORDER BY merge_round"
)


# --------------------------------------------------------------------- q126
@register(
    "q126_bpe_merges",
    oracle=_BPE_SQL,
    tags=("tokenizer", "bpe"),
)
def q126_bpe_merges(spark, sf_dir):
    """First three BPE merges learned from the corpus (Sennrich et al.
    2016): per round, the most frequent adjacent symbol pair across the
    word-frequency vocabulary, merged leftmost-first before the next
    round counts. The oracle replays the identical double-space
    replace() scheme in SQL, so argmax ties, overlap resolution, and
    merge application are all hash-checked, not just the counts.

    Scale: corpus reduces once to vocab; rounds are vocab-grain
    (see operators.text.bpe_merge_rounds)."""
    d = t(spark, sf_dir, "documents")
    return bpe_merge_rounds(d, "doc_id", "text", rounds=BPE_ROUNDS)


_APPLY_SQL = (
    _BPE_PREFIX
    + f""",
    vocab AS (
      SELECT w, CAST(len(string_split(trim(s), '{_SEP}')) AS BIGINT)
               AS n_sym
      FROM v{BPE_ROUNDS}
    ),
    tk AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(length(w)) AS BIGINT) AS n_chars,
           CAST(sum(n_sym) AS BIGINT) AS n_subwords,
           CASE WHEN sum(length(w)) > 0 THEN
             CAST((2 * 10000 * sum(n_sym) + sum(length(w)))
                  // (2 * sum(length(w))) AS DOUBLE) / 10000.0
           ELSE 0.0 END AS compression
    FROM tk JOIN vocab USING (w)
    GROUP BY doc_id
    ORDER BY doc_id
    """
)


# --------------------------------------------------------------------- q137
@register(
    "q137_bpe_apply",
    oracle=_APPLY_SQL,
    tags=("tokenizer", "bpe", "apply"),
)
def q137_bpe_apply(spark, sf_dir):
    """Apply q126's learned merges to the whole corpus: per doc, word /
    char / subword counts and the 4dp half-up subwords-per-char
    compression — train (q126) and apply under ONE shared merge loop,
    the way a real tokenizer caches word→pieces at vocab grain and
    joins docs against it. The oracle replays the identical chained-CTE
    pipeline and per-doc aggregation."""
    from sunat_rree_demo_spark.operators.text import bpe_apply

    d = t(spark, sf_dir, "documents")
    return bpe_apply(d, "doc_id", "text", BPE_ROUNDS).orderBy("doc_id")


# --------------------------------------------------------------------- q174
_MM_TOPK = 64
_MM_MAXLEN = 6


@register(
    "q174_maxmatch_pieces",
    memoize=False,  # vocab aggregation + bounded collect run per rep
    oracle=f"""
    WITH RECURSIVE
    words AS (
      SELECT w, count(*) AS c FROM (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents) GROUP BY w),
    chars AS (
      SELECT DISTINCT unnest(list_transform(range(1, length(w) + 1),
                             i -> substring(w, i, 1))) AS p
      FROM words),
    subs AS (
      SELECT unnest(flatten(list_transform(range(2, {_MM_MAXLEN} + 1),
               L -> list_transform(range(1, length(w) - L + 2),
                                   i -> substring(w, i, L))))) AS p,
             c
      FROM words),
    top AS (
      SELECT p FROM (
        SELECT p, sum(c) AS n FROM subs GROUP BY p
        ORDER BY n DESC, p LIMIT {_MM_TOPK})),
    vocab AS (SELECT p FROM chars UNION SELECT p FROM top),
    jump AS (
      SELECT w, pos, CAST(max(length(p)) AS BIGINT) AS step FROM (
        SELECT words.w, g.pos, v.p
        FROM words,
             unnest(range(1, length(words.w) + 1)) AS g(pos),
             vocab v
        WHERE substring(words.w, g.pos, length(v.p)) = v.p)
      GROUP BY w, pos),
    walk(w, pos) AS (
      SELECT w, CAST(1 AS BIGINT) FROM words
      UNION ALL
      SELECT j.w, k.pos + j.step FROM walk k
      JOIN jump j ON j.w = k.w AND j.pos = k.pos),
    pieces AS (SELECT w, count(*) - 1 AS n_pieces FROM walk GROUP BY w),
    tk AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents),
    agg AS (
      SELECT doc_id,
             count(*) AS n_words,
             CAST(sum(length(w)) AS BIGINT) AS n_chars,
             CAST(sum(n_pieces) AS BIGINT) AS n_pieces
      FROM tk JOIN pieces USING (w)
      GROUP BY doc_id)
    SELECT doc_id, n_words, n_chars, n_pieces,
           CAST((2 * 10000 * n_pieces + n_words) // (2 * n_words)
                AS DOUBLE) / 10000.0 AS pieces_per_word
    FROM agg ORDER BY doc_id
    """,
    tags=("tokenizer", "wordpiece"),
)
def q174_maxmatch_pieces(spark, sf_dir):
    """WordPiece-style greedy longest-match tokenization
    (operators.text.maxmatch_apply): vocabulary = the corpus alphabet
    plus the 64 most frequent substrings of length 2-6 (ties
    lexicographic), segmentation = MaxMatch left-to-right. Per doc:
    word/char/piece counts and the half-up 4dp pieces-per-word — the
    fertility metric tokenizer choices are judged by.

    The oracle is fully independent: it rebuilds the vocabulary in
    SQL, precomputes a (word, position) → longest-piece jump table,
    and FOLLOWS it with a recursive CTE — the same greedy walk the
    Python closure takes, so a single off-by-one in either engine's
    longest-match breaks the hash. Spark-side the walk runs once per
    DISTINCT word (vocab-grain mapInPandas); the corpus is never
    segmented row by row."""
    from sunat_rree_demo_spark.operators.text import maxmatch_apply

    d = t(spark, sf_dir, "documents")
    return (maxmatch_apply(d, "doc_id", "text",
                           top_k=_MM_TOPK, max_len=_MM_MAXLEN)
            .orderBy("doc_id"))
