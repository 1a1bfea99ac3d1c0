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
