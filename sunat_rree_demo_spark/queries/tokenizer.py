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
      SELECT replace(s, ' ' || l || '{_SEP}' || r || ' ',
                     ' ' || l || r || ' ') AS s, c
      FROM v{r - 1}, m{r}
    )"""


_BPE_SQL = (
    """
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents
    ),
    wc AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1),
    v0 AS (
      SELECT '"""
    + _SEP
    + r"""' || regexp_replace(w, '(.)', '\1"""
    + _SEP
    + """', 'g') AS s, c FROM wc
    ),"""
    + ",".join(_round_ctes(r) for r in range(1, BPE_ROUNDS + 1))
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
