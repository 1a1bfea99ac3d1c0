"""Unit tests for the session-4 retrieval/tokenizer additions: BPE
merge mining (hand-computed corpus), chunk-dedup rewrite invariants,
hard-negative label constraint, and the skyline window plan vs a
brute-force dominance check — independent of the oracle-parity sweep,
which also covers q126-q131."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# --------------------------------------------------------------- BPE merges
def test_bpe_merges_hand_computed(spark):
    """Corpus 'aaab aaab ab': pairs of round 1 (weighted by word freq):
    (a,a)x2 per 'aaab' occurrence = 4, (a,b) = 2+1 = 3 → merge aa.
    Round 2 over {'  aa  a  b  'x2, '  a  b  '}: (aa,a)=2, (a,b)=3
    → merge ab. Round 3 over {'  aa  ab  'x2, '  ab  '}: (aa,ab)=2."""
    from sunat_rree_demo_spark.operators.text import bpe_merge_rounds

    d = _docs(spark, [(1, "aaab aaab"), (2, "ab")])
    got = [tuple(r) for r in
           bpe_merge_rounds(d, "doc_id", "text", rounds=3).collect()]
    assert got == [
        (1, "a", "a", "aa", 4),
        (2, "a", "b", "ab", 3),
        (3, "aa", "ab", "aaab", 2),
    ]


def test_bpe_overlap_resolves_leftmost_first(spark):
    """'aaa': round-1 pairs (a,a)x2 → merge (a,a) with count 2; the
    merge applies leftmost-first, so round 2 sees ['aa', 'a'], i.e.
    pair (aa, a) — NOT (a, aa)."""
    from sunat_rree_demo_spark.operators.text import bpe_merge_rounds

    d = _docs(spark, [(1, "aaa")])
    got = [tuple(r) for r in
           bpe_merge_rounds(d, "doc_id", "text", rounds=2).collect()]
    assert got[0] == (1, "a", "a", "aa", 2)
    assert got[1] == (2, "aa", "a", "aaa", 1)


# ------------------------------------------------------- chunk-dedup rewrite
def test_chunk_rewrite_no_duplicate_chunks_left(spark):
    """After the rewrite, re-chunking the surviving text at the same
    grain yields globally UNIQUE chunks (the Lee et al. postcondition);
    the tail (<n tokens) is always kept."""
    from sunat_rree_demo_spark.operators.dedup import chunk_dedup_rewrite

    n = 4
    boiler = "w x y z"  # one exact 4-token chunk shared by all docs
    rows = [(1, f"{boiler} a b c d tail1"),
            (2, f"{boiler} e f g h"),
            (3, f"{boiler} {boiler} short")]
    out = {r["doc_id"]: r for r in
           chunk_dedup_rewrite(_docs(spark, rows), "doc_id", "text", n)
           .collect()}
    # doc 1 keeps its first-occurrence boilerplate + own chunk + tail
    assert out[1]["new_text"] == "w x y z a b c d tail1"
    assert (out[1]["n_chunks"], out[1]["n_removed"]) == (2, 0)
    # docs 2/3 lose the boilerplate (doc 1 owns it); doc 3 loses BOTH
    # copies (cross-doc and within-doc occurrences fall to one rule)
    assert out[2]["new_text"] == "e f g h"
    assert (out[2]["n_chunks"], out[2]["n_removed"]) == (2, 1)
    assert out[3]["new_text"] == "short"
    assert (out[3]["n_chunks"], out[3]["n_removed"]) == (2, 2)


def test_chunk_rewrite_short_doc_passthrough(spark):
    from sunat_rree_demo_spark.operators.dedup import chunk_dedup_rewrite

    rows = [(1, "a b"), (2, "c")]
    out = {r["doc_id"]: r for r in
           chunk_dedup_rewrite(_docs(spark, rows), "doc_id", "text", 4)
           .collect()}
    assert out[1]["new_text"] == "a b" and out[1]["n_chunks"] == 0
    assert out[2]["new_text"] == "c" and out[2]["n_removed"] == 0


# ----------------------------------------------------------- hard negatives
def test_hard_negatives_exclude_query_label(spark):
    """Every mined negative has a label different from its query's, and
    ranking is by cosine — the nearest OTHER-label vector wins even when
    same-label vectors are closer."""
    from sunat_rree_demo_spark.operators.similarity import hard_negative_topk

    rows = [
        (0, [1.0, 0.0], 7),   # query
        (1, [0.99, 0.14], 7),  # same label, closest overall — excluded
        (2, [0.9, 0.44], 3),   # best different-label
        (3, [0.0, 1.0], 3),
    ]
    e = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int")
    qs = e.filter(F.col("vec_id") == 0)
    got = hard_negative_topk(e, qs, k=2).orderBy("rank").collect()
    assert [r["n_id"] for r in got] == [2, 3]
    labels = dict((r[0], r[2]) for r in rows)
    assert all(labels[r["n_id"]] != 7 for r in got)


# ------------------------------------------------------------------ skyline
def test_pareto_window_plan_matches_bruteforce(spark):
    """The PRODUCTION sweep (operators.analytics.pareto_frontier_2d —
    the exact expression q131 runs) equals the quadratic dominance
    definition on a case with price ties, size ties, and duplicate
    points."""
    from sunat_rree_demo_spark.operators.analytics import pareto_frontier_2d

    pts = [(1, 100, 5), (2, 100, 5), (3, 100, 7), (4, 90, 3),
           (5, 120, 9), (6, 80, 3), (7, 80, 2), (8, 130, 9)]
    df = spark.createDataFrame(
        [("B", k, c, s) for k, c, s in pts],
        "p_brand string, p_partkey bigint, price_c bigint, p_size int")

    got = sorted(r["p_partkey"] for r in
                 pareto_frontier_2d(df, "p_brand", "price_c", "p_size")
                 .collect())

    def dominates(a, b):
        return (a[1] <= b[1] and a[2] >= b[2]
                and (a[1] < b[1] or a[2] > b[2]))

    want = sorted(k for (k, c, s) in pts
                  if not any(dominates(o, (k, c, s))
                             for o in pts if o[0] != k))
    assert got == want


# ---------------------------------------------------- LM surprisal / OOV
def test_bigram_surprisal_short_docs_zero(spark):
    """Docs with < 2 tokens surface with n_bigrams=0 and surprisal 0;
    a repeated bigram is LESS surprising than a unique one."""
    from sunat_rree_demo_spark.operators.text import bigram_surprisal

    rows = [(1, "x"), (2, "a b a b a b"), (3, "q r")]
    out = {r["doc_id"]: r for r in
           bigram_surprisal(_docs(spark, rows), "doc_id", "text").collect()}
    assert (out[1]["n_bigrams"], out[1]["avg_surprisal"]) == (0, 0.0)
    assert out[2]["n_bigrams"] == 5
    assert out[3]["n_bigrams"] == 1
    # 'a b' occurs 3x, 'q r' once -> doc 2's mean surprisal is lower
    assert out[2]["avg_surprisal"] < out[3]["avg_surprisal"]


def test_oov_rate_against_tiny_vocab(spark):
    from sunat_rree_demo_spark.operators.text import oov_stats

    # vocab_size=2 -> vocab = {'a', 'b'} (counts 3/3 vs z's 2)
    rows = [(1, "a a a b z"), (2, "b b z")]
    out = {r["doc_id"]: r for r in
           oov_stats(_docs(spark, rows), "doc_id", "text", 2).collect()}
    assert (out[1]["n_tokens"], out[1]["n_oov"]) == (5, 1)
    assert out[1]["oov_rate"] == 0.2
    assert (out[2]["n_tokens"], out[2]["n_oov"]) == (3, 1)
    assert out[2]["oov_rate"] == 0.3333


# --------------------------------------------------------- CMS / PQ / paths
def test_cms_estimate_never_underestimates(spark):
    """The count-min guarantee: est >= exact for every probe (at sf0.001
    via the registered query)."""
    from sunat_rree_demo_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = REGISTRY["q135_count_min_sketch"].fn(spark, SF_SMOKE).collect()
    assert rows
    assert all(r["overestimate"] >= 0 for r in rows)
    assert all(r["cms_est"] >= r["n_exact"] for r in rows)


def test_pq_codes_reconstruct_seeds_exactly(spark):
    """Codebook seed vectors (vec_id < 8) must encode to THEMSELVES in
    every subspace with zero reconstruction error."""
    from sunat_rree_demo_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = {r["vec_id"]: r for r in
            REGISTRY["q134_pq_encode"].fn(spark, SF_SMOKE).collect()}
    for vid in range(8):
        r = rows[vid]
        assert [r[f"code_{m}"] for m in range(4)] == [vid] * 4
        assert r["err_micro"] == 0


def test_bpe_zero_rounds_returns_empty_merges(spark):
    """rounds=0 must yield an empty merge table, not crash."""
    from sunat_rree_demo_spark.operators.text import bpe_merge_rounds

    d = _docs(spark, [(1, "ab ab")])
    out = bpe_merge_rounds(d, "doc_id", "text", rounds=0)
    assert out.columns == ["merge_round", "left_sym", "right_sym",
                           "merged", "pair_count"]
    assert out.count() == 0


def test_psi_baseline_year_is_zero(spark):
    """PSI of the baseline year against itself must be exactly 0 (every
    per-bin term is (p-p)*ln(1) -> 0 before quantization)."""
    from sunat_rree_demo_spark.queries import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = {r["year"]: r for r in
            REGISTRY["q140_psi_drift"].fn(spark, SF_SMOKE).collect()}
    base = min(rows)
    assert rows[base]["psi_u"] == 0
    assert all(r["psi_u"] >= 0 for r in rows.values())
