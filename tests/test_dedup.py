"""Golden tests: the MinHash and SimHash operators must agree bit-for-bit
with a pure-Python implementation of the same published algorithm
(sha-256-derived base hashes make this engine-independent)."""

from __future__ import annotations

import re

import pytest

from tests.conftest import SF_SMOKE


def py_tokens(text: str) -> list[str]:
    return re.split(r"\s+", text.strip())


def py_shingles(tk: list[str], n: int = 5) -> set[str]:
    return {" ".join(tk[i:i + n]) for i in range(len(tk) - n + 1)}


@pytest.fixture(scope="module")
def docs(spark):
    from sunat_rree_demo_spark.sources.catalog import load_table
    df = load_table(spark, SF_SMOKE, "documents")
    return {r.doc_id: r.text for r in df.select("doc_id", "text").collect()}


def test_minhash_signatures_match_python(spark, docs):
    from sunat_rree_demo_spark.operators.dedup import (
        MERSENNE_P,
        MINHASH_K,
        _minhash_params,
        base_hash_py,
        minhash_signatures,
    )
    from sunat_rree_demo_spark.sources.catalog import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    got = {r["doc_id"]: list(r["sig"])
           for r in minhash_signatures(d, "doc_id", "text").collect()}
    params = _minhash_params()
    checked = 0
    for doc_id, text in list(docs.items())[:50]:
        tk = py_tokens(text)
        sh = py_shingles(tk)
        if not sh:
            continue
        hashes = [base_hash_py(s) for s in sh]
        expected = [min((a * h + b) % MERSENNE_P for h in hashes)
                    for a, b in params]
        assert got[doc_id] == expected, f"doc {doc_id}"
        checked += 1
    assert checked >= 40


def test_simhash_matches_python(spark, docs):
    from sunat_rree_demo_spark.operators.dedup import base_hash_py, simhash
    from sunat_rree_demo_spark.sources.catalog import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    got = {r.doc_id: r.simhash for r in simhash(d, "doc_id", "text").collect()}
    for doc_id, text in list(docs.items())[:50]:
        toks = set(py_tokens(text))
        votes = [0] * 32
        for tok in toks:
            h = base_hash_py(tok)
            for i in range(32):
                votes[i] += 1 if (h >> i) & 1 else -1
        expected = sum(1 << i for i in range(32) if votes[i] > 0)
        assert got[doc_id] == expected, f"doc {doc_id}"


def test_minhash_lsh_estimates_jaccard(spark):
    """LSH candidates' estimated Jaccard must be close to the exact
    n-gram Jaccard for the same pairs (MinHash is an unbiased
    estimator; k=32 → tolerance is loose but bounded)."""
    from sunat_rree_demo_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from sunat_rree_demo_spark.sources.catalog import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    exact = {(r.id1, r.id2): r.jaccard
             for r in ngram_jaccard_pairs(d, "doc_id", "text",
                                          threshold=0.0).collect()}
    est = minhash_lsh_pairs(d, "doc_id", "text", threshold=0.5).collect()
    assert est, "expected some high-similarity candidates at sf0.001"
    for r in est:
        true_j = exact.get((r.id1, r.id2), 0.0)
        assert abs(r.jaccard_est - true_j) < 0.35, (r.id1, r.id2, r.jaccard_est, true_j)


def test_exact_dedup_keeps_min_id(spark):
    from pyspark.sql import Row

    from sunat_rree_demo_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame([
        Row(doc_id=3, text="hello world"),
        Row(doc_id=1, text="hello world"),
        Row(doc_id=2, text="different"),
    ])
    kept = sorted(r.doc_id for r in exact_dedup(df, "text", "doc_id").collect())
    assert kept == [1, 2]


def test_jaccard_df_cutoff_identical_on_testdata(spark):
    """The default stop-shingle guard (df > 256) provably drops nothing
    on committed testdata (max shingle df = 4 at sf0.1), so guarded and
    unguarded runs must be identical — the oracle-parity precondition."""
    from sunat_rree_demo_spark.operators.dedup import ngram_jaccard_pairs
    from sunat_rree_demo_spark.sources.catalog import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    guarded = {(r.id1, r.id2): r.jaccard
               for r in ngram_jaccard_pairs(d, "doc_id", "text").collect()}
    unguarded = {(r.id1, r.id2): r.jaccard
                 for r in ngram_jaccard_pairs(
                     d, "doc_id", "text", max_shingle_df=None).collect()}
    assert guarded == unguarded and guarded


def test_jaccard_df_cutoff_bounds_hot_shingle(spark, caplog):
    """A boilerplate shingle shared by every doc must be dropped (and
    logged) under a low cutoff: near-dup pairs driven only by the hot
    shingle disappear, bounding the f^2 self-join fan-out."""
    import logging

    from pyspark.sql import Row

    from sunat_rree_demo_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "all rights reserved by the publisher"
    rows = [Row(doc_id=i, text=f"{boiler} unique tail {i} a b c d e")
            for i in range(12)]
    df = spark.createDataFrame(rows)

    unguarded = ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.1,
                                    max_shingle_df=None).collect()
    assert unguarded, "hot shingles alone should clear the 0.1 threshold"
    with caplog.at_level(logging.WARNING,
                         logger="sunat_rree_demo_spark.operators.dedup"):
        guarded = ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.1,
                                      max_shingle_df=4).collect()
    assert not guarded, "boilerplate-only pairs must vanish under the guard"
    assert any("stop-shingle" in r.message for r in caplog.records)


def test_signatures_from_arrays_match_minhash_signatures(spark):
    """The array-input signature path (used by verified_near_dup_pairs
    to shingle the corpus once) must be bit-equal to the text-input
    minhash_signatures it replaces."""
    from sunat_rree_demo_spark.operators.dedup import (
        _signatures_from_shingle_arrays,
        doc_shingle_arrays,
        minhash_signatures,
    )
    from sunat_rree_demo_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    d = load_table(spark, SF_SMOKE, "documents")
    want = {r.doc_id: list(r.sig)
            for r in minhash_signatures(d, "doc_id", "text").collect()}
    arr = doc_shingle_arrays(d, "doc_id", "text")
    got = {r.doc_id: list(r.sig)
           for r in _signatures_from_shingle_arrays(arr, "doc_id").collect()}
    assert got == want and want


def test_verified_pairs_cand_memo_equivalence(spark):
    """verified_near_dup_pairs with a pre-materialized candidate table
    (the r11 cdmemo serving path) must emit the identical pair set as
    the in-line generation: signatures and band buckets are per-doc
    properties, so the candidate set is a pure function of the arrays."""
    from sunat_rree_demo_spark.operators.dedup import (
        doc_shingle_arrays,
        lsh_candidate_pairs_from_arrays,
        verified_near_dup_pairs,
    )
    from sunat_rree_demo_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    d = load_table(spark, SF_SMOKE, "documents")
    arr = doc_shingle_arrays(d, "doc_id", "text").localCheckpoint()
    inline = sorted(
        map(tuple, verified_near_dup_pairs(
            d, "doc_id", "text", threshold=0.3, arr=arr).collect()))
    cand = lsh_candidate_pairs_from_arrays(arr, "doc_id").localCheckpoint()
    served = sorted(
        map(tuple, verified_near_dup_pairs(
            d, "doc_id", "text", threshold=0.3, arr=arr,
            cand=cand).collect()))
    assert served == inline and inline


def test_bloom_decontaminate_superset_of_exact(spark):
    """Bloom-filter decontamination must flag every exactly-contaminated
    doc (no false negatives) and keep its false-positive surplus under
    a loose bound; overlap counts agree on true positives."""
    from sunat_rree_demo_spark.operators.dedup import (
        contamination_overlap,
        contamination_overlap_bloom,
    )
    from sunat_rree_demo_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    d = load_table(spark, SF_SMOKE, "documents")
    probe = d.filter("doc_id % 17 = 0").selectExpr("doc_id + 100000 AS doc_id",
                                                   "text")
    exact = {r["doc_id"]: r["n_overlap"]
             for r in contamination_overlap(d, probe, "doc_id", "text",
                                            n=3).collect()}
    bloom = {r["doc_id"]: r["n_overlap"]
             for r in contamination_overlap_bloom(
                 d, probe, "doc_id", "text", n=3,
                 expected_items=1 << 16).collect()}
    assert set(exact) <= set(bloom)
    for k, v in exact.items():
        assert bloom[k] >= v  # fp can only add candidate overlaps
    # surplus bounded: with fpp=1% the candidate set stays close
    assert len(bloom) <= max(2 * len(exact), len(exact) + 25), (
        len(exact), len(bloom))


def test_upsert_partitioned_latest_wins(spark, tmp_path):
    """CDC MERGE sink: latest-(ts, update-wins) per key; untouched
    partitions' files are not rewritten; replay is idempotent."""
    import os

    from pyspark.sql import Row, functions as F

    from sunat_rree_demo_spark.sources.sinks import upsert_partitioned

    path = str(tmp_path / "state")
    base = spark.createDataFrame([
        Row(user_id=1, day="2024-01-01", value=10.0, ts=100),
        Row(user_id=2, day="2024-01-01", value=20.0, ts=100),
        Row(user_id=3, day="2024-01-02", value=30.0, ts=100),
    ])
    # bootstrap through the same code path (no base yet)
    upsert_partitioned(spark, base, path, ["user_id", "day"], "ts",
                       "day")
    day2_files = {f: os.path.getmtime(f"{path}/day=2024-01-02/{f}")
                  for f in os.listdir(f"{path}/day=2024-01-02")}

    updates = spark.createDataFrame([
        Row(user_id=1, day="2024-01-01", value=11.0, ts=200),  # newer: wins
        Row(user_id=2, day="2024-01-01", value=99.0, ts=50),   # older: loses
        Row(user_id=4, day="2024-01-01", value=40.0, ts=100),  # new key
    ])
    upsert_partitioned(spark, updates, path, ["user_id", "day"], "ts",
                       "day")
    got = {r["user_id"]: (r["value"], r["ts"])
           for r in spark.read.parquet(path).collect()}
    assert got == {1: (11.0, 200), 2: (20.0, 100),
                   3: (30.0, 100), 4: (40.0, 100)}
    # untouched partition untouched on disk
    assert day2_files == {
        f: os.path.getmtime(f"{path}/day=2024-01-02/{f}")
        for f in os.listdir(f"{path}/day=2024-01-02")}
    # replaying the same batch changes nothing (idempotent merge)
    upsert_partitioned(spark, updates, path, ["user_id", "day"], "ts",
                       "day")
    again = {r["user_id"]: (r["value"], r["ts"])
             for r in spark.read.parquet(path).collect()}
    assert again == got


def test_prefix_filter_pairs_lossless_vs_ground_truth(spark):
    """Prefix filtering must drop NOTHING: at any threshold its output
    equals the exhaustive ground-truth operator filtered to the same
    cut (the lossless-prefix property of Chaudhuri et al. / Bayardo
    et al. the operator relies on)."""
    from sunat_rree_demo_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )
    from sunat_rree_demo_spark.sources.catalog import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    for thr in (0.5, 0.8):
        want = {(r.id1, r.id2, r.jaccard)
                for r in ngram_jaccard_pairs(
                    d, "doc_id", "text", n=5, threshold=thr).collect()}
        got = {(r.id1, r.id2, r.jaccard)
               for r in prefix_filter_jaccard_pairs(
                   d, "doc_id", "text", n=5, threshold=thr).collect()}
        assert got == want
        assert want, f"degenerate test: no pairs at threshold {thr}"


def test_snapshot_diff_classes(spark):
    """All four change classes, including the all-NULL-compare-row
    presence edge that a null-check-based classifier would misread."""
    from pyspark.sql import Row

    from sunat_rree_demo_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame([
        Row(k=1, a=10, b="x"),   # unchanged
        Row(k=2, a=20, b="y"),   # changed (a)
        Row(k=3, a=30, b="z"),   # removed
        Row(k=5, a=None, b=None),  # all-NULL compare, present both sides
        Row(k=6, a=None, b="q"),   # NULL -> value = changed
    ])
    new = spark.createDataFrame([
        Row(k=1, a=10, b="x"),
        Row(k=2, a=21, b="y"),
        Row(k=4, a=40, b="w"),   # added
        Row(k=5, a=None, b=None),
        Row(k=6, a=7, b="q"),
    ])
    got = {r.k: r.change_type
           for r in snapshot_diff(old, new, ["k"], ["a", "b"]).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed",
                   4: "added", 5: "unchanged", 6: "changed"}


def test_containment_catches_excerpt_jaccard_misses(spark):
    """An excerpt fully contained in a much longer doc: containment
    ≈ 1.0 flags it while the Jaccard of the pair is far below any
    sane near-dup threshold — the asymmetric signal q144 exists for."""
    from sunat_rree_demo_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    long_doc = " ".join(f"w{i}" for i in range(200))
    excerpt = " ".join(f"w{i}" for i in range(40, 60))
    docs = spark.createDataFrame(
        [(1, long_doc), (2, excerpt)], "doc_id long, text string")

    got = containment_pairs(docs, "doc_id", "text", n=5,
                            threshold=0.5).collect()
    assert len(got) == 1
    r = got[0]
    # all 16 excerpt shingles appear in the long doc: c21 = 1.0,
    # c12 = 16/196
    assert (r.id1, r.id2) == (1, 2)
    assert r.c21 == 1.0 and r.cmax == 1.0
    assert abs(r.c12 - round(16 / 196, 4)) < 1e-9

    jac = ngram_jaccard_pairs(docs, "doc_id", "text", n=5,
                              threshold=0.3).collect()
    assert jac == []  # J = 16/196 ≈ 0.08 — invisible to Jaccard


def test_simhash_band_recall_guarantee(spark):
    """Pigeonhole contract: every pair within max_hamming ≤ bands−1 of
    each other MUST be emitted (banding is lossless there), checked
    against a brute-force popcount over all fingerprint pairs."""
    from itertools import combinations

    from sunat_rree_demo_spark.operators.dedup import simhash, simhash_pairs

    docs = spark.createDataFrame(
        [(i, f"tok{i % 3} alpha beta gamma delta common{i % 2} x{i}")
         for i in range(12)], "doc_id long, text string")
    fps = {r.doc_id: r.simhash
           for r in simhash(docs, "doc_id", "text", 28).collect()}
    want = {(a, b): bin(fps[a] ^ fps[b]).count("1")
            for a, b in combinations(sorted(fps), 2)
            if bin(fps[a] ^ fps[b]).count("1") <= 3}
    got = {(r.id1, r.id2): r.hamming
           for r in simhash_pairs(docs, "doc_id", "text",
                                  bits=28, bands=4,
                                  max_hamming=3).collect()}
    assert got == want

    import pytest

    with pytest.raises(ValueError):
        simhash_pairs(docs, "doc_id", "text", bits=28, bands=4,
                      max_hamming=4)  # beyond the pigeonhole guarantee


def test_rolling_novelty_copy_scores_zero(spark):
    """A verbatim copy of an earlier doc contributes zero novel
    windows; the original keeps 1.0; a half-copied doc sits between."""
    from sunat_rree_demo_spark.operators.dedup import rolling_novelty

    orig = " ".join(f"w{i}" for i in range(16))
    half = " ".join(f"w{i}" for i in range(8)) + " " + \
        " ".join(f"z{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(1, orig), (2, orig), (3, half)], "doc_id long, text string")
    got = {r.doc_id: r for r in
           rolling_novelty(docs, "doc_id", "text", 8).collect()}
    assert got[1].novelty_frac == 1.0 and got[1].n_novel == 9
    assert got[2].novelty_frac == 0.0 and got[2].n_novel == 0
    # doc 3: 9 windows, only the first (w0..w7) is seen before
    assert got[3].n_windows == 9 and got[3].n_novel == 8


def test_prefix_filter_lossless_on_random_corpora(spark):
    """PPJoin losslessness: prefix_filter_jaccard_pairs must equal the
    exhaustive ngram_jaccard_pairs at the same threshold on seeded
    random corpora engineered with (a) heavy cross-doc overlap so real
    pairs exist and (b) shingle-set sizes that are multiples of 5,
    where IEEE 0.8·n lands epsilon ABOVE the exact integer
    (0.8·35 = 28.000…004) — the case the epsilon-guarded ceilings
    exist for. Covers the length and positional row filters too: any
    over-pruning loses a pair and fails the set equality."""
    import random

    from sunat_rree_demo_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    total_pairs = 0
    for seed in (7, 23):
        rng = random.Random(seed)
        docs, did = [], 0
        for b in range(8):
            # token count n_sh+4 => shingle count n_sh; sizes 35/40/45
            # hit the 0.8·n IEEE boundary (0.8·35 = 28.000…004)
            n_sh = rng.choice((35, 40, 45))
            base = [f"b{seed}_{b}_{j}" for j in range(n_sh + 4)]
            docs.append((did, " ".join(base))); did += 1
            for _ in range(rng.randint(1, 2)):
                # clone with 0-2 substitutions: J spans ~0.6-1.0, so
                # pairs land above, on, and below both thresholds
                var = list(base)
                for _s in range(rng.randint(0, 2)):
                    var[rng.randrange(len(var))] = f"m{seed}_{did}_{_s}"
                docs.append((did, " ".join(var))); did += 1
        df = spark.createDataFrame(docs, "doc_id long, text string")
        for t in (0.5, 0.8):
            want = {(r.id1, r.id2, r.jaccard) for r in
                    ngram_jaccard_pairs(df, "doc_id", "text", n=5,
                                        threshold=t).collect()}
            got = {(r.id1, r.id2, r.jaccard) for r in
                   prefix_filter_jaccard_pairs(df, "doc_id", "text", n=5,
                                               threshold=t).collect()}
            assert got == want, (seed, t, got ^ want)
            total_pairs += len(want)
    assert total_pairs > 0  # non-vacuous: the overlaps made real pairs


def test_winnowing_selection_matches_reference(spark):
    """The W-arm disjunction that implements rightmost-min winnowing
    must equal the direct definition (slide every window, keep its
    rightmost minimum) — checked on docs engineered to hit ties,
    edges, and the mid-sequence case where neither the pure-left nor
    pure-right arm fires alone."""
    import hashlib

    from sunat_rree_demo_spark.queries.dedup import (
        _WIN_N,
        _WIN_W,
        q181_winnowing_fingerprints,
    )

    texts = {
        1: "a b c d e f g h i j",               # generic
        2: "x x x x x x x x",                   # all-equal hashes (ties)
        3: "a b c d a b c d a b c d",           # periodic
        4: "p q",                               # too short: no grams
        5: "m n o",                             # exactly one gram, no window
    }

    def ref_fps(text):
        tk = text.split()
        grams = [" ".join(tk[i:i + _WIN_N])
                 for i in range(len(tk) - _WIN_N + 1)] \
            if len(tk) >= _WIN_N else []
        h = [int(hashlib.sha256(g.encode()).hexdigest()[:7], 16)
             for g in grams]
        sel = set()
        for s in range(len(h) - _WIN_W + 1):
            window = h[s:s + _WIN_W]
            m = min(window)
            j = max(i for i, v in enumerate(window) if v == m)
            sel.add(h[s + j])
        return grams, sel

    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    # expected (doc_id -> (n_windows, n_fp, n_shared))
    per_doc = {d: ref_fps(t) for d, t in texts.items()}
    fp_owners = {}
    for d, (_g, sel) in per_doc.items():
        for hval in sel:
            fp_owners.setdefault(hval, set()).add(d)
    expected = {}
    for d, (g, sel) in per_doc.items():
        if not sel:
            continue  # docs with no winnow window emit no row
        shared = sum(1 for hval in sel if len(fp_owners[hval]) > 1)
        expected[d] = (len(g), len(sel), shared)

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        docs.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        # satisfy t() for the other tables it might probe: only
        # documents is read by q181
        got = {r.doc_id: (r.n_windows, r.n_fp, r.n_shared_fp)
               for r in q181_winnowing_fingerprints(spark, tmp).collect()}
    assert got == expected and expected


def test_multipass_snm_recall(spark):
    """Hernández–Stolfo multi-pass property (q184 vs q182): the second
    (last-token block, forward sort) pass strictly adds verified pairs,
    never loses any pass-1 pair, and its additions include pairs whose
    FIRST tokens differ — structurally unreachable for any single
    first-token blocking, including the q92 exhaustive ground truth."""
    from sunat_rree_demo_spark.queries import REGISTRY

    def pairs(name):
        return {(r.name1, r.name2)
                for r in REGISTRY[name].fn(spark, SF_SMOKE).collect()}

    single = pairs("q182_sorted_neighborhood_pairs")
    multi = pairs("q184_multipass_blocking_pairs")
    gt = pairs("q92_fuzzy_name_pairs")
    assert single < multi                     # pass 2 adds pairs
    assert multi & gt >= single & gt          # recall never drops
    added = multi - single
    cross_block = [(a, b) for a, b in added
                   if a.split(" ")[0] != b.split(" ")[0]]
    assert cross_block                        # beyond first-token blocking
    # every added pair still passes the shared verify tier
    import duckdb
    con = duckdb.connect()
    for a, b in sorted(added)[:25]:
        (d,) = con.sql("SELECT levenshtein(?, ?)", params=[a, b]).fetchone()
        assert d <= 4
