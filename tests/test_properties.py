"""Property-based tests (hypothesis) for the pure driver-side logic:
Excel sheet parsing heuristics and the golden-hash primitives. Spark
DataFrames are deliberately absent here — properties run hundreds of
examples, so they exercise the pure functions."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from sunat_rree_demo_spark.functions.months import MONTH_NAMES_ES

# ---------------------------------------------------------------- adapter

noise_cell = st.one_of(st.none(), st.floats(allow_nan=False), st.text(max_size=8)
                       .filter(lambda s: s.strip() != "Enero"))


@given(st.lists(st.lists(noise_cell, max_size=6), max_size=6),
       st.integers(0, 5))
@settings(max_examples=200, deadline=None)
def test_header_detection_finds_first_enero(noise_rows, pos):
    from sunat_rree_demo_spark.sources.excel_adapter import find_header_row

    header = ["Sector"] + list(MONTH_NAMES_ES) + ["Total"]
    rows = noise_rows[:pos] + [header] + noise_rows[pos:]
    idx = find_header_row(rows)
    # the found row genuinely contains Enero and no earlier row does
    assert any(str(v).strip() == "Enero" for v in rows[idx])
    for earlier in rows[:idx]:
        assert not any(str(v).strip() == "Enero" for v in earlier)


@given(st.permutations(list(MONTH_NAMES_ES)))
@settings(max_examples=50, deadline=None)
def test_month_columns_maps_every_month_any_order(perm):
    from sunat_rree_demo_spark.sources.excel_adapter import month_columns

    header = ["x", *perm, "Total", "junk"]
    months, total_col = month_columns(header)
    assert sorted(months.values()) == sorted(MONTH_NAMES_ES)
    assert header[total_col] == "Total"
    for i, name in months.items():
        assert header[i].strip() == name


@given(st.text(max_size=30))
@settings(max_examples=300, deadline=None)
def test_noise_filter_total_incluye_short(label):
    from sunat_rree_demo_spark.sources.excel_adapter import _is_noise_label

    cleaned = label.strip()
    if _is_noise_label(cleaned):
        low = cleaned.lower()
        assert (cleaned == "" or low == "nan" or low.startswith("incluye")
                or low.startswith("total") or len(cleaned) < 3)
    else:
        assert len(cleaned) >= 3
        assert not cleaned.lower().startswith(("incluye", "total"))


# ---------------------------------------------------------------- hashing

@given(st.text(min_size=0, max_size=50))
@settings(max_examples=200, deadline=None)
def test_base_hash_is_28_bit_and_deterministic(s):
    from sunat_rree_demo_spark.operators.dedup import base_hash_py

    h = base_hash_py(s)
    assert 0 <= h < (1 << 28)
    assert h == base_hash_py(s)


@given(st.lists(st.sampled_from(["a", "b", "c", "d", "e"]), min_size=5,
                max_size=40))
@settings(max_examples=200, deadline=None)
def test_shingles_count_and_width(tokens):
    from tests.test_dedup import py_shingles

    sh = py_shingles(tokens, 5)
    assert len(sh) <= len(tokens) - 4
    assert all(len(s.split(" ")) == 5 for s in sh)


# ---------------------------------------------------------------- insights

@given(st.floats(min_value=-1e12, max_value=1e12, allow_nan=False))
@settings(max_examples=300, deadline=None)
def test_format_currency_total(v):
    from sunat_rree_demo_spark.plans.insights import format_currency

    s = format_currency(v)
    assert s.endswith(("B", "M", "K"))
    float(s[:-1])  # parses back


@given(st.floats(allow_nan=False, allow_infinity=False))
@settings(max_examples=300, deadline=None)
def test_trend_emoji_is_total_function(yoy):
    from sunat_rree_demo_spark.plans.insights import trend_emoji

    assert trend_emoji(yoy) in ("🚀", "📈", "📉", "⚠️")


# ------------------------------------------------- integer rounding device

@given(st.integers(min_value=0, max_value=10**15),
       st.integers(min_value=1, max_value=10**6))
@settings(max_examples=300, deadline=None)
def test_half_up_integer_rounding_matches_decimal(total_micro, n):
    """The `(2Σ + d) div (2d)` device used by q74/q80/q83 must equal
    decimal HALF_UP rounding of Σ/d for every non-negative Σ — the
    regime the queries guarantee (q80 shifts by +64 bits first)."""
    from decimal import ROUND_HALF_UP, Decimal

    d = 100 * n
    got = (2 * total_micro + d) // (2 * d)
    want = int((Decimal(total_micro) / d)
               .quantize(Decimal(1), rounding=ROUND_HALF_UP))
    assert got == want


@given(st.integers(min_value=0, max_value=10**15),
       st.integers(min_value=1, max_value=10**6))
@settings(max_examples=300, deadline=None)
def test_rounding_device_identical_in_duckdb(total_micro, n):
    """DuckDB's `//` (floor) must agree with Python's `//` on the
    device's always-non-negative dividends — the cross-engine half the
    oracles rely on. (On NEGATIVE dividends they would not: DuckDB
    floors, Spark's `div` truncates — hence q80's +64-bit shift.)"""
    import duckdb

    # cast like the oracles do (their operands are BIGINT/HUGEINT
    # columns; bare literals here would parse INT32 and overflow)
    got = duckdb.execute(
        f"SELECT (2*CAST({total_micro} AS BIGINT) + CAST({100*n} AS BIGINT))"
        f" // CAST({200*n} AS BIGINT)").fetchone()[0]
    assert got == (2 * total_micro + 100 * n) // (200 * n)


def test_morton_interleave_is_bijective_and_monotone_per_axis():
    """Morton code properties (pure-Python twin of the Column expr):
    interleaving is a bijection on 16-bit pairs (decode inverts), and
    fixing one axis makes the code strictly monotone in the other."""
    from hypothesis import given, strategies as st

    def py_morton(x, y, bits=16):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    def py_demorton(z, bits=16):
        x = y = 0
        for i in range(bits):
            x |= ((z >> (2 * i)) & 1) << i
            y |= ((z >> (2 * i + 1)) & 1) << i
        return x, y

    @given(st.integers(0, 65535), st.integers(0, 65535))
    def check(x, y):
        z = py_morton(x, y)
        assert py_demorton(z) == (x, y)
        # STRICT per-axis monotonicity, not mere injectivity
        if x < 65535:
            assert py_morton(x + 1, y) > z
        if y < 65535:
            assert py_morton(x, y + 1) > z

    check()


def test_morton_column_matches_python_twin(spark):
    """The Spark Column rendering and the SQL rendering must equal the
    pure-Python interleave on a grid of edge values."""
    from pyspark.sql import Row, functions as F

    from sunat_rree_demo_spark.operators.layout import morton_code, morton_sql

    def py_morton(x, y, bits=16):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    vals = [0, 1, 2, 3, 255, 256, 32767, 32768, 65534, 65535]
    rows = [Row(x=x, y=y) for x in vals for y in vals]
    df = spark.createDataFrame(rows)
    got_col = {(r["x"], r["y"]): r["z"] for r in
               df.select("x", "y",
                         morton_code(F.col("x"), F.col("y")).alias("z"))
               .collect()}
    got_sql = {(r["x"], r["y"]): r["z"] for r in
               df.selectExpr("x", "y", f"({morton_sql('x', 'y')}) AS z")
               .collect()}
    for x in vals:
        for y in vals:
            want = py_morton(x, y)
            assert got_col[(x, y)] == want
            assert got_sql[(x, y)] == want


# -------------------------------------------------- BPE replace device

def _merge_ref(syms: list[str], left: str, right: str) -> list[str]:
    """Textbook BPE merge on a symbol list: scan left-to-right, fuse
    each non-overlapping (left, right) adjacency."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _merge_via_replace(syms: list[str], left: str, right: str) -> list[str]:
    """The engines' double-space string device (operators.text._bpe_train
    / the q126 oracle): plain non-regex replace on '  '-separated
    symbols — str.replace is leftmost-first non-overlapping, the same
    contract as Spark's replace and DuckDB's replace."""
    s = "  " + "  ".join(syms) + "  "
    s = s.replace(f" {left}  {right} ", f" {left}{right} ")
    return s.strip().split("  ")


@given(st.lists(st.text(alphabet="ab", min_size=1, max_size=3),
                min_size=1, max_size=12),
       st.integers(0, 10))
@settings(max_examples=500, deadline=None)
def test_bpe_replace_device_equals_textbook_merge(syms, pick):
    """For ANY symbol sequence and any adjacent pair present in it, the
    double-space replace produces exactly the textbook leftmost-first
    merge — including overlapping runs (a a a under (a, a)) and pairs
    whose symbols are prefixes/suffixes of each other."""
    pairs = [(syms[i], syms[i + 1]) for i in range(len(syms) - 1)]
    if not pairs:
        return
    left, right = pairs[pick % len(pairs)]
    assert _merge_via_replace(syms, left, right) == \
        _merge_ref(syms, left, right)


# ------------------------------------------------------ skyline sweep

def _sweep_frontier(pts: list[tuple[int, int]]) -> set[int]:
    """Pure-Python mirror of operators.analytics.pareto_frontier_2d's
    window semantics: sorted by the minimized column, dominance =
    (max of maxcol over strictly-smaller values) >= v  OR  (max of
    maxcol among equal values) > v. Returns surviving indices."""
    import collections
    by_price = collections.defaultdict(list)
    for i, (c, s) in enumerate(pts):
        by_price[c].append((i, s))
    keep = set()
    cummax = None
    for price in sorted(by_price):
        group = by_price[price]
        group_max = max(s for _, s in group)
        for i, s in group:
            dominated = ((cummax is not None and cummax >= s)
                         or group_max > s)
            if not dominated:
                keep.add(i)
        cummax = group_max if cummax is None else max(cummax, group_max)
    return keep


@given(st.lists(st.tuples(st.integers(0, 8), st.integers(0, 8)),
                min_size=1, max_size=40))
@settings(max_examples=500, deadline=None)
def test_skyline_sweep_equals_quadratic_dominance(pts):
    """The window-sweep algorithm equals the O(n²) dominance definition
    on arbitrary multisets (ties and duplicates included)."""
    def dominates(a, b):
        return a[0] <= b[0] and a[1] >= b[1] and (a[0] < b[0] or a[1] > b[1])

    brute = {i for i, p in enumerate(pts)
             if not any(dominates(q, p)
                        for j, q in enumerate(pts) if j != i)}
    assert _sweep_frontier(pts) == brute


# ------------------------------------------------- count-min guarantee

@given(st.lists(st.text(alphabet="xyz", min_size=1, max_size=4),
                min_size=1, max_size=60))
@settings(max_examples=200, deadline=None)
def test_cms_sha48_device_never_underestimates(stream):
    """The q135 hash device (sha-256 'cms{j}:' domains, 12 hex chars,
    mod 64), replayed in pure Python over an arbitrary token stream,
    keeps the count-min guarantee: min-over-rows >= true count."""
    import collections
    import hashlib

    def bucket(term: str, j: int) -> int:
        h = hashlib.sha256(f"cms{j}:{term}".encode()).hexdigest()
        return int(h[:12], 16) % 64

    cms = [collections.Counter() for _ in range(4)]
    exact = collections.Counter(stream)
    for term in stream:
        for j in range(4):
            cms[j][bucket(term, j)] += 1
    for term, n in exact.items():
        est = min(cms[j][bucket(term, j)] for j in range(4))
        assert est >= n
