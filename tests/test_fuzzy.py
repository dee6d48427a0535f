"""Fuzzy (trailing-~, edit-distance-1) term matching vs the oracle.

SymSpell delete-1 candidate generation (``index/fuzzy.py``) + exact
``within_edit1`` verification, exact-term-first/df-desc/term-asc capped
rewrite — identical through the persisted sidecar and the idf-table
fallback, and identical to the pure-Python oracle expander.
"""

from __future__ import annotations

import pytest

from search_engine_spark.config import BuildConfig
from search_engine_spark.corpus import generate_transcripts
from search_engine_spark.index.build import build_index
from search_engine_spark.index.fuzzy import build_fuzzy_sidecar
from search_engine_spark.index.multi import MultiIndex
from search_engine_spark.index.reader import CompressedIndex
from search_engine_spark.oracle import (
    build_oracle_index,
    deletions1,
    oracle_expand_fuzzy,
    oracle_expand_query,
    oracle_topk,
    within_edit1,
)

_FUZZY_QUERIES = [
    "term001~ merg~",      # one-char-short typo + stemmed-form neighbor
    "xterm0001~",          # one leading insertion
    "zzzznothing~ term0002",  # unmatched fuzzy term drops out
    "window~ term0001",
]


@pytest.fixture(scope="module")
def xs_pdf():
    return generate_transcripts("xs")


@pytest.fixture(scope="module")
def xs_index(spark, xs_pdf, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fuzzy") / "idx")
    build_index(spark, spark.createDataFrame(xs_pdf), out, BuildConfig(num_groups=2))
    return CompressedIndex(spark, out)


@pytest.fixture(scope="module")
def xs_oracle(xs_pdf):
    return build_oracle_index(xs_pdf)


def _rows(df) -> list[tuple]:
    return [(r.conv_id, r.turn_idx, round(r.score, 9)) for r in df.collect()]


def test_within_edit1_reference_cases():
    assert within_edit1("abc", "abc")
    assert within_edit1("abc", "ab")       # deletion
    assert within_edit1("abc", "abcd")     # insertion
    assert within_edit1("abc", "axc")      # substitution
    assert not within_edit1("abc", "a")    # distance 2
    assert not within_edit1("abc", "axy")  # two substitutions
    assert not within_edit1("abc", "cba")  # transposition-ish, distance 2
    assert not within_edit1("ab", "ba")    # swap = distance 2 (no Damerau)


def test_delete1_collision_is_complete():
    """Any ed≤1 pair must collide on a delete-1 variant — the sidecar's
    correctness precondition."""
    pairs = [("abc", "abc"), ("abc", "ab"), ("abc", "abcd"), ("abc", "axc"),
             ("term0001", "term001"), ("merge", "merg")]
    for a, b in pairs:
        va = set(deletions1(a)) | {a}
        vb = set(deletions1(b)) | {b}
        assert va & vb, (a, b)


def test_expansion_matches_oracle_fallback(xs_index, xs_oracle):
    for q in _FUZZY_QUERIES:
        assert xs_index.expand_fuzzy(q) == oracle_expand_fuzzy(xs_oracle, q), q


def test_sidecar_equals_fallback(spark, xs_pdf, xs_oracle, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fuzzy_sc") / "idx")
    build_index(spark, spark.createDataFrame(xs_pdf), out, BuildConfig(num_groups=2))
    build_fuzzy_sidecar(spark, out)
    idx = CompressedIndex(spark, out)
    import os

    assert os.path.isdir(os.path.join(out, "fuzzy"))
    for q in _FUZZY_QUERIES:
        assert idx.expand_fuzzy(q) == oracle_expand_fuzzy(xs_oracle, q), q


def test_fuzzy_topk_matches_oracle(xs_index, xs_oracle):
    for q in _FUZZY_QUERIES:
        eq = xs_index.expand_query(q)
        assert eq == oracle_expand_query(xs_oracle, q), q
        got = _rows(xs_index.topk(eq, "disjunctive", 10, analyzed=True))
        want = [
            (c, t, round(s, 9))
            for (c, t), s in oracle_topk(
                xs_oracle, eq, "disjunctive", 10, analyzed=True
            )
        ]
        assert got == want, q


def test_mixed_prefix_and_fuzzy_one_pass(xs_index, xs_oracle):
    """* and ~ markers in ONE query expand in a single pass — chaining
    marker-specific rewrites would re-analyze the first rewrite's
    vocabulary terms."""
    q = "term000* merg~ term0002"
    eq = xs_index.expand_query(q)
    assert eq == oracle_expand_query(xs_oracle, q)
    got = _rows(xs_index.topk(eq, "disjunctive", 10, analyzed=True))
    want = [
        (c, t, round(s, 9))
        for (c, t), s in oracle_topk(xs_oracle, eq, "disjunctive", 10, analyzed=True)
    ]
    assert got == want


def test_cap_and_ordering(xs_index, xs_oracle):
    got = xs_index.expand_fuzzy("term001~", limit=4)
    assert got == oracle_expand_fuzzy(xs_oracle, "term001~", limit=4)
    terms = got.split()
    assert len(terms) == 4
    dfs = [xs_oracle.df(t) for t in terms]
    assert dfs == sorted(dfs, reverse=True)


def test_exact_term_ranks_first(xs_index, xs_oracle):
    """A vocabulary term queried fuzzily must keep itself first even if
    a neighbor has higher df."""
    exp = xs_index.expand_fuzzy("term0010~").split()
    assert exp[0] == "term0010"
    assert exp == oracle_expand_fuzzy(xs_oracle, "term0010~").split()


def test_no_tilde_is_identity(xs_index):
    assert xs_index.expand_fuzzy("term0001 term0002") == "term0001 term0002"
    assert xs_index.expand_fuzzy("a~b ~ x~~") == "a~b ~ x~~"


def test_multi_index_matches_single(spark, xs_pdf, xs_index, tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzzy_multi")
    a = xs_pdf[xs_pdf.conv_id < "conv-000010"]
    b = xs_pdf[xs_pdf.conv_id >= "conv-000010"]
    roots = []
    for name, part in (("a", a), ("b", b)):
        out = str(d / name)
        build_index(spark, spark.createDataFrame(part), out, BuildConfig(num_groups=2))
        roots.append(out)
    multi = MultiIndex(spark, roots)
    for q in _FUZZY_QUERIES:
        assert multi.expand_fuzzy(q) == xs_index.expand_fuzzy(q), q


def test_service_auto_expands_fuzzy(spark, xs_index, xs_pdf):
    from search_engine_spark.service import search

    tr = spark.createDataFrame(xs_pdf)
    page = search(xs_index, tr, "term001~", k=5)
    assert page["query"] == "term001~"
    assert page["expanded_query"] == xs_index.expand_query("term001~")
    got = [(r["conv_id"], r["turn_idx"], round(r["score"], 9)) for r in page["results"]]
    want = _rows(
        xs_index.topk(page["expanded_query"], "disjunctive", 5, analyzed=True)
    )
    assert got == want


def test_within_edit1_matches_dp_levenshtein():
    """Property: within_edit1 == (full DP Levenshtein ≤ 1) on random
    short words — the O(len) shortcut must be exact."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    @given(
        st.text(alphabet="abcde", min_size=0, max_size=6),
        st.text(alphabet="abcde", min_size=0, max_size=6),
    )
    @settings(max_examples=300, deadline=None)
    def check(a, b):
        assert within_edit1(a, b) == (lev(a, b) <= 1), (a, b)

    check()


def test_delete1_collision_property():
    """Property: ed(a,b) ≤ 1 ⇒ variant sets collide (completeness of the
    SymSpell candidate rule on random words)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.text(alphabet="abc", min_size=1, max_size=5),
        st.text(alphabet="abc", min_size=1, max_size=5),
    )
    @settings(max_examples=300, deadline=None)
    def check(a, b):
        if within_edit1(a, b):
            va = set(deletions1(a)) | {a}
            vb = set(deletions1(b)) | {b}
            assert va & vb, (a, b)

    check()
