"""Prefix (trailing-*) query expansion vs the pure-Python oracle.

Lucene multi-term-query semantics: a ``foo*`` token rewrites to at most
PREFIX_CAP index-vocabulary terms (highest df first, term asc ties),
matched against the POST-STEM vocabulary; the rewritten string then
feeds the ordinary analyzed query paths, so expansion composes with
scope/tombstones/batch for free.  The reference engine has no wildcard
support; this follows the public Lucene contract (bounded rewrite,
filters/expansions never bypass analysis of the final query).
"""

from __future__ import annotations

import pytest

from search_engine_spark.config import BuildConfig
from search_engine_spark.corpus import generate_transcripts
from search_engine_spark.index.build import build_index
from search_engine_spark.index.multi import MultiIndex
from search_engine_spark.index.reader import CompressedIndex
from search_engine_spark.oracle import (
    build_oracle_index,
    oracle_expand_prefixes,
    oracle_expand_query,
    oracle_topk,
)


@pytest.fixture(scope="module")
def xs_pdf():
    return generate_transcripts("xs")


@pytest.fixture(scope="module")
def xs_index(spark, xs_pdf, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("prefix") / "idx")
    build_index(spark, spark.createDataFrame(xs_pdf), out, BuildConfig(num_groups=2))
    return CompressedIndex(spark, out)


@pytest.fixture(scope="module")
def xs_oracle(xs_pdf):
    return build_oracle_index(xs_pdf)


def _rows(df) -> list[tuple]:
    return [(r.conv_id, r.turn_idx, round(r.score, 9)) for r in df.collect()]


_PREFIX_QUERIES = [
    "term000*",
    "term001* term0002",
    "windo* merg*",
    "zzznothing* term0001",
]


def test_expansion_matches_oracle(xs_index, xs_oracle):
    for q in _PREFIX_QUERIES:
        assert xs_index.expand_prefixes(q) == oracle_expand_prefixes(xs_oracle, q), q


def test_expanded_topk_matches_oracle(xs_index, xs_oracle):
    """Execution path: expand_query returns a FULLY-ANALYZED rewrite
    that runs with analyzed=True (no second Porter pass)."""
    for q in _PREFIX_QUERIES:
        eq = xs_index.expand_query(q)
        assert eq == oracle_expand_query(xs_oracle, q), q
        got = _rows(xs_index.topk(eq, "disjunctive", 10, analyzed=True))
        want = [
            (c, t, round(s, 9))
            for (c, t), s in oracle_topk(
                xs_oracle, oracle_expand_query(xs_oracle, q),
                "disjunctive", 10, analyzed=True,
            )
        ]
        assert got == want, q


def test_non_idempotent_stem_expansion(spark, tmp_path):
    """Porter is NOT idempotent (university → univers → univ): an
    expansion containing the non-fixed-point vocab term 'univers' must
    still match, which requires the analyzed=True execution path — the
    round-4 review found the naive re-analyzed rewrite returned ZERO
    results here."""
    import pandas as pd

    from search_engine_spark.oracle import build_oracle_index

    pdf = pd.DataFrame(
        {
            "conv_id": ["c-0", "c-0", "c-1"],
            "turn_idx": [0, 1, 0],
            "text": [
                "the university opened today",
                "many universities collaborate",
                "unrelated filler text rows",
            ],
        }
    )
    out = str(tmp_path / "uidx")
    build_index(spark, spark.createDataFrame(pdf), out, BuildConfig(num_groups=2))
    idx = CompressedIndex(spark, out)
    oracle = build_oracle_index(pdf)
    # sanity: the vocab term is not a stemmer fixed point
    from search_engine_spark.textproc import analyze_query

    assert "univers" in oracle.postings
    assert analyze_query("univers") != ["univers"]
    eq = idx.expand_query("univ*")
    assert eq == oracle_expand_query(oracle, "univ*") == "univers"
    got = _rows(idx.topk(eq, "disjunctive", 10, analyzed=True))
    assert len(got) == 2  # both university turns
    want = [
        (c, t, round(s, 9))
        for (c, t), s in oracle_topk(oracle, eq, "disjunctive", 10, analyzed=True)
    ]
    assert got == want
    # the service path end-to-end
    from search_engine_spark.service import search

    page = search(idx, spark.createDataFrame(pdf), "univ*", k=5)
    assert len(page["results"]) == 2
    assert page["expanded_query"] == "univers"


def test_cap_orders_by_df_then_term(xs_index, xs_oracle):
    capped = xs_index.expand_prefixes("term0*", limit=3)
    terms = capped.split()
    assert len(terms) == 3
    assert capped == oracle_expand_prefixes(xs_oracle, "term0*", limit=3)
    # df must be non-increasing along the expansion
    dfs = [xs_oracle.df(t) for t in terms]
    assert dfs == sorted(dfs, reverse=True)
    # ties broken by ascending term
    for a, b, da, db in zip(terms, terms[1:], dfs, dfs[1:]):
        if da == db:
            assert a < b


def test_no_prefix_is_identity(xs_index):
    assert xs_index.expand_prefixes("term0001 term0002") == "term0001 term0002"
    # star shapes that are NOT word+trailing-star pass through untouched
    assert xs_index.expand_prefixes("te*rm * a**") == "te*rm * a**"


def test_unmatched_prefix_drops_out(xs_index):
    eq = xs_index.expand_query("zzznothing* term0001")
    got = _rows(xs_index.topk(eq, "disjunctive", 10, analyzed=True))
    want = _rows(xs_index.topk("term0001"))
    assert got == want


def test_multi_index_expansion_matches_single(spark, xs_pdf, xs_index, tmp_path_factory):
    d = tmp_path_factory.mktemp("prefix_multi")
    a = xs_pdf[xs_pdf.conv_id < "conv-000010"]
    b = xs_pdf[xs_pdf.conv_id >= "conv-000010"]
    roots = []
    for name, part in (("a", a), ("b", b)):
        out = str(d / name)
        build_index(spark, spark.createDataFrame(part), out, BuildConfig(num_groups=2))
        roots.append(out)
    multi = MultiIndex(spark, roots)
    for q in _PREFIX_QUERIES:
        assert multi.expand_prefixes(q) == xs_index.expand_prefixes(q), q


def test_expansion_composes_with_scope(spark, xs_index, xs_pdf, xs_oracle):
    corpus = spark.createDataFrame(xs_pdf)
    scope_df = corpus.filter("role = 'assistant'")
    sub = xs_pdf[xs_pdf.role == "assistant"]
    scope = set(zip(sub.conv_id, sub.turn_idx))
    q = xs_index.expand_query("term000*")
    got = _rows(xs_index.topk(q, "disjunctive", 10, scope=scope_df, analyzed=True))
    want = [
        (c, t, round(s, 9))
        for (c, t), s in oracle_topk(
            xs_oracle, oracle_expand_query(xs_oracle, "term000*"),
            "disjunctive", 10, scope=scope, analyzed=True,
        )
    ]
    assert got == want


def test_service_auto_expands(spark, xs_index, xs_pdf):
    from search_engine_spark.service import search

    tr = spark.createDataFrame(xs_pdf)
    page = search(xs_index, tr, "term000*", k=5)
    assert page["query"] == "term000*"
    assert page["expanded_query"] == xs_index.expand_query("term000*")
    got = [(r["conv_id"], r["turn_idx"], round(r["score"], 9)) for r in page["results"]]
    want = _rows(
        xs_index.topk(page["expanded_query"], "disjunctive", 5, analyzed=True)
    )
    assert got == want
    plain = search(xs_index, tr, "term0001", k=5)
    assert "expanded_query" not in plain
    import pytest as _pytest

    with _pytest.raises(ValueError, match="disjunctive"):
        search(xs_index, tr, "term000* term0001", mode="conjunctive", k=5)
