"""General wildcard (*?-anywhere) and regexp (/pattern/) term queries
vs the pure-Python oracle.

Lucene WildcardQuery / RegexpQuery semantics: a pattern token rewrites
to at most PREFIX_CAP index-vocabulary terms (highest df first, term
asc ties), matched FULLY against the POST-STEM vocabulary; the rewrite
feeds the ordinary analyzed paths, so it composes with
scope/tombstones/batch like prefix expansion.  The pure trailing-``*``
form stays on the prefix path (its StartsWith pushes to the vocabulary
parquet scan); general patterns push their longest literal prefix and
evaluate the rest in codegen (LIKE / rlike).  The reference engine has
no wildcard support; this follows the public Lucene contract.
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
    classify_expansion_tokens,
    oracle_expand_query,
    oracle_topk,
    wildcard_fullmatch,
    wildcard_literal_prefix,
    wildcard_to_like,
)


@pytest.fixture(scope="module")
def xs_pdf():
    return generate_transcripts("xs")


@pytest.fixture(scope="module")
def xs_index(spark, xs_pdf, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wildcard") / "idx")
    build_index(spark, spark.createDataFrame(xs_pdf), out, BuildConfig(num_groups=2))
    return CompressedIndex(spark, out)


@pytest.fixture(scope="module")
def xs_oracle(xs_pdf):
    return build_oracle_index(xs_pdf)


def _rows(df) -> list[tuple]:
    return [(r.conv_id, r.turn_idx, round(r.score, 9)) for r in df.collect()]


_WILD_QUERIES = [
    "t*rm000*",              # inner + trailing star (NOT the prefix form)
    "*erm0001",              # leading star — full vocabulary scan path
    "c?urt",                 # single-char wildcard
    "t?rm00?3 term0001",     # mixed with a plain analyzed token
    "zz*qq* term0001",       # unmatched pattern drops out
]

_REGEXP_QUERIES = [
    "/term000[13]/",
    "/term00(1[0-9]|0[13])/ /c.u(rt|nc.l)/",
    "/ter.0001/ court",
    "/zzz+nothing/ term0001",
]


def test_classification():
    cls = dict()
    for kind, val in classify_expansion_tokens(
        "merg* t*rm* x~ /a[bc]/ plain * ? c?urt"
    ):
        cls.setdefault(kind, []).append(val)
    assert cls["prefix"] == ["merg"]          # pure trailing-* stays prefix
    assert cls["wildcard"] == ["t*rm*", "c?urt"]
    assert cls["fuzzy"] == ["x"]
    assert cls["regexp"] == ["a[bc]"]
    assert cls["plain"] == ["plain", "*", "?"]  # bare markers match nothing


def test_wildcard_helpers():
    assert wildcard_to_like("t*rm00?") == "t%rm00_"
    assert wildcard_literal_prefix("kuber*s") == "kuber"
    assert wildcard_literal_prefix("*erm") == ""
    assert wildcard_fullmatch("t*rm000*", "term0001")
    assert wildcard_fullmatch("c?urt", "court")
    assert not wildcard_fullmatch("c?urt", "ccourt")
    assert not wildcard_fullmatch("term000", "term0001")  # full match only


@pytest.mark.parametrize("q", _WILD_QUERIES + _REGEXP_QUERIES)
def test_expansion_and_topk_match_oracle(xs_index, xs_oracle, q):
    eq = xs_index.expand_query(q)
    assert eq == oracle_expand_query(xs_oracle, q), q
    got = _rows(xs_index.topk(eq, "disjunctive", 10, analyzed=True))
    want = [
        (c, t, round(s, 9))
        for (c, t), s in oracle_topk(xs_oracle, eq, "disjunctive", 10, analyzed=True)
    ]
    assert got == want, q


def test_cap_ordering(xs_index, xs_oracle):
    """A cap below the match count keeps the highest-df terms (term asc
    ties) — on the engine via the distributed TakeOrdered, on the
    oracle via the in-memory sort."""
    eng = xs_index._wildcard_expansions(["term0*"], 5)["term0*"]
    assert len(eng) == 5
    dfs = [xs_oracle.df(t) for t in eng]
    assert dfs == sorted(dfs, reverse=True)
    full = xs_index._wildcard_expansions(["term0*"], 10_000)["term0*"]
    assert eng == sorted(full, key=lambda t: (-xs_oracle.df(t), t))[:5]


def test_invalid_regexp_fails_loud(xs_index):
    with pytest.raises(ValueError, match="invalid regexp"):
        xs_index.expand_query("/ter[m/")


def test_no_markers_returns_none(xs_index):
    assert xs_index.expand_query("court merger") is None


def test_scope_composition(spark, xs_index, xs_oracle, xs_pdf):
    """Wildcard rewrite feeds the ordinary analyzed path, so metadata
    scope applies unchanged."""
    from search_engine_spark.oracle import oracle_matches

    corpus = spark.createDataFrame(xs_pdf)
    eq = xs_index.expand_query("t*rm000*")
    got = _rows(
        xs_index.topk(
            eq, "disjunctive", 10, analyzed=True,
            scope=corpus.filter("role = 'assistant'"),
        )
    )
    keys = {
        (c, t)
        for c, t, r in zip(xs_pdf["conv_id"], xs_pdf["turn_idx"], xs_pdf["role"])
        if r == "assistant"
    }
    want = [
        (c, t, round(s, 9))
        for (c, t), s in oracle_topk(
            xs_oracle, eq, "disjunctive", 10, analyzed=True, scope=keys
        )
    ]
    assert got == want


def test_multi_index_union_vocabulary(spark, xs_pdf, xs_oracle, tmp_path):
    """MultiIndex expansion ranks by df SUMMED across segments and the
    executed top-k equals the single fresh index over the union corpus."""
    half = xs_pdf[xs_pdf["conv_id"] < "conv-000015"].reset_index(drop=True)
    rest = xs_pdf[xs_pdf["conv_id"] >= "conv-000015"].reset_index(drop=True)
    base = str(tmp_path / "base")
    seg = str(tmp_path / "seg")
    build_index(spark, spark.createDataFrame(half), base, BuildConfig(num_groups=2))
    build_index(spark, spark.createDataFrame(rest), seg, BuildConfig(num_groups=2))
    multi = MultiIndex(spark, [base, seg])
    for q in ["t*rm000*", "/term000[13]/ c?urt"]:
        eq = multi.expand_query(q)
        assert eq == oracle_expand_query(xs_oracle, q), q
        got = _rows(multi.topk(eq, "disjunctive", 10, analyzed=True))
        want = [
            (c, t, round(s, 9))
            for (c, t), s in oracle_topk(
                xs_oracle, eq, "disjunctive", 10, analyzed=True
            )
        ]
        assert got == want, q


def test_service_auto_expand(spark, xs_index, xs_pdf):
    """service.search auto-expands wildcard/regexp markers like it does
    prefix/fuzzy ones (has_expansion_tokens gates the rewrite)."""
    from search_engine_spark.service import search

    corpus = spark.createDataFrame(xs_pdf)
    res = search(xs_index, corpus, "t?rm0001", k=5)
    direct = xs_index.topk(
        xs_index.expand_query("t?rm0001"), "disjunctive", 5, analyzed=True
    ).collect()
    assert [(h["conv_id"], h["turn_idx"]) for h in res["results"]] == [
        (r.conv_id, r.turn_idx) for r in direct
    ]
