"""Did-you-mean (operators/didyoumean.py) vs the pure-Python oracle.

ES term-suggester semantics (suggest_mode=missing): matched terms are
never corrected; an unmatched analyzed term maps to its highest-df
edit-distance-<=1 vocabulary neighbor (term asc on ties) or stays when
none exists.  The pick function is SHARED (oracle.choose_correction);
these tests pin the end-to-end behavior on both readers, with and
without the persisted fuzzy sidecar, and that the corrected query
executes to the oracle's ranking.
"""

from __future__ import annotations

import pytest

from search_engine_spark.config import BuildConfig
from search_engine_spark.corpus import generate_transcripts
from search_engine_spark.index.build import build_index
from search_engine_spark.index.fuzzy import build_fuzzy_sidecar
from search_engine_spark.index.multi import MultiIndex
from search_engine_spark.index.reader import CompressedIndex
from search_engine_spark.operators.didyoumean import suggest_correction
from search_engine_spark.oracle import (
    build_oracle_index,
    choose_correction,
    oracle_suggest_correction,
    oracle_topk,
)

_QUERIES = [
    "termm0003 term001 pony",  # two typo shapes + a matched term
    "term0001 term0002",  # all matched -> no correction
    "zzzzqqq term0002",  # no neighbor -> term stays, no suggestion
    "term001",  # single unmatched term
    "",  # empty
]


@pytest.fixture(scope="module")
def xs_pdf():
    return generate_transcripts("xs")


@pytest.fixture(scope="module")
def xs_index(spark, xs_pdf, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dym") / "idx")
    build_index(
        spark,
        spark.createDataFrame(xs_pdf[["conv_id", "turn_idx", "text"]]),
        out,
        BuildConfig(num_groups=2),
    )
    return CompressedIndex(spark, out)


@pytest.fixture(scope="module")
def xs_index_sidecar(spark, xs_pdf, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dym_sc") / "idx")
    build_index(
        spark,
        spark.createDataFrame(xs_pdf[["conv_id", "turn_idx", "text"]]),
        out,
        BuildConfig(num_groups=2),
    )
    build_fuzzy_sidecar(spark, out)
    return CompressedIndex(spark, out)


@pytest.fixture(scope="module")
def xs_multi(spark, xs_pdf, tmp_path_factory):
    d = tmp_path_factory.mktemp("dym_multi")
    lo = xs_pdf[xs_pdf.conv_id < "conv-000010"]
    hi = xs_pdf[xs_pdf.conv_id >= "conv-000010"]
    roots = []
    for name, part in (("lo", lo), ("hi", hi)):
        out = str(d / name)
        build_index(
            spark,
            spark.createDataFrame(part[["conv_id", "turn_idx", "text"]]),
            out,
            BuildConfig(num_groups=2),
        )
        roots.append(out)
    return MultiIndex(spark, roots)


@pytest.fixture(scope="module")
def xs_oracle(xs_pdf):
    return build_oracle_index(xs_pdf)


@pytest.mark.parametrize("q", _QUERIES)
def test_correction_matches_oracle(xs_index, xs_oracle, q):
    assert suggest_correction(xs_index, q) == oracle_suggest_correction(xs_oracle, q)


def test_sidecar_equals_fallback(xs_index, xs_index_sidecar):
    for q in _QUERIES:
        assert suggest_correction(xs_index_sidecar, q) == suggest_correction(
            xs_index, q
        )


def test_multi_matches_single(xs_index, xs_multi):
    for q in _QUERIES:
        assert suggest_correction(xs_multi, q) == suggest_correction(xs_index, q)


def test_corrected_query_executes(xs_index, xs_oracle):
    corrected, _sugg = suggest_correction(xs_index, _QUERIES[0])
    assert corrected is not None
    got = [
        (r.conv_id, r.turn_idx, round(r.score, 9))
        for r in xs_index.topk(corrected, "disjunctive", 10, analyzed=True).collect()
    ]
    want = [
        (k[0], k[1], round(s, 9))
        for k, s in oracle_topk(xs_oracle, corrected, "disjunctive", 10, analyzed=True)
    ]
    assert got == want and len(got) == 10


def test_choose_correction_tie_break():
    # df desc first, term asc on ties; unverified (ed>1) candidates drop
    cands = [("abcx", 5), ("abcd", 5), ("abce", 7), ("zzzz", 99)]
    assert choose_correction("abc", cands) == "abce"
    assert choose_correction("abc", [("abcd", 5), ("abcx", 5)]) == "abcd"
    assert choose_correction("abc", [("zzzz", 99)]) is None
