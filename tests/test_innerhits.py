"""collapse + inner_hits (operators/innerhits.py) vs the pure-Python
oracle: ES field-collapsing expanded to per-conversation top-N hits."""

from __future__ import annotations

import pytest

from search_engine_spark.config import BuildConfig
from search_engine_spark.corpus import generate_transcripts
from search_engine_spark.index.build import build_index
from search_engine_spark.index.multi import MultiIndex
from search_engine_spark.index.reader import CompressedIndex
from search_engine_spark.operators.innerhits import collapse_inner_hits
from search_engine_spark.oracle import (
    build_oracle_index,
    oracle_collapse_inner_hits,
)


@pytest.fixture(scope="module")
def xs_pdf():
    return generate_transcripts("xs")


@pytest.fixture(scope="module")
def xs_index(spark, xs_pdf, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("innerhits") / "idx")
    build_index(
        spark,
        spark.createDataFrame(xs_pdf[["conv_id", "turn_idx", "text"]]),
        out,
        BuildConfig(num_groups=2),
    )
    return CompressedIndex(spark, out)


@pytest.fixture(scope="module")
def xs_multi(spark, xs_pdf, tmp_path_factory):
    d = tmp_path_factory.mktemp("innerhits_multi")
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


def _collect(ix, qt, mode="disjunctive", **kw):
    return [
        (r.conv_id, round(r.conv_score, 9), r.hit_rank, r.turn_idx,
         round(r.score, 9))
        for r in collapse_inner_hits(ix, qt, mode, **kw).collect()
    ]


@pytest.mark.parametrize(
    "qt,mode,k,inner_n",
    [
        ("term0001 term0002", "disjunctive", 5, 3),
        ("term0000", "disjunctive", 3, 2),
        ("term0000 term0007", "conjunctive", 4, 3),
        ('"phrase alpha beta"', "phrase", 3, 5),
    ],
)
def test_matches_oracle(xs_index, xs_oracle, qt, mode, k, inner_n):
    got = _collect(xs_index, qt, mode, k=k, inner_n=inner_n)
    want = [
        (c, round(cs, 9), r, t, round(s, 9))
        for c, cs, r, t, s in oracle_collapse_inner_hits(
            xs_oracle, qt, mode, k, inner_n
        )
    ]
    assert got == want, (qt, mode)


def test_rank1_is_collapse_representative(xs_index):
    qt = "term0001 term0002"
    reps = [
        (r.conv_id, r.turn_idx, round(r.score, 9))
        for r in xs_index.topk_conversations(qt, "disjunctive", 5).collect()
    ]
    rank1 = [
        (c, t, s) for c, _cs, r, t, s in _collect(xs_index, qt, k=5, inner_n=3)
        if r == 1
    ]
    assert rank1 == reps
    # and every row's conv_score equals its conversation's rank-1 score
    rows = _collect(xs_index, qt, k=5, inner_n=3)
    best = {c: s for c, t, s in rank1}
    assert all(cs == best[c] for c, cs, _r, _t, _s in rows)


def test_multiindex_identity(xs_index, xs_multi):
    qt = "term0001 term0002"
    assert _collect(xs_index, qt, k=5, inner_n=3) == _collect(
        xs_multi, qt, k=5, inner_n=3
    )


def test_min_match_and_bounds(xs_index, xs_oracle):
    # min_match narrows BOTH passes identically (spec resolved once)
    got = _collect(
        xs_index, "term0001 term0002", k=5, inner_n=2, min_match=2
    )
    convs = {c for c, *_ in got}
    from search_engine_spark.oracle import oracle_matches

    allowed = {c for c, _t in oracle_matches(
        xs_oracle, "term0001 term0002", "disjunctive", min_match=2
    )}
    assert convs and convs <= allowed
    with pytest.raises(ValueError, match="inner_n"):
        collapse_inner_hits(xs_index, "term0001", inner_n=0)


def test_stopword_only_query_is_empty(xs_index):
    out = collapse_inner_hits(xs_index, "the of and")
    assert out.count() == 0
    assert out.columns == ["conv_id", "conv_score", "hit_rank", "turn_idx", "score"]
