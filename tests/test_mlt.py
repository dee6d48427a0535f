"""More-like-this (operators/mlt.py) vs the pure-Python oracle.

Elasticsearch ``more_like_this`` semantics: the source turn's distinct
analyzed terms ranked by tf*idf (term asc on ties), top max_terms become
a disjunctive BM25 query via the analyzed execution path, the source
turn excluded from the result.  Term selection is ONE shared function
(oracle.mlt_select_terms) so the engine and oracle rank
float-for-float identically; these tests pin the end-to-end ranking on
both readers plus the selection edge cases.
"""

from __future__ import annotations

import pytest

from search_engine_spark.config import BuildConfig
from search_engine_spark.corpus import generate_transcripts
from search_engine_spark.index.build import build_index
from search_engine_spark.index.multi import MultiIndex
from search_engine_spark.index.reader import CompressedIndex
from search_engine_spark.operators.mlt import mlt_query_terms, more_like_this
from search_engine_spark.oracle import (
    build_oracle_index,
    mlt_select_terms,
    oracle_more_like_this,
)


@pytest.fixture(scope="module")
def xs_pdf():
    return generate_transcripts("xs")


@pytest.fixture(scope="module")
def xs_df(spark, xs_pdf):
    return spark.createDataFrame(xs_pdf).cache()


@pytest.fixture(scope="module")
def xs_index(spark, xs_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mlt") / "idx")
    build_index(spark, xs_df, out, BuildConfig(num_groups=2))
    return CompressedIndex(spark, out)


@pytest.fixture(scope="module")
def xs_multi(spark, xs_pdf, tmp_path_factory):
    """The same corpus split into two disjoint segments."""
    d = tmp_path_factory.mktemp("mlt_multi")
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


def _got(df) -> list[tuple]:
    return [(r.conv_id, r.turn_idx, round(r.score, 9)) for r in df.collect()]


def _want(rows) -> list[tuple]:
    return [(k[0], k[1], round(s, 9)) for k, s in rows]


_SOURCES = [("conv-000004", 1), ("conv-000000", 0), ("conv-000013", 2)]


@pytest.mark.parametrize("src", _SOURCES)
def test_mlt_matches_oracle(spark, xs_index, xs_df, xs_oracle, src):
    got = _got(more_like_this(xs_index, xs_df, *src, k=10))
    want = _want(oracle_more_like_this(xs_oracle, *src, 10))
    assert got == want
    assert len(got) == 10
    assert src not in {(c, t) for c, t, _s in got}


def test_mlt_multi_matches_single(spark, xs_index, xs_multi, xs_df):
    """Segmented reads answer MLT identically to the union index
    (global-stats caveat does not apply: idf_map on MultiIndex merges
    df across segments)."""
    src = _SOURCES[0]
    assert _got(more_like_this(xs_multi, xs_df, *src, k=10)) == _got(
        more_like_this(xs_index, xs_df, *src, k=10)
    )


def test_mlt_term_cap(spark, xs_index, xs_df, xs_oracle):
    """max_terms truncates the tf*idf ranking, and the smaller query is
    still oracle-identical."""
    src = _SOURCES[0]
    terms = mlt_query_terms(xs_index, xs_df, *src, max_terms=5)
    assert len(terms) == 5
    toks = xs_oracle.tokens[src]
    idfs = {t: xs_oracle.idf(t) for t in set(toks)}
    assert terms == mlt_select_terms(toks, idfs, 5)
    got = _got(more_like_this(xs_index, xs_df, *src, k=10, max_terms=5))
    want = _want(oracle_more_like_this(xs_oracle, *src, 10, max_terms=5))
    assert got == want


def test_mlt_missing_turn_raises(spark, xs_index, xs_df):
    with pytest.raises(KeyError):
        mlt_query_terms(xs_index, xs_df, "conv-999999", 0)


def test_mlt_empty_turn_returns_empty(spark, xs_index, xs_df, xs_pdf):
    empties = xs_pdf[xs_pdf.text == ""]
    if empties.empty:
        pytest.skip("no empty turn at xs")
    src = (str(empties.iloc[0].conv_id), int(empties.iloc[0].turn_idx))
    out = more_like_this(xs_index, xs_df, *src, k=10)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["conv_id", "turn_idx", "score"]


def test_mlt_select_terms_tie_break():
    """Equal tf*idf → term ascending (deterministic across both sides)."""
    idf = {"b": 1.0, "a": 1.0, "c": 2.0}
    assert mlt_select_terms(["b", "a", "c"], idf, 3) == ["c", "a", "b"]
    assert mlt_select_terms(["b", "a", "c"], idf, 1) == ["c"]
