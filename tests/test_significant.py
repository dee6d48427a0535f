"""Significant terms (pipeline/significant.py) vs the pure-Python oracle.

ES significant_terms JLH semantics: per term of the matched turns,
(fg% - bg%) * (fg% / bg%) against the corpus background, positive scores
only, query terms excluded by default, (score desc, term asc) top-n.
"""

from __future__ import annotations

import pytest

from search_engine_spark.config import BuildConfig
from search_engine_spark.corpus import generate_transcripts
from search_engine_spark.index.build import build_index
from search_engine_spark.index.multi import MultiIndex
from search_engine_spark.index.reader import CompressedIndex
from search_engine_spark.oracle import build_oracle_index, oracle_significant_terms
from search_engine_spark.pipeline.significant import significant_terms

_QUERIES = [
    ("term0003 term0004", "conjunctive"),
    ("term0001", "disjunctive"),
    ('"phrase alpha beta"', "phrase"),
    ('"term0001" NOT "term0002"', "boolean"),
]


@pytest.fixture(scope="module")
def xs_pdf():
    return generate_transcripts("xs")


@pytest.fixture(scope="module")
def xs_df(spark, xs_pdf):
    return spark.createDataFrame(xs_pdf).cache()


@pytest.fixture(scope="module")
def xs_index(spark, xs_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sig") / "idx")
    build_index(spark, xs_df, out, BuildConfig(num_groups=2))
    return CompressedIndex(spark, out)


@pytest.fixture(scope="module")
def xs_multi(spark, xs_pdf, tmp_path_factory):
    d = tmp_path_factory.mktemp("sig_multi")
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
    return [(r.term, r.fg, r.bg, round(r.score, 9)) for r in df.collect()]


def _want(rows) -> list[tuple]:
    return [(t, f, b, round(s, 9)) for t, f, b, s in rows]


@pytest.mark.parametrize("q,m", _QUERIES)
def test_significant_matches_oracle(xs_index, xs_df, xs_oracle, q, m):
    got = _got(significant_terms(xs_index, xs_df, q, m, n=10))
    want = _want(oracle_significant_terms(xs_oracle, q, m, 10))
    assert got == want and got


def test_query_terms_excluded_by_default(xs_index, xs_df, xs_oracle):
    q, m = "term0003 term0004", "conjunctive"
    got = {r.term for r in significant_terms(xs_index, xs_df, q, m, n=50).collect()}
    assert not ({"term0003", "term0004"} & got)
    inc = _got(significant_terms(xs_index, xs_df, q, m, n=5, include_query_terms=True))
    want = _want(
        oracle_significant_terms(xs_oracle, q, m, 5, include_query_terms=True)
    )
    assert inc == want
    # conjunctive query terms are trivially significant: fg% = 1
    assert {t for t, _f, _b, _s in inc} >= {"term0003", "term0004"}


def test_multi_matches_single(xs_index, xs_multi, xs_df):
    q, m = "term0003 term0004", "conjunctive"
    assert _got(significant_terms(xs_multi, xs_df, q, m, n=10)) == _got(
        significant_terms(xs_index, xs_df, q, m, n=10)
    )


def test_empty_match_set(xs_index, xs_df):
    out = significant_terms(xs_index, xs_df, "zzzznotaterm", "disjunctive")
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["term", "fg", "bg", "score"]


def test_min_fg_floor(xs_index, xs_df, xs_oracle):
    q, m = '"phrase alpha beta"', "phrase"  # 2 matched docs at xs
    got = _got(significant_terms(xs_index, xs_df, q, m, n=50, min_fg=3))
    assert got == _want(oracle_significant_terms(xs_oracle, q, m, 50, min_fg=3))
    assert got == []  # nothing reaches fg >= 3 in a 2-doc match set
