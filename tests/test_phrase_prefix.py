"""Phrase-prefix queries (ES match_phrase_prefix) vs the pure-Python
oracle.

``"incid resp*"``: the LAST phrase token carries one trailing ``*``,
expanded against the post-stem vocabulary (df desc / term asc,
PREFIX_CAP bound); candidates are the union over variants v of docs
where the phrase ``fixed + v`` occurs; BM25 over fixed terms + all
expanded variants scores the match set.  Resolution happens on the
reader (one idf-table TakeOrdered — kernels have no vocabulary access
and fail loud on an unresolved marker); MultiIndex resolves over the
UNION vocabulary so a variant present only in a newer segment still
matches everywhere.
"""

from __future__ import annotations

import pytest

from search_engine_spark.config import BuildConfig
from search_engine_spark.corpus import generate_transcripts
from search_engine_spark.index.build import build_index
from search_engine_spark.index.multi import MultiIndex
from search_engine_spark.index.reader import CompressedIndex, parse_query
from search_engine_spark.oracle import (
    build_oracle_index,
    oracle_matches,
    oracle_topk,
    split_phrase_prefix,
)


@pytest.fixture(scope="module")
def xs_pdf():
    return generate_transcripts("xs")


@pytest.fixture(scope="module")
def xs_index(spark, xs_pdf, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pprefix") / "idx")
    build_index(spark, spark.createDataFrame(xs_pdf), out, BuildConfig(num_groups=2))
    return CompressedIndex(spark, out)


@pytest.fixture(scope="module")
def xs_oracle(xs_pdf):
    return build_oracle_index(xs_pdf)


def _rows(df) -> list[tuple]:
    return [(r.conv_id, r.turn_idx, round(r.score, 9)) for r in df.collect()]


_QUERIES = [
    '"public term000*"',      # fixed + prefix
    '"term0001 term00*"',     # wide expansion (PREFIX_CAP binds)
    '"cour*"',                # prefix-only phrase (no fixed part)
    '"public zzz*"',          # empty expansion -> no matches
    '"term0001 term00*"~2',   # composes with slop
]


def test_split_phrase_prefix():
    assert split_phrase_prefix("incid resp") == ("incid resp", None)
    assert split_phrase_prefix("incid Resp*") == ("incid", "resp")
    assert split_phrase_prefix("resp*") == ("", "resp")
    # only the LAST token may carry the marker; inner stars pass through
    assert split_phrase_prefix("a* b") == ("a* b", None)


def test_parse_stores_marker():
    spec = parse_query('"public resp*"', "phrase")
    assert spec.phrase_prefix == "resp"
    assert spec.phrase_a == ["public"]
    assert parse_query('"public respond"', "phrase").phrase_prefix is None


@pytest.mark.parametrize("q", _QUERIES)
def test_topk_and_count_match_oracle(xs_index, xs_oracle, q):
    got = _rows(xs_index.topk(q, "phrase", 10))
    want = [
        (c, t, round(s, 9)) for (c, t), s in oracle_topk(xs_oracle, q, "phrase", 10)
    ]
    assert got == want, q
    assert xs_index.match_count(q, "phrase") == len(
        oracle_matches(xs_oracle, q, "phrase")
    ), q


def test_batch_includes_phrase_prefix(xs_index, xs_oracle):
    """The batched path resolves specs like the per-query path."""
    queries = [('"public term000*"', "phrase"), ("term0001", "disjunctive")]
    rows = xs_index.topk_batch(queries, k=10).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(
            (r.conv_id, r.turn_idx, round(r.score, 9))
        )
    want0 = [
        (c, t, round(s, 9))
        for (c, t), s in oracle_topk(xs_oracle, '"public term000*"', "phrase", 10)
    ]
    assert by_q.get(0, []) == want0


def test_multi_index_union_vocabulary(spark, xs_pdf, xs_oracle, tmp_path):
    """Segment-split corpus: phrase-prefix results equal the fresh
    single-index build (variants resolved over the union vocabulary)."""
    half = xs_pdf[xs_pdf["conv_id"] < "conv-000015"].reset_index(drop=True)
    rest = xs_pdf[xs_pdf["conv_id"] >= "conv-000015"].reset_index(drop=True)
    base, seg = str(tmp_path / "base"), str(tmp_path / "seg")
    build_index(spark, spark.createDataFrame(half), base, BuildConfig(num_groups=2))
    build_index(spark, spark.createDataFrame(rest), seg, BuildConfig(num_groups=2))
    multi = MultiIndex(spark, [base, seg])
    for q in ['"public term000*"', '"cour*"']:
        got = _rows(multi.topk(q, "phrase", 10))
        want = [
            (c, t, round(s, 9))
            for (c, t), s in oracle_topk(xs_oracle, q, "phrase", 10)
        ]
        assert got == want, q


def test_percolate_rejects_phrase_prefix():
    from search_engine_spark.operators.percolate import register

    with pytest.raises(ValueError, match="not .*percolatable"):
        register([("q1", '"public resp*"', "phrase")])
