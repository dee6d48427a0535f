"""Date histogram (pipeline/histogram.py) vs the pure-Python oracle.

ES date_histogram semantics with min_doc_count=1: the match set bucketed
by a calendar interval of ts, non-empty buckets only, ascending.
"""

from __future__ import annotations

import pytest

from search_engine_spark.config import BuildConfig
from search_engine_spark.corpus import generate_transcripts
from search_engine_spark.index.build import build_index
from search_engine_spark.index.reader import CompressedIndex
from search_engine_spark.oracle import build_oracle_index, oracle_date_histogram
from search_engine_spark.pipeline.histogram import date_histogram

_CASES = [
    ("term0001", "disjunctive", "minute"),
    ("term0001", "disjunctive", "hour"),
    ("term0003 term0004", "conjunctive", "hour"),
    ('"phrase alpha beta"', "phrase", "day"),
    ("term0001", "disjunctive", "month"),
]


@pytest.fixture(scope="module")
def xs_pdf():
    return generate_transcripts("xs")


@pytest.fixture(scope="module")
def xs_df(spark, xs_pdf):
    return spark.createDataFrame(xs_pdf).cache()


@pytest.fixture(scope="module")
def xs_index(spark, xs_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("hist") / "idx")
    build_index(spark, xs_df, out, BuildConfig(num_groups=2))
    return CompressedIndex(spark, out)


@pytest.fixture(scope="module")
def xs_oracle(xs_pdf):
    return build_oracle_index(xs_pdf)


@pytest.mark.parametrize("q,m,iv", _CASES)
def test_histogram_matches_oracle(xs_index, xs_df, xs_pdf, xs_oracle, q, m, iv):
    got = [
        (str(r.bucket), r.n)
        for r in date_histogram(xs_index, xs_df, q, m, iv).collect()
    ]
    want = [(str(b), n) for b, n in oracle_date_histogram(xs_oracle, xs_pdf, q, m, iv)]
    assert got == want and got
    # total across buckets == the match count (nothing lost to bucketing)
    assert sum(n for _b, n in got) == xs_index.match_count(q, m)


def test_histogram_empty_and_bad_interval(xs_index, xs_df):
    assert date_histogram(xs_index, xs_df, "zzzznotaterm").count() == 0
    with pytest.raises(ValueError):
        date_histogram(xs_index, xs_df, "term0001", interval="fortnight")


def test_histogram_null_ts_bucket(spark, xs_index, xs_pdf, xs_oracle):
    """A matching turn with ts=NULL lands in a NULL bucket FIRST on the
    engine side (date_trunc(NULL)=NULL, nulls-first asc); the oracle
    counts it identically instead of silently dropping NaT."""
    import pandas as pd

    nulled = xs_pdf.copy()
    nulled.loc[nulled.index[:5], "ts"] = pd.NaT  # first conv's turns 0-4
    df = spark.createDataFrame(nulled)
    q, m = "term0001", "disjunctive"
    got = [
        (None if r.bucket is None else str(r.bucket), r.n)
        for r in date_histogram(xs_index, df, q, m, "hour").collect()
    ]
    want = [
        (None if b is None else str(b), n)
        for b, n in oracle_date_histogram(xs_oracle, nulled, q, m, "hour")
    ]
    assert got == want
    if any(b is None for b, _n in want):  # first conv matched the query
        assert got[0][0] is None


# -- ES pipeline aggregations over the histogram ----------------------

from search_engine_spark.oracle import oracle_date_histogram_pipeline  # noqa: E402
from search_engine_spark.pipeline.histogram import (  # noqa: E402
    date_histogram_pipeline,
)

_PIPE_CASES = [
    ("term0001", "disjunctive", "minute", 3, 1),
    ("term0001", "disjunctive", "minute", 3, 0),
    ("term0003 term0004", "conjunctive", "minute", 5, 0),
    ("term0003 term0004", "conjunctive", "hour", 1, 0),
    ('"phrase alpha beta"', "phrase", "day", 2, 0),
    ("term0001", "disjunctive", "month", 3, 0),
]


@pytest.mark.parametrize("q,m,iv,w,mdc", _PIPE_CASES)
def test_pipeline_matches_oracle(xs_index, xs_df, xs_pdf, xs_oracle, q, m, iv, w, mdc):
    got = [
        (str(r.bucket), r.n, r.cumulative_sum, r.derivative, r.moving_avg)
        for r in date_histogram_pipeline(
            xs_index, xs_df, q, m, iv, window=w, min_doc_count=mdc
        ).collect()
    ]
    want = [
        (str(b), n, c, d, ma)
        for b, n, c, d, ma in oracle_date_histogram_pipeline(
            xs_oracle, xs_pdf, q, m, iv, w, mdc
        )
    ]
    assert got == want and got


def test_pipeline_invariants(xs_index, xs_df):
    rows = date_histogram_pipeline(
        xs_index, xs_df, "term0001", "disjunctive", "minute",
        window=3, min_doc_count=0,
    ).collect()
    # first bucket has no derivative; every later one is the n delta
    assert rows[0].derivative is None
    for prev, cur in zip(rows, rows[1:]):
        assert cur.derivative == cur.n - prev.n
        assert cur.cumulative_sum == prev.cumulative_sum + cur.n
    # the running total ends at the match count (nothing lost)
    assert rows[-1].cumulative_sum == xs_index.match_count("term0001")
    # gap-filled grid is contiguous minutes
    import datetime as dt

    for prev, cur in zip(rows, rows[1:]):
        assert cur.bucket - prev.bucket == dt.timedelta(minutes=1)


def test_pipeline_window_one_is_identity(xs_index, xs_df):
    rows = date_histogram_pipeline(
        xs_index, xs_df, "term0001", "disjunctive", "minute",
        window=1, min_doc_count=1,
    ).collect()
    for r in rows:
        assert r.moving_avg == pytest.approx(float(r.n), abs=1e-9)


def test_pipeline_validation_and_empty(xs_index, xs_df):
    with pytest.raises(ValueError, match="window"):
        date_histogram_pipeline(xs_index, xs_df, "term0001", window=0)
    with pytest.raises(ValueError, match="min_doc_count"):
        date_histogram_pipeline(xs_index, xs_df, "term0001", min_doc_count=2)
    assert (
        date_histogram_pipeline(
            xs_index, xs_df, "zzznomatchterm", min_doc_count=0
        ).count()
        == 0
    )
