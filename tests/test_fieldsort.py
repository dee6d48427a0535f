"""Field-sorted retrieval (operators/fieldsort.py) vs the oracle.

ES ``sort`` semantics: order by a metadata field, missing values last
in either direction, (conv_id, turn_idx) tie-break, no scores.
"""

from __future__ import annotations

import pandas as pd
import pytest

from search_engine_spark.config import BuildConfig
from search_engine_spark.corpus import generate_transcripts
from search_engine_spark.index.build import build_index
from search_engine_spark.index.reader import CompressedIndex
from search_engine_spark.operators.fieldsort import topk_by_field
from search_engine_spark.oracle import build_oracle_index, oracle_topk_by_field

_CASES = [
    ("term0001 term0002", "disjunctive", False),
    ("term0001 term0002", "disjunctive", True),
    ("term0003 term0004", "conjunctive", False),
    ('"phrase alpha beta"', "phrase", False),
    ('"alpha" AND "beta"', "boolean", True),
]


@pytest.fixture(scope="module")
def xs_pdf():
    """xs corpus with a couple of NULL ts rows — the ES missing-last
    path needs real missing values, which the stock corpus lacks."""
    pdf = generate_transcripts("xs").copy()
    pdf.loc[pdf.index[3], "ts"] = pd.NaT
    pdf.loc[pdf.index[11], "ts"] = pd.NaT
    return pdf


@pytest.fixture(scope="module")
def xs_df(spark, xs_pdf):
    return spark.createDataFrame(xs_pdf).cache()


@pytest.fixture(scope="module")
def xs_index(spark, xs_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fsort") / "idx")
    build_index(spark, xs_df, out, BuildConfig(num_groups=2))
    return CompressedIndex(spark, out)


@pytest.fixture(scope="module")
def xs_oracle(xs_pdf):
    return build_oracle_index(xs_pdf)


@pytest.mark.parametrize("q,m,asc", _CASES)
def test_matches_oracle(xs_index, xs_df, xs_pdf, xs_oracle, q, m, asc):
    got = [
        (r.conv_id, r.turn_idx)
        for r in topk_by_field(xs_index, xs_df, q, "ts", asc, 10, m).collect()
    ]
    want = oracle_topk_by_field(xs_oracle, xs_pdf, q, "ts", asc, 10, m)
    assert got == want and got


def test_missing_ts_sorts_last_both_directions(xs_index, xs_df, xs_pdf, xs_oracle):
    """Deep page (k = all matches): NULL-ts matches appear, and only at
    the very end, for BOTH directions — the ES `missing: _last`
    contract Spark's asc default would violate."""
    null_keys = {
        (str(c), int(t))
        for c, t, v in zip(xs_pdf["conv_id"], xs_pdf["turn_idx"], xs_pdf["ts"])
        if pd.isna(v)
    }
    q = "term0001 term0002 term0003 term0004"
    for asc in (True, False):
        rows = topk_by_field(xs_index, xs_df, q, "ts", asc, 1000).collect()
        keys = [(r.conv_id, r.turn_idx) for r in rows]
        nulls_in = [k in null_keys for k in keys]
        if any(nulls_in):
            first_null = nulls_in.index(True)
            assert all(nulls_in[first_null:]), asc
        assert keys == oracle_topk_by_field(
            xs_oracle, xs_pdf, q, "ts", asc, 1000
        )


def test_turn_idx_sort_and_min_match(xs_index, xs_df, xs_pdf, xs_oracle):
    got = [
        (r.conv_id, r.turn_idx)
        for r in topk_by_field(
            xs_index, xs_df, "term0001 term0002", "turn_idx", True, 10,
            min_match=2,
        ).collect()
    ]
    want = oracle_topk_by_field(
        xs_oracle, xs_pdf, "term0001 term0002", "turn_idx", True, 10,
        min_match=2,
    )
    assert got == want


def test_composes_with_tombstones(xs_index, xs_df):
    full = topk_by_field(xs_index, xs_df, "term0001", "ts", False, 5).collect()
    top = (full[0].conv_id, full[0].turn_idx)
    rest = [
        (r.conv_id, r.turn_idx)
        for r in topk_by_field(
            xs_index, xs_df, "term0001", "ts", False, 4, tombstones=[top]
        ).collect()
    ]
    assert rest == [(r.conv_id, r.turn_idx) for r in full[1:5]]


def test_empty_query_and_no_matches(xs_index, xs_df):
    assert topk_by_field(xs_index, xs_df, "zzznomatch", "ts").count() == 0
