"""Match-set metric aggregations (pipeline/aggs.py) vs the pure-Python
oracle: ES ``cardinality`` (exact + HLL++ approx) and ``stats``.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import BuildConfig
from search_engine_spark.corpus import generate_transcripts
from search_engine_spark.index.build import build_index
from search_engine_spark.index.reader import CompressedIndex
from search_engine_spark.oracle import (
    build_oracle_index,
    oracle_cardinality,
    oracle_match_stats,
)
from search_engine_spark.pipeline.aggs import cardinality, match_stats

_QUERIES = [
    ("term0001", "disjunctive"),
    ("term0003 term0004", "conjunctive"),
    ('"phrase alpha beta"', "phrase"),
    ("term0001 term0002", "disjunctive"),
]


@pytest.fixture(scope="module")
def xs_pdf():
    return generate_transcripts("xs")


@pytest.fixture(scope="module")
def xs_df(spark, xs_pdf):
    return spark.createDataFrame(xs_pdf).cache()


@pytest.fixture(scope="module")
def xs_index(spark, xs_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("aggs") / "idx")
    build_index(spark, xs_df, out, BuildConfig(num_groups=2))
    return CompressedIndex(spark, out)


@pytest.fixture(scope="module")
def xs_oracle(xs_pdf):
    return build_oracle_index(xs_pdf)


@pytest.mark.parametrize("q,m", _QUERIES)
@pytest.mark.parametrize("col", ["conv_id", "role"])
def test_cardinality_matches_oracle(xs_index, xs_df, xs_pdf, xs_oracle, q, m, col):
    got = cardinality(xs_index, xs_df, q, col, m).collect()[0].value
    assert got == oracle_cardinality(xs_oracle, xs_pdf, q, m, col)


def test_cardinality_approx_within_rsd(xs_index, xs_df, xs_pdf, xs_oracle):
    q, m = "term0001 term0002", "disjunctive"
    exact = oracle_cardinality(xs_oracle, xs_pdf, q, m, "conv_id")
    approx = cardinality(
        xs_index, xs_df, q, "conv_id", m, approx=True, rsd=0.05
    ).collect()[0].value
    assert exact > 0
    # HLL++ at rsd=0.05: allow a generous 3-sigma band
    assert abs(approx - exact) <= max(2, 0.15 * exact)


def test_cardinality_scoped(xs_index, xs_df, xs_pdf, xs_oracle):
    """Scope composes: cardinality over the role-filtered match set."""
    q, m = "term0001 term0002", "disjunctive"
    scope_df = xs_df.filter("role = 'assistant'")
    got = cardinality(xs_index, xs_df, q, "conv_id", m, scope=scope_df).collect()[0].value
    sub = xs_pdf[xs_pdf.role == "assistant"]
    # oracle over the scoped match set: intersect matches with scope keys
    from search_engine_spark.oracle import oracle_matches

    keys = oracle_matches(
        xs_oracle, q, m, scope=set(zip(sub.conv_id, sub.turn_idx))
    )
    assert got == len({c for c, _t in keys})


@pytest.mark.parametrize("q,m", _QUERIES)
def test_match_stats_matches_oracle(xs_index, xs_df, xs_pdf, xs_oracle, q, m):
    row = match_stats(xs_index, xs_df, q, "chars", m).collect()[0]
    want = oracle_match_stats(xs_oracle, xs_pdf, q, m, "chars")
    assert row["count"] == want["count"]
    assert row["min"] == want["min"]
    assert row["max"] == want["max"]
    assert row["sum"] == want["sum"]
    assert row["avg"] == pytest.approx(want["avg"], abs=2e-5)


def test_match_stats_turn_idx_field(xs_index, xs_df, xs_pdf, xs_oracle):
    q, m = "term0003 term0004", "disjunctive"
    row = match_stats(xs_index, xs_df, q, "turn_idx", m).collect()[0]
    want = oracle_match_stats(xs_oracle, xs_pdf, q, m, "turn_idx")
    assert (row["count"], row["min"], row["max"], row["sum"]) == (
        want["count"], want["min"], want["max"], want["sum"],
    )


def test_match_stats_empty_match_set(xs_index, xs_df):
    row = match_stats(xs_index, xs_df, "zzznoterm", "chars").collect()[0]
    assert row["count"] == 0
    assert row["min"] is None and row["max"] is None
    assert row["avg"] is None and row["sum"] is None


def test_unknown_stats_field_rejected(xs_index, xs_df):
    with pytest.raises(ValueError):
        match_stats(xs_index, xs_df, "term0001", "no_such_field")
