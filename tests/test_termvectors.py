"""Term vectors (operators/termvectors.py, the ES _termvectors analog)
vs the pure-Python oracle.

The operator re-analyzes the target doc and joins live index stats
(the ES on-the-fly contract); the oracle reads tf/positions from its
OWN posting lists (built by its independent indexing loop), so the two
paths only agree if analysis, position space, df, and idf all match.
Covered: several docs incl. an empty-text turn, a missing doc, the
segmented MultiIndex (merged stats), and a transcript fresher than the
index (absent-term df=0 contract).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import BuildConfig
from search_engine_spark.corpus import generate_transcripts
from search_engine_spark.index.build import build_index
from search_engine_spark.index.multi import MultiIndex
from search_engine_spark.index.reader import CompressedIndex
from search_engine_spark.operators.termvectors import term_vectors
from search_engine_spark.oracle import build_oracle_index, oracle_term_vectors


@pytest.fixture(scope="module")
def xs_pdf():
    return generate_transcripts("xs")


@pytest.fixture(scope="module")
def xs_df(spark, xs_pdf):
    return spark.createDataFrame(xs_pdf).cache()


@pytest.fixture(scope="module")
def xs_index(spark, xs_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tv") / "idx")
    build_index(spark, xs_df, out, BuildConfig(num_groups=2))
    return CompressedIndex(spark, out)


@pytest.fixture(scope="module")
def xs_oracle(xs_pdf):
    return build_oracle_index(xs_pdf)


def _rows(df) -> list[tuple]:
    return [
        (r.term, r.tf, r.positions, r.df, round(r.idf, 9), r.doc_count)
        for r in df.collect()
    ]


def _want(oracle, conv, turn) -> list[tuple]:
    return [
        (t, f, ps, d, round(i, 9), n)
        for (t, f, ps, d, i, n) in oracle_term_vectors(oracle, conv, turn)
    ]


@pytest.mark.parametrize(
    "conv,turn",
    [("conv-000000", 0), ("conv-000003", 2), ("conv-000011", 4)],
)
def test_parity(xs_index, xs_df, xs_oracle, conv, turn):
    got = _rows(term_vectors(xs_index, xs_df, conv, turn))
    assert got == _want(xs_oracle, conv, turn)
    assert len(got) > 0


def test_empty_text_doc(xs_index, xs_df, xs_oracle, xs_pdf):
    """The xs corpus plants ~2% empty turns; their term vector is empty
    but well-formed on both paths."""
    empties = xs_pdf[xs_pdf.text == ""]
    assert len(empties) > 0
    r = empties.iloc[0]
    got = _rows(term_vectors(xs_index, xs_df, r.conv_id, int(r.turn_idx)))
    assert got == _want(xs_oracle, r.conv_id, int(r.turn_idx)) == []


def test_missing_doc(xs_index, xs_df):
    df = term_vectors(xs_index, xs_df, "conv-999999", 0)
    assert df.collect() == []
    assert [f.name for f in df.schema.fields] == [
        "term", "tf", "positions", "df", "idf", "doc_count",
    ]


def test_multi_index_merged_stats(spark, xs_df, xs_pdf, xs_oracle, tmp_path_factory):
    """Term vectors over a base+delta MultiIndex report the MERGED
    corpus stats — identical to the single full-corpus index."""
    d = tmp_path_factory.mktemp("tv_multi")
    convs = sorted(xs_pdf.conv_id.unique())
    half = set(convs[: len(convs) // 2])
    base_df = xs_df.filter(F.col("conv_id").isin(half))
    delta_df = xs_df.filter(~F.col("conv_id").isin(half))
    build_index(spark, base_df, str(d / "base"), BuildConfig(num_groups=2))
    build_index(spark, delta_df, str(d / "delta"), BuildConfig(num_groups=2))
    multi = MultiIndex(spark, [str(d / "base"), str(d / "delta")])
    got = _rows(term_vectors(multi, xs_df, "conv-000003", 2))
    assert got == _want(xs_oracle, "conv-000003", 2)


def test_fresh_doc_absent_terms(spark, xs_index, xs_df):
    """A transcript table fresher than the index: terms the index never
    saw report df=0 with the absent-term idf (the scorer's contract),
    never an error."""
    import math

    fresh = xs_df.unionByName(
        spark.createDataFrame(
            [("conv-zzz", 0, "user", "zzqbrandnewterm zzqbrandnewterm", None, None)],
            xs_df.schema,
        )
    )
    got = _rows(term_vectors(xs_index, fresh, "conv-zzz", 0))
    absent_idf = round(math.log((1.0 + xs_index.n_docs) / 1.0) + 1.0, 9)
    assert got == [
        ("zzqbrandnewterm", 2, "0,1", 0, absent_idf, xs_index.n_docs)
    ]
