"""Top hits per bucket (pipeline/tophits.py) vs the pure-Python oracle.

ES terms+top_hits semantics: within each value of a metadata column the
matching turns rank by (score desc, conv_id, turn_idx) and the best k
emit; buckets ascend.  Scores come from the exhaustive-scoring kernel,
so every row's score equals the global topk score for that turn.
"""

from __future__ import annotations

import pytest

from search_engine_spark.config import BuildConfig
from search_engine_spark.corpus import generate_transcripts
from search_engine_spark.index.build import build_index
from search_engine_spark.index.reader import CompressedIndex
from search_engine_spark.oracle import build_oracle_index, oracle_top_hits_by
from search_engine_spark.pipeline.tophits import top_hits_by

_CASES = [
    ("term0001 term0002", "disjunctive", "role", 3),
    ("term0003 term0004", "conjunctive", "role", 2),
    ('"phrase alpha beta"', "phrase", "role", 3),
    ("term0001", "disjunctive", "tool", 2),  # nullable bucket column
]


@pytest.fixture(scope="module")
def xs_pdf():
    return generate_transcripts("xs")


@pytest.fixture(scope="module")
def xs_df(spark, xs_pdf):
    return spark.createDataFrame(xs_pdf).cache()


@pytest.fixture(scope="module")
def xs_index(spark, xs_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("th") / "idx")
    build_index(spark, xs_df, out, BuildConfig(num_groups=2))
    return CompressedIndex(spark, out)


@pytest.fixture(scope="module")
def xs_oracle(xs_pdf):
    return build_oracle_index(xs_pdf)


def _norm_bucket(v):
    return None if v is None or (isinstance(v, float) and v != v) else v


@pytest.mark.parametrize("q,m,by,k", _CASES)
def test_top_hits_matches_oracle(xs_index, xs_df, xs_pdf, xs_oracle, q, m, by, k):
    got = [
        (_norm_bucket(r[by]), r["rank"], r.conv_id, r.turn_idx, round(r.score, 9))
        for r in top_hits_by(xs_index, xs_df, q, by, m, k).collect()
    ]
    want = [
        (_norm_bucket(b), rk, c, t, round(s, 9))
        for b, rk, c, t, s in oracle_top_hits_by(xs_oracle, xs_pdf, q, by, m, k)
    ]
    # a null bucket sorts differently between engines; compare as sets of
    # per-bucket sequences (order WITHIN a bucket is part of the contract)
    def by_bucket(rows):
        out = {}
        for b, rk, c, t, s in rows:
            out.setdefault(b, []).append((rk, c, t, s))
        return out

    assert by_bucket(got) == by_bucket(want) and got


def test_rank1_equals_global_best_per_bucket(xs_index, xs_df):
    """Each bucket's rank-1 row carries the same score the global topk
    assigns that turn (exhaustive kernel, no rescoring drift)."""
    q = "term0001 term0002"
    hits = {
        (r.conv_id, r.turn_idx): round(r.score, 9)
        for r in xs_index.topk(q, "disjunctive", 1000).collect()
    }
    for r in top_hits_by(xs_index, xs_df, q, "role", "disjunctive", 1).collect():
        assert hits[(r.conv_id, r.turn_idx)] == round(r.score, 9)


def test_empty_match_set(xs_index, xs_df):
    out = top_hits_by(xs_index, xs_df, "zzzznotaterm", "role")
    assert out.count() == 0
