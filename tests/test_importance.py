"""Importance-weighted scoring tests — Ranker1.java:333-336 semantics
(tf_norm·idf·ln(1+importance)) with the tag ladder mapped onto the
source column, checked against a straight-line Python computation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _ladder(src: str) -> int:
    """IndexerService.java:262-267 ladder keyed by source suffix % 5."""
    digits = "".join(ch for ch in src if ch.isdigit())
    if not digits or not src.endswith(digits):
        return 1
    return 10 - 2 * (int(digits) % 5)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark merge spark window pad", "src0"),   # imp 10
        (2, "spark merge spark window pad", "src4"),   # imp 2 — same text
        (3, "merge merge window other words", "src7"), # imp 6
        (4, "nothing relevant here at all", "src12"),  # imp 6, no terms
        (5, "spark", "metrics"),                       # non-numeric → imp 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_importance_for_source_ladder(spark, docs):
    from search_engine_spark.operators.importance import importance_for_source

    got = {
        r["source"]: r["imp"]
        for r in docs.select(
            "source", importance_for_source(F.col("source")).alias("imp")
        ).collect()
    }
    assert got == {"src0": 10.0, "src4": 2.0, "src7": 6.0, "src12": 6.0, "metrics": 1.0}
    for s in got:
        assert got[s] == float(_ladder(s))


def test_importance_overflow_suffix_falls_back_to_one(spark):
    """A numeric suffix overflowing INT must yield importance 1 (the
    oracle's TRY_CAST+COALESCE semantics), never NULL."""
    from search_engine_spark.operators.importance import importance_for_source

    df = spark.createDataFrame(
        [("src99999999999",), ("src2147483648",), ("src3",)], "source string"
    )
    got = {
        r["source"]: r["imp"]
        for r in df.select(
            "source", importance_for_source(F.col("source")).alias("imp")
        ).collect()
    }
    assert got["src99999999999"] == 1.0
    assert got["src2147483648"] == 1.0  # INT_MAX + 1
    assert got["src3"] == 4.0
    assert None not in got.values()


def test_importance_weighted_scores_match_reference_math(spark, docs):
    """Identical text, different sources: scores differ exactly by the
    ln(1+imp) ratio; absolute values match the straight-line formula."""
    from search_engine_spark.operators.importance import importance_weighted_scores

    terms = ["spark", "merge", "window"]
    rows = {r["doc_id"]: r["score"] for r in
            importance_weighted_scores(docs, terms).collect()}
    assert set(rows) == {1, 2, 3, 5}  # doc 4 has no query terms

    corpus = {r["doc_id"]: (r["text"].split(), r["source"]) for r in docs.collect()}
    n = len(corpus)
    df = {t: sum(1 for toks, _ in corpus.values() if t in toks) for t in terms}

    def expected(doc_id):
        toks, src = corpus[doc_id]
        dl = len(toks)
        s = 0.0
        for t in terms:
            tf = toks.count(t)
            if not tf:
                continue
            idf = math.log((1.0 + n) / (1.0 + df[t])) + 1.0
            s += (tf / dl) * idf * math.log(1.0 + _ladder(src))
        return s

    for d, got in rows.items():
        assert got == pytest.approx(expected(d), rel=1e-12)
    # ratio check: docs 1 and 2 share text; only importance differs
    assert rows[1] / rows[2] == pytest.approx(
        math.log(1 + 10) / math.log(1 + 2), rel=1e-12
    )


def test_importance_topk_ordering(spark, docs):
    from search_engine_spark.operators.importance import importance_weighted_topk

    top = importance_weighted_topk(docs, ["spark", "merge", "window"], k=3).collect()
    assert [r["doc_id"] for r in top][:2] == [1, 3] or top[0]["doc_id"] == 1
    assert top[0]["importance"] == 10
    scores = [r["score"] for r in top]
    assert scores == sorted(scores, reverse=True)
