"""Relevance-boost ladder tests — fixture docs engineered to hit each
tier of QueryService.calculateRelevanceScoreOptimized (:946-1088), with
expected values computed by an independent straight-line Python port of
the Java method."""

from __future__ import annotations

import math

import pytest


def java_ladder(doc: dict, terms: list[str], corpus: list[dict]) -> float:
    """Line-by-line port of QueryService.java:946-1088 (the reference
    semantics oracle for this test only)."""
    title = doc.get("title", "").lower()
    url = doc.get("url", "").lower()
    text = doc["text"].lower().strip()
    tokens = [t for t in text.split() if t]
    doc_len = len(tokens)
    if doc_len < 50:
        return 0.01
    sig = " ".join(terms).lower()
    if sig in title:
        return 1000.0
    if len(terms) > 1 and all(t.lower() in url for t in terms):
        return 500.0
    if all(t.lower() in title for t in terms):
        return 300.0
    total_docs = len(corpus)
    s = 0.0
    found = 0
    for t in terms:
        raw = tokens.count(t)
        if raw == 0:
            continue
        found += 1
        tf = min(raw / max(1, doc_len), 0.1)
        docs_with = sum(1 for d in corpus if t in _toks(d["text"]))
        if docs_with == 0:
            continue
        idf = math.log10(total_docs / docs_with)
        tfidf = tf * idf
        s += tfidf
        if t in title:
            s += tfidf * 3.0
        if t in url:
            s += tfidf * 2.0
    if found < len(terms) // 2:
        s *= 0.1
    if len(terms) > 1:
        if sig in text:
            s *= 3.0
        if sig in title:
            s *= 3.0
    return s


def _toks(text: str) -> list[str]:
    return [t for t in text.lower().strip().split() if t]


@pytest.fixture(scope="module")
def fixture_docs():
    filler = " ".join(f"filler{i}" for i in range(60))
    return [
        # tier: short doc → 0.01
        {"doc_id": 1, "title": "anything", "url": "x", "text": "too short alpha beta"},
        # tier: exact phrase in title → 1000
        {"doc_id": 2, "title": "about alpha beta things", "url": "x",
         "text": f"{filler} alpha"},
        # tier: all terms in url (multi-term) → 500
        {"doc_id": 3, "title": "no phrase here", "url": "site/alpha/beta",
         "text": f"{filler} alpha"},
        # tier: all terms in title, not as phrase → 300
        {"doc_id": 4, "title": "beta and then alpha", "url": "x",
         "text": f"{filler} alpha"},
        # tf-idf path: term hits + title/url per-term boosts
        {"doc_id": 5, "title": "alpha only", "url": "has/beta",
         "text": f"alpha alpha beta {filler}"},
        # tf-idf path with phrase-in-text ×3
        {"doc_id": 6, "title": "none", "url": "x",
         "text": f"alpha beta {filler}"},
        # no term hits → 0.0
        {"doc_id": 7, "title": "none", "url": "x", "text": filler},
    ]


def test_ladder_matches_java_port(spark, fixture_docs):
    from pyspark.sql import functions as F

    from search_engine_spark.operators.boosts import relevance_boost_scores

    terms = ["alpha", "beta"]
    df = spark.createDataFrame(
        fixture_docs, "doc_id long, title string, url string, text string"
    )
    got = {
        r["doc_id"]: r["boost_score"]
        for r in relevance_boost_scores(df, terms).collect()
    }
    for doc in fixture_docs:
        want = java_ladder(doc, terms, fixture_docs)
        assert got[doc["doc_id"]] == pytest.approx(want, abs=1e-12), (
            f"doc {doc['doc_id']}: got {got[doc['doc_id']]}, want {want}"
        )
    # each tier actually exercised
    assert got[1] == 0.01
    assert got[2] == 1000.0
    assert got[3] == 500.0
    assert got[4] == 300.0
    assert got[5] > 0.0 and got[5] < 300.0
    assert got[7] == 0.0


@pytest.mark.parametrize(
    "terms",
    [
        ["alpha", "alpha", "beta"],  # repeated term doubles its contribution
        ["alpha", "alpha"],  # raw size 2 activates the >1-term gates
    ],
)
def test_ladder_duplicate_terms_match_java_port(spark, fixture_docs, terms):
    """The reference keeps duplicate stemmedWords: dups enter the
    signature, the size()/2 threshold, the >1 gates, and the tf-idf sum
    (QueryService.java:973, :983, :1090-1096).  java_ladder iterates the
    raw list, so it is the dup-semantics oracle as-is."""
    from search_engine_spark.operators.boosts import relevance_boost_scores

    df = spark.createDataFrame(
        fixture_docs, "doc_id long, title string, url string, text string"
    )
    got = {
        r["doc_id"]: r["boost_score"]
        for r in relevance_boost_scores(df, terms).collect()
    }
    for doc in fixture_docs:
        want = java_ladder(doc, terms, fixture_docs)
        assert got[doc["doc_id"]] == pytest.approx(want, abs=1e-12), (
            f"doc {doc['doc_id']}: got {got[doc['doc_id']]}, want {want}"
        )


def test_boost_rerank_orders_by_ladder(spark, fixture_docs):
    from pyspark.sql import functions as F

    from search_engine_spark.operators.boosts import boost_rerank

    df = spark.createDataFrame(
        fixture_docs, "doc_id long, title string, url string, text string"
    )
    scored = df.select("doc_id", F.lit(1.0).alias("score"))
    out = [r["doc_id"] for r in boost_rerank(scored, df, ["alpha", "beta"]).collect()]
    # ladder ordering: 1000 (2), 500 (3), 300 (4), then tf-idf docs,
    # short doc (0.01) next-to-last, no-hit doc (0.0) last
    assert out[:3] == [2, 3, 4]
    assert out[-2:] == [1, 7]
