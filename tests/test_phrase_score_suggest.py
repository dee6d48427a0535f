"""Phrase doc-score ladder + suggested-queries tests, each checked
against a straight-line Python port of the reference method."""

from __future__ import annotations

import math

import pytest


# ------------------------------------------------------- phrase ladder


def java_phrase_score(doc: dict, phrase: str, first_para_tokens: int = 50):
    """Port of PhraseSearching.calculateDocumentScore (:178-213) with
    the repo's transcript analogs (first paragraph = first N tokens)."""
    p = phrase.lower()
    txt = doc["text"].lower().strip()
    title = (doc.get("title") or "").lower()
    url = (doc.get("url") or "").lower()
    score = 1.0
    if p in title:
        score *= 3.0
    # countOccurrences (:218-226): non-overlapping indexOf loop
    cnt, i = 0, 0
    while (i := txt.find(p, i)) != -1:
        cnt += 1
        i += len(p)
    if cnt > 1:
        score *= 1.0 + math.log(cnt)
    first_para = " ".join(txt.split()[:first_para_tokens])
    if p in first_para:
        score *= 1.5
    if p.replace(" ", "-") in url:
        score *= 2.0
    return cnt, score


@pytest.fixture(scope="module")
def phrase_docs():
    pad = " ".join(f"pad{i}" for i in range(60))
    return [
        # phrase in title + first para + multiple occurrences
        {"doc_id": 1, "title": "about alpha beta stuff", "url": "x",
         "text": f"alpha beta starts here {pad} alpha beta again alpha beta"},
        # single occurrence, deep in the text (past the first 50 tokens)
        {"doc_id": 2, "title": "no hit", "url": "x",
         "text": f"{pad} alpha beta at the end"},
        # dashed-url boost
        {"doc_id": 3, "title": "none", "url": "site/alpha-beta/page",
         "text": f"alpha beta once {pad}"},
        # two occurrences, no field boosts
        {"doc_id": 4, "title": "none", "url": "x",
         "text": f"{pad} alpha beta {pad} alpha beta"},
    ]


def test_phrase_score_matches_java_port(spark, phrase_docs):
    from search_engine_spark.operators.phrase_score import phrase_doc_scores

    df = spark.createDataFrame(
        phrase_docs, "doc_id long, title string, url string, text string"
    )
    got = {
        r["doc_id"]: (r["n_occurrences"], r["phrase_score"])
        for r in phrase_doc_scores(df, "alpha beta").collect()
    }
    for d in phrase_docs:
        cnt, want = java_phrase_score(d, "alpha beta")
        g_cnt, g_score = got[d["doc_id"]]
        assert g_cnt == cnt, f"doc {d['doc_id']} count"
        assert g_score == pytest.approx(want, abs=1e-6), f"doc {d['doc_id']}"
    # branch coverage: title+para+multi (1), bare single (2), url (3), multi (4)
    assert got[1][1] == pytest.approx(3.0 * (1 + math.log(3)) * 1.5, abs=1e-6)
    assert got[2][1] == 1.0
    assert got[3][1] == pytest.approx(2.0 * 1.5, abs=1e-6)
    assert got[4][1] == pytest.approx(1 + math.log(2), abs=1e-6)


def test_phrase_score_nonoverlapping_count(spark):
    """'aa aa aa' contains 'aa aa' twice overlapping but once by the
    reference's indexOf+len skip."""
    from search_engine_spark.operators.phrase_score import phrase_doc_scores

    df = spark.createDataFrame([(1, "t", "u", "aa aa aa")],
                               "doc_id long, title string, url string, text string")
    r = phrase_doc_scores(df, "aa aa").collect()[0]
    assert r["n_occurrences"] == 1


# --------------------------------------------------- suggested queries


def test_suggested_queries_matches_reference_semantics():
    from search_engine_spark.operators.suggest import suggested_queries

    titles = [
        "Spark Streaming Deep Dive",
        "Structured Streaming internals",
        "the and for with",          # all stopwords/short
        None,
        "Watermark semantics guide",
        "IGNORED sixth title",       # beyond the 5-title cap
    ]
    got = suggested_queries("spark streaming", titles, stopwords=frozenset({"the", "and", "for", "with"}))
    # significant terms: deep, dive, structured, internals, watermark,
    # semantics, guide ('spark'/'streaming' are substrings of the query)
    want_pool = set()
    for t in ["deep", "dive", "structured", "internals", "watermark", "semantics", "guide"]:
        want_pool.add(f"spark streaming {t}")
        want_pool.add(f"{t} streaming")
    assert set(got) <= want_pool
    assert got == sorted(got)
    assert len(got) == 5  # capped


def test_suggested_queries_single_word_query():
    from search_engine_spark.operators.suggest import suggested_queries

    got = suggested_queries("spark", ["Tuning Guide"], stopwords=frozenset())
    # no second word → only the append form
    assert got == ["spark guide", "spark tuning"]


def test_suggested_queries_term_already_in_query_skipped():
    from search_engine_spark.operators.suggest import suggested_queries

    # 'streaming' is a substring of the query → no suggestion from it
    got = suggested_queries("spark streaming", ["Streaming Only Title"],
                            stopwords=frozenset())
    assert got == ["only streaming", "spark streaming only", "spark streaming title",
                   "title streaming"]


def test_cli_analyze_emits_suggestions(capsys):
    import json

    from search_engine_spark.cli import main

    main(["analyze", "--query", "spark streaming", "--titles",
          "Watermark Guide", "Structured Internals"])
    out = json.loads(capsys.readouterr().out)
    assert "suggested_queries" in out
    assert out["suggested_queries"] == sorted(out["suggested_queries"])
    assert all("spark" in s or "streaming" in s for s in out["suggested_queries"])
