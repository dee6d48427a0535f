"""Corpus determinism + oracle sanity (SURVEY.md §5.2 M0)."""

from __future__ import annotations

import math

from search_engine_spark.corpus import PHRASE, REFERENCE_QUERIES, generate_transcripts
from search_engine_spark.oracle import (
    build_oracle_index,
    golden_stats,
    oracle_topk,
)


def test_corpus_deterministic(xs_corpus):
    again = generate_transcripts("xs")
    assert xs_corpus.equals(again)


def test_corpus_shape(sm_corpus):
    assert list(sm_corpus.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert len(sm_corpus) == 200 * 25
    assert sm_corpus["turn_idx"].dtype == "int32"
    # (conv_id, turn_idx) unique
    assert not sm_corpus.duplicated(["conv_id", "turn_idx"]).any()
    # ts strictly increasing in global turn order
    assert sm_corpus["ts"].is_monotonic_increasing
    # ~2% empty turns exist
    frac_empty = (sm_corpus["text"] == "").mean()
    assert 0.005 < frac_empty < 0.05
    # phrase injected
    assert sm_corpus["text"].str.contains(PHRASE).any()
    # tool only set for tool role
    has_tool = sm_corpus["tool"].notna()
    assert (sm_corpus.loc[has_tool, "role"] == "tool").all()


def test_corpus_zipf_skew(sm_corpus):
    # head term must be much more frequent than a mid-rank term
    joined = " ".join(sm_corpus["text"].tolist()).split()
    from collections import Counter

    c = Counter(joined)
    assert c["term0000"] > 20 * max(1, c.get("term0100", 1))


def test_oracle_index_basics(sm_oracle):
    stats = golden_stats(sm_oracle)
    assert stats["n_docs"] == 5000
    assert stats["avgdl"] > 0
    assert stats["n_terms"] > 1000
    # postings sorted by doc key per term
    plist = sm_oracle.postings["term0000"]
    keys = [k for k, _f, _p in plist]
    assert keys == sorted(keys)
    # df consistency
    assert sm_oracle.df("term0000") == len(plist)
    assert sm_oracle.idf("term0000") == math.log(5001 / (1 + len(plist))) + 1


def test_oracle_topk_properties(sm_oracle):
    res = oracle_topk(sm_oracle, "term0001 term0002", "disjunctive", 10)
    assert len(res) == 10
    scores = [s for _k, s in res]
    assert scores == sorted(scores, reverse=True)
    # absent term -> empty
    assert oracle_topk(sm_oracle, "zzzznotacorpusword", "disjunctive", 10) == []
    # stopword-only -> empty (all dropped at query analysis)
    assert oracle_topk(sm_oracle, "the of", "disjunctive", 10) == []
    # conjunctive result docs contain all terms
    res = oracle_topk(sm_oracle, "term0000 term0007", "conjunctive", 10)
    for (key, _s) in res:
        terms = set(sm_oracle.tokens[key])
        assert "term0000" in terms and "term0007" in terms


def test_oracle_phrase(sm_oracle):
    res = oracle_topk(sm_oracle, '"phrase alpha beta"', "phrase", 10)
    assert res, "injected phrase must match"
    for key, _s in res:
        toks = sm_oracle.tokens[key]
        found = any(
            toks[i : i + 3] == ["phrase", "alpha", "beta"] for i in range(len(toks) - 2)
        )
        assert found


def test_oracle_boolean(sm_oracle):
    a = {k for k, _ in oracle_topk(sm_oracle, '"term0000" OR "term0001"', "boolean", 10**9)}
    n = {k for k, _ in oracle_topk(sm_oracle, '"term0000" NOT "term0001"', "boolean", 10**9)}
    both = {k for k, _ in oracle_topk(sm_oracle, '"term0000" AND "term0001"', "boolean", 10**9)}
    assert n.isdisjoint(both)
    assert both <= a and n <= a


def test_all_reference_queries_run(sm_oracle):
    nonempty = 0
    for q in REFERENCE_QUERIES:
        res = oracle_topk(sm_oracle, q["query_text"], q["mode"], q["k"])
        nonempty += bool(res)
    assert nonempty >= 20  # most queries hit the corpus
