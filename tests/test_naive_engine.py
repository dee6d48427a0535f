"""M1 golden tests: Spark naive engine vs pure-Python oracle (SURVEY.md §5.2)."""

from __future__ import annotations

import pytest

from search_engine_spark.corpus import REFERENCE_QUERIES
from search_engine_spark.oracle import oracle_topk


@pytest.fixture(scope="module")
def flat_index(spark, sm_parquet):
    from search_engine_spark.operators.naive_query import FlatIndex

    transcripts = spark.read.parquet(sm_parquet)
    return FlatIndex.build(spark, transcripts)


def assert_rank_identical(engine_rows, golden, tol=1e-9):
    """Rank-identity with near-tie tolerance: same keys per rank unless the
    adjacent golden scores are within tol (then any order among the tied
    group is accepted, per the deterministic tie-break contract both sides
    apply the same way — this guards only against sub-ulp sum noise)."""
    eng = [((r["conv_id"], r["turn_idx"]), r["score"]) for r in engine_rows]
    assert len(eng) == len(golden), (len(eng), len(golden))
    gold_scores = {k: s for k, s in golden}
    for (ek, es), (gk, gs) in zip(eng, golden):
        assert ek in gold_scores, f"engine returned non-golden doc {ek}"
        assert es == pytest.approx(gold_scores[ek], abs=tol)
        if ek != gk:
            # acceptable only if a near-tie with the golden doc at this rank
            assert abs(gold_scores[ek] - gs) < tol, (ek, gk, es, gs)


def test_token_stream_equality(spark, sm_parquet, sm_oracle):
    """Per-turn text-equality invariant: UDF tokens == oracle tokens."""
    from search_engine_spark.functions.udfs import tokenize_turns

    transcripts = spark.read.parquet(sm_parquet)
    rows = tokenize_turns(transcripts).collect()
    engine: dict = {}
    for r in rows:
        engine.setdefault((r["conv_id"], r["turn_idx"]), {})[r["term"]] = (
            r["tf"],
            list(r["positions"]),
        )
    checked = 0
    for key, toks in sm_oracle.tokens.items():
        per_term: dict = {}
        for pos, t in enumerate(toks):
            per_term.setdefault(t, []).append(pos)
        expected = {t: (len(ps), ps) for t, ps in per_term.items()}
        assert engine.get(key, {}) == expected, key
        checked += 1
    assert checked == 5000


def test_doc_stats_covers_all_turns(spark, sm_parquet, sm_oracle):
    from search_engine_spark.functions.udfs import doc_stats

    transcripts = spark.read.parquet(sm_parquet)
    rows = doc_stats(transcripts).collect()
    assert len(rows) == 5000
    dl = {(r["conv_id"], r["turn_idx"]): r["dl"] for r in rows}
    assert dl == sm_oracle.doclen


def test_stats_match_oracle(flat_index, sm_oracle):
    assert flat_index.n_docs == sm_oracle.n_docs
    assert flat_index.avgdl == pytest.approx(sm_oracle.avgdl, abs=1e-12)
    idf = flat_index.idf_map(["term0000", "zzzznotacorpusword"])
    assert idf["term0000"] == pytest.approx(sm_oracle.idf("term0000"), abs=1e-12)
    assert idf["zzzznotacorpusword"] == pytest.approx(
        sm_oracle.idf("zzzznotacorpusword"), abs=1e-12
    )


@pytest.mark.parametrize("q", REFERENCE_QUERIES, ids=lambda q: f"q{q['query_id']}")
def test_golden_topk_rank_identical(flat_index, sm_oracle, q):
    from search_engine_spark.operators.naive_query import bm25_topk

    golden = oracle_topk(sm_oracle, q["query_text"], q["mode"], q["k"])
    engine = bm25_topk(flat_index, q["query_text"], q["mode"], q["k"]).collect()
    assert_rank_identical(engine, golden)
