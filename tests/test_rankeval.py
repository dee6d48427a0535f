"""rank_eval tests: the ES ``_rank_eval`` analog (pipeline/rankeval.py).

The metrics DataFrame is checked against an INDEPENDENT pure-Python
implementation of precision@k / recall@k / MRR / NDCG@k computed over
the pure-Python oracle's rankings (which the engine is rank-identical
to — pinned by test_compressed_index).  Edge cases: unjudged queries,
zero-hit queries, perfect rankings.
"""

from __future__ import annotations

import math

import pytest

from search_engine_spark.config import BuildConfig
from search_engine_spark.oracle import build_oracle_index, oracle_topk
from search_engine_spark.pipeline.rankeval import (
    JUDGMENT_COLS,
    rank_eval,
    rank_eval_summary,
)

K = 5

QUERIES = [
    ("term0001 term0002", "disjunctive"),
    ("term0003 term0004", "conjunctive"),
    ("zqxjunseenterm", "disjunctive"),  # zero hits
    ("term0005", "disjunctive"),  # judged empty (no judgment rows)
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    from search_engine_spark.corpus import generate_transcripts
    from search_engine_spark.index.build import build_index
    from search_engine_spark.index.reader import CompressedIndex

    out = str(tmp_path_factory.mktemp("rankeval_idx") / "xs")
    pdf = generate_transcripts("xs")[["conv_id", "turn_idx", "text"]]
    build_index(spark, spark.createDataFrame(pdf), out, BuildConfig(num_groups=2))
    return CompressedIndex(spark, out)


@pytest.fixture(scope="module")
def oracle():
    from search_engine_spark.corpus import generate_transcripts

    return build_oracle_index(generate_transcripts("xs"))


def make_judgments(oracle):
    """Deterministic judgments: for queries 0/1, rate the oracle's
    top-8 with ratings 3,3,2,2,1,1,0,0 (two unrated-in-top to exercise
    the rating-0 default) plus one relevant doc NOT in the engine's
    top-K (recall < 1).  Query 2 gets judgments for docs the engine
    can't retrieve (zero-hit query).  Query 3 gets none."""
    rows = []
    for qid in (0, 1):
        qt, mode = QUERIES[qid]
        ranked = oracle_topk(oracle, qt, mode, 8)
        ratings = [3, 3, 2, 2, 1, 1, 0, 0]
        for (key, _), r in zip(ranked, ratings):
            rows.append((qid, key[0], key[1], r))
        # a relevant doc far outside the top-k retrieval
        deep = oracle_topk(oracle, qt, mode, 50)
        if len(deep) > 20:
            key = deep[20][0]
            rows.append((qid, key[0], key[1], 2))
    rows.append((2, "conv-000000", 0, 3))  # never retrieved
    return rows


def py_metrics(ranked, judged, k):
    """Independent metric implementation over explicit lists.

    ranked: [(conv, turn)] in rank order; judged: {(conv, turn): rating}.
    """
    ranked = ranked[:k]
    rel_retrieved = sum(1 for d in ranked if judged.get(d, 0) > 0)
    n_relevant = sum(1 for r in judged.values() if r > 0)
    precision = rel_retrieved / len(ranked) if ranked else 0.0
    recall = rel_retrieved / n_relevant if n_relevant else 0.0
    mrr = 0.0
    for i, d in enumerate(ranked):
        if judged.get(d, 0) > 0:
            mrr = 1.0 / (i + 1)
            break
    dcg = sum(
        (2 ** judged.get(d, 0) - 1) / math.log2(i + 2) for i, d in enumerate(ranked)
    )
    ideal = sorted((r for r in judged.values() if r > 0), reverse=True)[:k]
    idcg = sum((2**r - 1) / math.log2(i + 2) for i, r in enumerate(ideal))
    ndcg = dcg / idcg if idcg > 0 else 0.0
    return dict(
        precision_at_k=precision, recall_at_k=recall, mrr=mrr, ndcg=ndcg,
        n_retrieved=len(ranked), n_relevant=n_relevant,
    )


def test_metrics_match_independent_python(spark, built, oracle):
    rows = make_judgments(oracle)
    judgments = spark.createDataFrame(rows, list(JUDGMENT_COLS))
    got = {
        r["query_id"]: r.asDict()
        for r in rank_eval(built, QUERIES, judgments, k=K).collect()
    }
    assert set(got) == {0, 1, 2, 3}
    for qid, (qt, mode) in enumerate(QUERIES):
        ranked = [key for key, _ in oracle_topk(oracle, qt, mode, K)]
        judged = {(c, t): r for (q, c, t, r) in rows if q == qid}
        want = py_metrics(ranked, judged, K)
        for m, v in want.items():
            assert got[qid][m] == pytest.approx(v, abs=1e-9), (qid, m)


def test_zero_hit_and_unjudged_rows_report_zero(spark, built, oracle):
    rows = make_judgments(oracle)
    judgments = spark.createDataFrame(rows, list(JUDGMENT_COLS))
    got = {r["query_id"]: r for r in rank_eval(built, QUERIES, judgments, k=K).collect()}
    # qid 2: judged but nothing retrievable
    assert got[2]["n_retrieved"] == 0
    assert got[2]["precision_at_k"] == 0.0
    assert got[2]["recall_at_k"] == 0.0
    assert got[2]["ndcg"] == 0.0
    # qid 3: retrieves fine but no judgments -> all-zero quality
    assert got[3]["n_retrieved"] > 0
    assert got[3]["n_relevant"] == 0
    assert got[3]["precision_at_k"] == 0.0
    assert got[3]["mrr"] == 0.0


def test_perfect_ranking_scores_one(spark, built, oracle):
    """Judging the engine's own top-k as the ideal set (descending
    ratings) must yield ndcg == mrr == precision == recall == 1."""
    qt, mode = QUERIES[0]
    ranked = [key for key, _ in oracle_topk(oracle, qt, mode, K)]
    rows = [(0, c, t, K - i) for i, (c, t) in enumerate(ranked)]
    judgments = spark.createDataFrame(rows, list(JUDGMENT_COLS))
    (got,) = rank_eval(built, [QUERIES[0]], judgments, k=K).collect()
    assert got["precision_at_k"] == pytest.approx(1.0)
    assert got["recall_at_k"] == pytest.approx(1.0)
    assert got["mrr"] == pytest.approx(1.0)
    assert got["ndcg"] == pytest.approx(1.0)


def test_summary_is_mean_over_queries(spark, built, oracle):
    rows = make_judgments(oracle)
    judgments = spark.createDataFrame(rows, list(JUDGMENT_COLS))
    per_query = rank_eval(built, QUERIES, judgments, k=K)
    (s,) = rank_eval_summary(per_query).collect()
    pq = per_query.collect()
    assert s["n_queries"] == len(QUERIES)
    for m in ("precision_at_k", "recall_at_k", "mrr", "ndcg"):
        assert s[m] == pytest.approx(sum(r[m] for r in pq) / len(pq), abs=1e-9)


def test_rank_eval_custom_hits(spark, built, oracle):
    """hits= evaluates ANY ranking source with the same metrics: the
    engine's own batch results passed explicitly give identical rows,
    and a deliberately reversed ranking degrades MRR/NDCG but not
    precision/recall (set metrics ignore order)."""
    from pyspark.sql import functions as F

    queries = QUERIES[:2]
    judgments = spark.createDataFrame(make_judgments(oracle), list(JUDGMENT_COLS))
    base = rank_eval(built, queries, judgments, k=K)
    explicit = rank_eval(
        built, queries, judgments, k=K, hits=built.topk_batch(queries, K)
    )
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(explicit) == key(base)

    reversed_hits = built.topk_batch(queries, K).withColumn(
        "score", -F.col("score")
    )
    rev = {r.query_id: r for r in
           rank_eval(built, queries, judgments, k=K, hits=reversed_hits).collect()}
    b = {r.query_id: r for r in base.collect()}
    for qid in (0, 1):
        assert rev[qid].precision_at_k == b[qid].precision_at_k
        assert rev[qid].recall_at_k == b[qid].recall_at_k
        assert rev[qid].ndcg <= b[qid].ndcg
    # at least one query's reversed NDCG is strictly worse
    assert any(rev[q].ndcg < b[q].ndcg for q in (0, 1))


def test_rank_eval_hits_truncated_at_k(spark, built, oracle):
    """rows beyond rank k in a custom hits frame are ignored."""
    queries = QUERIES[:1]
    judgments = spark.createDataFrame(
        [r for r in make_judgments(oracle) if r[0] == 0], list(JUDGMENT_COLS)
    )
    deep = built.topk_batch(queries, K + 10)
    got = rank_eval(built, queries, judgments, k=K, hits=deep).collect()[0]
    want = rank_eval(built, queries, judgments, k=K).collect()[0]
    assert got == want
    assert got.n_retrieved == K
