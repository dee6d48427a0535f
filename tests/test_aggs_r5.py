"""Round-5 aggregation/rescoring operators vs the pure-Python oracles.

* multi_terms — ES composite-key term counts (pipeline/aggs.py)
* top_metrics_by — ES top_metrics struct-max per bucket (pipeline/aggs.py)
* date_histogram_buckets — serial_diff + bucket_selector + bucket_sort
  (pipeline/histogram.py)
* rare_terms — ES rare_terms long-tail cut (pipeline/significant.py)
* function_score_topk — ES function_score shaping (operators/function_score.py)
"""

from __future__ import annotations

import pytest

from search_engine_spark.config import BuildConfig
from search_engine_spark.corpus import generate_transcripts, transcripts_spark_df
from search_engine_spark.index.build import build_index
from search_engine_spark.index.reader import CompressedIndex
from search_engine_spark.oracle import (
    build_oracle_index,
    oracle_date_histogram_buckets,
    oracle_function_score_topk,
    oracle_multi_terms,
    oracle_rare_terms,
    oracle_top_metrics_by,
)


@pytest.fixture(scope="module")
def xs_pdf():
    return generate_transcripts("xs")


@pytest.fixture(scope="module")
def xs_df(spark, xs_pdf):
    return transcripts_spark_df(spark, "xs").cache()


@pytest.fixture(scope="module")
def xs_index(spark, xs_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("aggs_r5") / "idx")
    build_index(spark, xs_df, out, BuildConfig(num_groups=2))
    return CompressedIndex(spark, out)


@pytest.fixture(scope="module")
def xs_oracle(xs_pdf):
    return build_oracle_index(xs_pdf)


# ---------------------------------------------------------------- multi_terms


def test_multi_terms_matches_oracle(xs_index, xs_df, xs_pdf, xs_oracle):
    from search_engine_spark.pipeline.aggs import multi_terms

    for qt, mode in (("term0001 term0002", "disjunctive"), ("term0000", "disjunctive")):
        got = [
            (r.role, r.tool, r.n)
            for r in multi_terms(xs_index, xs_df, qt, ("role", "tool"), 10, mode).collect()
        ]
        want = oracle_multi_terms(xs_oracle, xs_pdf, qt, ("role", "tool"), 10, mode)
        assert got == want, qt


def test_multi_terms_validation(xs_index, xs_df):
    from search_engine_spark.pipeline.aggs import multi_terms

    with pytest.raises(ValueError, match=">= 2 key fields"):
        multi_terms(xs_index, xs_df, "term0001", ("role",))
    with pytest.raises(ValueError, match="positive"):
        multi_terms(xs_index, xs_df, "term0001", ("role", "tool"), 0)


# ------------------------------------------------------------- top_metrics_by


def test_top_metrics_matches_oracle(xs_index, xs_df, xs_pdf, xs_oracle):
    from search_engine_spark.pipeline.aggs import top_metrics_by

    got = [
        (r.bucket, r.top_sort.strftime("%Y-%m-%d %H:%M:%S"), r.top_metric)
        for r in top_metrics_by(
            xs_index, xs_df, "term0001 term0002", "role", "ts", "turn_idx"
        ).collect()
    ]
    want = [
        (b, s.strftime("%Y-%m-%d %H:%M:%S"), int(m))
        for b, s, m in oracle_top_metrics_by(
            xs_oracle, xs_pdf, "term0001 term0002", "role", "ts", "turn_idx"
        )
    ]
    assert got == want


# --------------------------------------------------- date_histogram_buckets


@pytest.mark.parametrize(
    "kw",
    [
        dict(lag=1),
        dict(lag=2, min_doc_count=0),
        dict(lag=1, min_n=2),
        dict(lag=1, sort="n", descending=True, limit=5),
        dict(lag=3, min_doc_count=0, sort="serial_diff", descending=True, limit=5),
    ],
)
def test_histogram_buckets_matches_oracle(xs_index, xs_df, xs_pdf, xs_oracle, kw):
    from search_engine_spark.pipeline.histogram import date_histogram_buckets

    qt, mode, interval = "term0003 term0004", "conjunctive", "minute"
    got = [
        (r.bucket.strftime("%Y-%m-%d %H:%M:%S"), r.n,
         None if r.serial_diff is None else int(r.serial_diff))
        for r in date_histogram_buckets(
            xs_index, xs_df, qt, mode, interval, **kw
        ).collect()
    ]
    want = [
        (b.strftime("%Y-%m-%d %H:%M:%S"), int(n), d)
        for b, n, d in oracle_date_histogram_buckets(
            xs_oracle, xs_pdf, qt, mode, interval, **kw
        )
    ]
    assert got == want, kw


def test_histogram_buckets_validation(xs_index, xs_df):
    from search_engine_spark.pipeline.histogram import date_histogram_buckets

    for bad in (
        dict(lag=0),
        dict(sort="nope"),
        dict(limit=0),
        dict(min_doc_count=2),
    ):
        with pytest.raises(ValueError):
            date_histogram_buckets(xs_index, xs_df, "term0001", **bad)


# ------------------------------------------------------------------ rare_terms


@pytest.mark.parametrize(
    "kw",
    [
        dict(max_doc_count=1),
        dict(max_doc_count=2, limit=15),
        dict(max_doc_count=3, include_query_terms=True, limit=10),
    ],
)
def test_rare_terms_matches_oracle(xs_index, xs_df, xs_oracle, kw):
    from search_engine_spark.pipeline.significant import rare_terms

    qt = "term0001 term0002"
    got = [(r.term, r.fg) for r in rare_terms(xs_index, xs_df, qt, **kw).collect()]
    want = [(t, f) for t, f in oracle_rare_terms(xs_oracle, qt, **kw)]
    assert got == want, kw
    # rarity bound + ordering hold structurally too
    assert all(f <= kw["max_doc_count"] for _t, f in got)
    assert got == sorted(got, key=lambda r: (r[1], r[0]))


def test_rare_terms_excludes_query_terms(xs_index, xs_df, xs_oracle):
    from search_engine_spark.pipeline.significant import rare_terms

    # term4499 is a rare tail term AND a query term — excluded by default
    got = {r.term for r in rare_terms(xs_index, xs_df, "term4499", max_doc_count=5).collect()}
    assert "term4499" not in got


# -------------------------------------------------------------- function_score


_FNS = [
    {"kind": "field_value_factor", "field": "turn_idx", "factor": 0.5,
     "modifier": "log1p", "missing": 1.0},
    {"kind": "weight", "weight": 1.2},
    {"kind": "random_score", "seed": "fs1"},
]


@pytest.mark.parametrize(
    "fns,score_mode,boost_mode",
    [
        (_FNS, "multiply", "multiply"),
        (_FNS, "sum", "sum"),
        (_FNS, "max", "replace"),
        (_FNS, "avg", "multiply"),
        ([{"kind": "field_value_factor", "field": "turn_idx", "modifier": "sqrt"}],
         "multiply", "multiply"),
        ([{"kind": "field_value_factor", "field": "turn_idx", "factor": 2.0,
           "modifier": "reciprocal", "missing": 0.5}], "min", "sum"),
        ([{"kind": "random_score", "seed": "other"}], "multiply", "replace"),
    ],
)
def test_function_score_matches_oracle(
    xs_index, xs_df, xs_pdf, xs_oracle, fns, score_mode, boost_mode
):
    from search_engine_spark.operators.function_score import function_score_topk

    qt = "term0001 term0002"
    got = [
        (r.conv_id, r.turn_idx, round(r.score, 6), round(r.final_score, 6))
        for r in function_score_topk(
            xs_index, xs_df, qt, fns, k=10,
            score_mode=score_mode, boost_mode=boost_mode,
        ).collect()
    ]
    want = [
        (key[0], key[1], round(bm25, 6), round(fin, 6))
        for key, bm25, fin in oracle_function_score_topk(
            xs_oracle, xs_pdf, qt, fns, "disjunctive", 10,
            score_mode=score_mode, boost_mode=boost_mode,
        )
    ]
    assert got == want, (score_mode, boost_mode)


def test_function_score_validation(xs_index, xs_df):
    from search_engine_spark.operators.function_score import function_score_topk

    with pytest.raises(ValueError, match="non-empty"):
        function_score_topk(xs_index, xs_df, "term0001", [])
    with pytest.raises(ValueError, match="boost_mode"):
        function_score_topk(xs_index, xs_df, "term0001", _FNS, boost_mode="avg")
    with pytest.raises(ValueError, match="kind"):
        function_score_topk(
            xs_index, xs_df, "term0001", [{"kind": "script_score"}]
        ).collect()


def test_random_score_is_deterministic_and_uniformish(xs_index, xs_df):
    from search_engine_spark.operators.function_score import function_score_topk

    fns = [{"kind": "random_score", "seed": "s"}]
    a = function_score_topk(xs_index, xs_df, "term0000", fns, k=50,
                            boost_mode="replace").collect()
    b = function_score_topk(xs_index, xs_df, "term0000", fns, k=50,
                            boost_mode="replace").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    vals = [r.final_score for r in a]
    assert all(0.0 <= v < 1.0 for v in vals)
    assert len(set(vals)) == len(vals)  # md5 over distinct keys: no collisions


# ------------------------------------------------- composition (both readers)


@pytest.fixture(scope="module")
def xs_multi(spark, xs_pdf, tmp_path_factory):
    from search_engine_spark.index.multi import MultiIndex

    d = tmp_path_factory.mktemp("aggs_r5_multi")
    lo = xs_pdf[xs_pdf.conv_id < "conv-000010"]
    hi = xs_pdf[xs_pdf.conv_id >= "conv-000010"]
    roots = []
    for name, part in (("lo", lo), ("hi", hi)):
        out = str(d / name)
        build_index(
            spark,
            spark.createDataFrame(part[["conv_id", "turn_idx", "text"]]),
            out,
            BuildConfig(num_groups=2),
        )
        roots.append(out)
    return MultiIndex(spark, roots)


def test_r5_ops_multiindex_identity(xs_index, xs_multi, xs_df):
    """Every round-5 operator goes through index.matches/matches_scored,
    so a segmented MultiIndex must answer identically to the single
    index built from the union."""
    from search_engine_spark.operators.function_score import function_score_topk
    from search_engine_spark.pipeline.aggs import multi_terms, top_metrics_by
    from search_engine_spark.pipeline.histogram import date_histogram_buckets
    from search_engine_spark.pipeline.significant import rare_terms

    q = "term0001 term0002"
    for fn in (
        lambda ix: multi_terms(ix, xs_df, q, ("role", "tool"), 10),
        lambda ix: top_metrics_by(ix, xs_df, q, "role", "ts", "turn_idx"),
        lambda ix: rare_terms(ix, xs_df, q, max_doc_count=2, limit=20),
        lambda ix: date_histogram_buckets(
            ix, xs_df, q, interval="minute", lag=2, sort="n",
            descending=True, limit=10,
        ),
        lambda ix: function_score_topk(
            ix, xs_df, q, _FNS, k=10
        ).select("conv_id", "turn_idx"),
    ):
        single = [tuple(r) for r in fn(xs_index).collect()]
        multi = [tuple(r) for r in fn(xs_multi).collect()]
        assert single == multi


def test_r5_ops_scope_composition(xs_index, xs_df, xs_pdf, xs_oracle):
    """scope= restricts the match set before every round-5 operator —
    cross-checked against the oracle computed over the scoped pandas
    frame."""
    from search_engine_spark.pipeline.aggs import multi_terms

    q = "term0001 term0002"
    scope = xs_df.filter("role IN ('tool', 'assistant')")
    got = [
        tuple(r)
        for r in multi_terms(
            xs_index, xs_df, q, ("role", "tool"), 10, scope=scope
        ).collect()
    ]
    # oracle over the scoped doc set: scoped matches ∩ rows with both keys
    from search_engine_spark.oracle import oracle_matches

    keys = {
        (str(c), int(t))
        for c, t, r in zip(
            xs_pdf["conv_id"], xs_pdf["turn_idx"], xs_pdf["role"]
        )
        if r in ("tool", "assistant")
    }
    docs = oracle_matches(xs_oracle, q, "disjunctive", scope=keys)
    import pandas as pd

    counts: dict = {}
    for c, t, role, tool in zip(
        xs_pdf["conv_id"], xs_pdf["turn_idx"], xs_pdf["role"], xs_pdf["tool"]
    ):
        if (str(c), int(t)) not in docs:
            continue
        if tool is None or pd.isna(tool):
            continue
        counts[(str(role), str(tool))] = counts.get((str(role), str(tool)), 0) + 1
    want = [
        (*k, v)
        for k, v in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    ]
    assert got == want


# ---------------------------------------------------------------- bucket_script


@pytest.mark.parametrize(
    "script",
    [
        "n * 2.0 + abs(coalesce(serial_diff, 0)) * 0.5",
        "greatest(n * 1.0, coalesce(serial_diff, 0) * 3.0)",
        "round(sqrt(n * 1.0), 3) - least(n, 2)",
    ],
)
def test_bucket_script_matches_duckdb_twin(xs_index, xs_df, xs_pdf, xs_oracle, script):
    """The ES bucket_script contract: both engines compile and evaluate
    the SAME expression string over the same base bucket rows."""
    import duckdb

    from search_engine_spark.pipeline.histogram import date_histogram_buckets

    qt, mode, interval = "term0003 term0004", "conjunctive", "minute"
    got = [
        (r.bucket.strftime("%Y-%m-%d %H:%M:%S"), r.n,
         None if r.serial_diff is None else int(r.serial_diff),
         round(r.script_value, 9))
        for r in date_histogram_buckets(
            xs_index, xs_df, qt, mode, interval,
            lag=2, sort="script_value", descending=True, limit=8,
            min_doc_count=0, script=script,
        ).collect()
    ]
    base = oracle_date_histogram_buckets(
        xs_oracle, xs_pdf, qt, mode, interval,
        lag=2, sort="bucket", limit=None, min_doc_count=0,
    )
    values = ",".join(
        f"('{b.strftime('%Y-%m-%d %H:%M:%S')}', {n}, "
        f"{'NULL' if d is None else d})"
        for b, n, d in base
    )
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT bucket, n, serial_diff, CAST({script} AS DOUBLE) AS sv "
        f"FROM (VALUES {values}) t(bucket, n, serial_diff) "
        "ORDER BY sv DESC NULLS LAST, bucket LIMIT 8"
    ).fetchall()
    want = [(b, int(n), d, round(sv, 9)) for b, n, d, sv in rows]
    assert got == want, script


def test_bucket_script_validation(xs_index, xs_df):
    from search_engine_spark.pipeline.histogram import date_histogram_buckets

    # sort=script_value without a script is rejected
    with pytest.raises(ValueError, match="sort must be"):
        date_histogram_buckets(xs_index, xs_df, "term0001", sort="script_value")
    # a malformed script fails loud at plan time
    with pytest.raises(Exception):
        date_histogram_buckets(
            xs_index, xs_df, "term0001", script="n ** nope ("
        ).collect()
