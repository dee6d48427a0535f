"""Recency-decay rescoring (operators/recency.py) vs the pure-Python
oracle.

Elasticsearch ``function_score`` exponential-decay semantics applied
multiplicatively to BM25: final = bm25 * exp(ln(decay)/scale *
max(0, now - ts - offset)).  The decayed order is NOT monotone in BM25,
so the operator rescores the FULL match set (``matches_scored``) — the
tests include a case where the decayed and undecayed orders genuinely
differ, so a lossy top-N overfetch implementation would fail here.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import BuildConfig
from search_engine_spark.corpus import generate_transcripts
from search_engine_spark.index.build import build_index
from search_engine_spark.index.multi import MultiIndex
from search_engine_spark.index.reader import CompressedIndex
from search_engine_spark.operators.recency import recency_topk
from search_engine_spark.oracle import (
    build_oracle_index,
    oracle_recency_topk,
    oracle_topk,
)

#: xs corpus ts spans 2026-01-01T00:00..+99min; this `now` puts ~40% of
#: turns at clamped age 0 and the rest on a steep decay slope.
NOW = "2026-01-01 01:00:00"
SCALE_S = 600.0  # 10-minute half-life — steep enough to reorder ranks

_QUERIES = [
    ("term0001 term0002", "disjunctive"),
    ("term0003 term0004", "conjunctive"),
    ('"phrase alpha beta"', "phrase"),
    ('"term0001" OR "term0002"', "boolean"),
    ('"term0001" NOT "term0002"', "boolean"),
]


@pytest.fixture(scope="module")
def xs_pdf():
    return generate_transcripts("xs")


@pytest.fixture(scope="module")
def xs_df(spark, xs_pdf):
    return spark.createDataFrame(xs_pdf).cache()


@pytest.fixture(scope="module")
def xs_index(spark, xs_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("recency") / "idx")
    build_index(spark, xs_df, out, BuildConfig(num_groups=2))
    return CompressedIndex(spark, out)


@pytest.fixture(scope="module")
def xs_oracle(xs_pdf):
    return build_oracle_index(xs_pdf)


def _got(df) -> list[tuple]:
    return [
        (r.conv_id, r.turn_idx, round(r.score, 9), round(r.recency_score, 9))
        for r in df.collect()
    ]


def _want(rows) -> list[tuple]:
    return [
        (key[0], key[1], round(bm25, 9), round(decayed, 9))
        for key, bm25, decayed in rows
    ]


def test_matches_oracle_all_modes(xs_index, xs_df, xs_pdf, xs_oracle):
    for qt, mode in _QUERIES:
        got = _got(recency_topk(xs_index, xs_df, qt, NOW, SCALE_S, mode, k=10))
        want = _want(
            oracle_recency_topk(xs_oracle, xs_pdf, qt, NOW, SCALE_S, mode, k=10)
        )
        assert got == want, (qt, mode)


def test_decay_actually_reorders(xs_index, xs_df, xs_oracle):
    """The case the full-rescore design exists for: decayed order must
    differ from the BM25 order for this (now, scale) — otherwise the
    suite would pass on a lossy top-N overfetch implementation too."""
    qt = "term0001 term0002"
    decayed_keys = [
        (r.conv_id, r.turn_idx)
        for r in recency_topk(xs_index, xs_df, qt, NOW, SCALE_S, k=10).collect()
    ]
    bm25_keys = [key for key, _s in oracle_topk(xs_oracle, qt, "disjunctive", 10)]
    assert decayed_keys != bm25_keys
    # ...and a winner must come from OUTSIDE the undecayed top-10.
    assert any(k not in bm25_keys for k in decayed_keys)


def test_offset_grace_window(xs_index, xs_df, xs_pdf, xs_oracle):
    """offset_s shifts the decay start: ages inside the window clamp to
    zero (undecayed), matching the oracle's identical clamp."""
    qt = "term0001 term0002"
    got = _got(
        recency_topk(xs_index, xs_df, qt, NOW, SCALE_S, k=10, offset_s=1200.0)
    )
    want = _want(
        oracle_recency_topk(
            xs_oracle, xs_pdf, qt, NOW, SCALE_S, k=10, offset_s=1200.0
        )
    )
    assert got == want
    # docs younger than offset keep recency_score == score exactly
    assert any(r[2] == r[3] for r in got)


def test_future_ts_clamps_to_undecayed(xs_index, xs_df, xs_pdf, xs_oracle):
    """now before every ts → all ages clamp to 0 → decayed == BM25."""
    early = "2025-12-31 00:00:00"
    got = _got(recency_topk(xs_index, xs_df, "term0001", early, SCALE_S, k=5))
    assert all(r[2] == r[3] for r in got)
    want = _want(
        oracle_recency_topk(xs_oracle, xs_pdf, "term0001", early, SCALE_S, k=5)
    )
    assert got == want


def test_custom_decay_rate(xs_index, xs_df, xs_pdf, xs_oracle):
    got = _got(
        recency_topk(
            xs_index, xs_df, "term0001 term0002", NOW, SCALE_S, decay_rate=0.1
        )
    )
    want = _want(
        oracle_recency_topk(
            xs_oracle, xs_pdf, "term0001 term0002", NOW, SCALE_S, decay_rate=0.1
        )
    )
    assert got == want


def test_scope_composes(xs_index, xs_df, xs_pdf, xs_oracle):
    """Filter-context contract: the scope restricts results, scores keep
    corpus-global stats, and decay applies after."""
    scope_df = xs_df.filter(F.col("role") == "assistant")
    scope_keys = {
        (r.conv_id, int(r.turn_idx))
        for r in xs_pdf[xs_pdf.role == "assistant"].itertuples(index=False)
    }
    got = _got(
        recency_topk(
            xs_index, xs_df, "term0001 term0002", NOW, SCALE_S, scope=scope_df
        )
    )
    want = _want(
        oracle_recency_topk(
            xs_oracle,
            xs_pdf,
            "term0001 term0002",
            NOW,
            SCALE_S,
            scope=scope_keys,
        )
    )
    assert got == want
    assert got, "scoped recency query returned no rows — weak fixture"


def test_tombstones_compose(xs_index, xs_df, xs_pdf, xs_oracle):
    """Tombstoned docs vanish; oracle emulates deletion as scope =
    all-keys − deleted (equivalent set semantics)."""
    qt = "term0001 term0002"
    base = oracle_recency_topk(xs_oracle, xs_pdf, qt, NOW, SCALE_S, k=3)
    deleted = [base[0][0][0], tuple(base[1][0])]  # whole conv + one turn
    all_keys = {
        (r.conv_id, int(r.turn_idx)) for r in xs_pdf.itertuples(index=False)
    }
    kept = {
        k
        for k in all_keys
        if k[0] != deleted[0] and k != deleted[1]
    }
    got = _got(
        recency_topk(xs_index, xs_df, qt, NOW, SCALE_S, tombstones=deleted)
    )
    want = _want(
        oracle_recency_topk(xs_oracle, xs_pdf, qt, NOW, SCALE_S, scope=kept)
    )
    assert got == want
    assert all(r[0] != deleted[0] for r in got)


def test_analyzed_execution_mode(xs_index, xs_df, xs_pdf, xs_oracle):
    """Expansion composition: pre-analyzed term lists run through the
    same decayed path (the synonym/prefix/fuzzy execution form)."""
    got = _got(
        recency_topk(
            xs_index, xs_df, "term0001 term0002", NOW, SCALE_S, analyzed=True
        )
    )
    want = _want(
        oracle_recency_topk(
            xs_oracle, xs_pdf, "term0001 term0002", NOW, SCALE_S, analyzed=True
        )
    )
    assert got == want


def test_multi_index_matches_single(spark, xs_pdf, xs_df, xs_index, tmp_path_factory):
    """Segmented read path: MultiIndex recency == single-index recency
    (global stats via merged idf/avgdl)."""
    d = tmp_path_factory.mktemp("recency_multi")
    half = xs_pdf.conv_id < "conv-000010"
    roots = []
    for name, part in (("a", xs_pdf[half]), ("b", xs_pdf[~half])):
        out = str(d / name)
        build_index(
            spark,
            spark.createDataFrame(part[["conv_id", "turn_idx", "text"]]),
            out,
            BuildConfig(num_groups=2),
        )
        roots.append(out)
    multi = MultiIndex(spark, roots)
    for qt, mode in _QUERIES[:3]:
        got_multi = _got(recency_topk(multi, xs_df, qt, NOW, SCALE_S, mode))
        got_single = _got(recency_topk(xs_index, xs_df, qt, NOW, SCALE_S, mode))
        assert got_multi == got_single, (qt, mode)


def test_empty_and_validation(xs_index, xs_df):
    assert recency_topk(xs_index, xs_df, "zzznothing", NOW, SCALE_S).count() == 0
    with pytest.raises(ValueError, match="scale_s"):
        recency_topk(xs_index, xs_df, "term0001", NOW, 0.0)
    with pytest.raises(ValueError, match="decay_rate"):
        recency_topk(xs_index, xs_df, "term0001", NOW, SCALE_S, decay_rate=1.0)


def test_matches_scored_equals_exhaustive_topk(xs_index, xs_oracle):
    """matches_scored is the exhaustive-scoring feed: its rows must be
    exactly the oracle's full ranked match set (every match, exact
    BM25), for both kernels' candidate paths."""
    for qt, mode in _QUERIES:
        got = {
            (r.conv_id, r.turn_idx): round(r.score, 9)
            for r in xs_index.matches_scored(qt, mode).collect()
        }
        want = {
            (key[0], key[1]): round(score, 9)
            for key, score in oracle_topk(xs_oracle, qt, mode, 1 << 62)
        }
        assert got == want, (qt, mode)


def test_parquet_ntz_ts_matches_oracle(spark, xs_pdf, xs_index, xs_oracle, tmp_path):
    """Parquet without a zone annotation reads as TIMESTAMP_NTZ (the CLI
    path via load_transcripts) — the decay must treat it identically to
    the session-zoned DataFrame (regression: NTZ has no direct long
    cast)."""
    from search_engine_spark.corpus import write_transcripts_parquet

    path = str(tmp_path / "tr.parquet")
    write_transcripts_parquet(path, "xs")
    tr = spark.read.parquet(path)
    assert dict(tr.dtypes)["ts"] == "timestamp_ntz"
    got = _got(recency_topk(xs_index, tr, "term0001 term0002", NOW, SCALE_S))
    want = _want(
        oracle_recency_topk(xs_oracle, xs_pdf, "term0001 term0002", NOW, SCALE_S)
    )
    assert got == want
