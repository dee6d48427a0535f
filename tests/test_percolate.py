"""Percolation (reverse search / saved-search alerting) vs the
pure-Python oracle and the forward engine.

Two independent checks:
- MATCHING: for every registered query the percolated doc set equals
  ``oracle_matches`` (the oracle builds postings from the corpus; the
  percolator verifies per doc over its own token stream — different
  implementations sharing only the tokenizer).
- SCORING: with a reference index's global stats, the percolate score
  of a (doc, query) match equals the forward ``topk`` score for the
  same doc — tf/dl recomputed from raw text must reproduce the index's
  own numbers bit-for-bit.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import BuildConfig
from search_engine_spark.corpus import generate_transcripts
from search_engine_spark.index.build import build_index
from search_engine_spark.index.reader import CompressedIndex
from search_engine_spark.operators.percolate import (
    SavedQuery,
    _trigger_map,
    percolate,
    register,
    scoring_stats,
)
from search_engine_spark.oracle import build_oracle_index, oracle_matches
from search_engine_spark.streaming.alerts import PercolateAlerter

REGISTRY = [
    ("q_dis", "term0001 term0002", "disjunctive"),
    ("q_msm", "term0001 term0002 term0003", "disjunctive", 2),
    ("q_con", "term0003 term0004", "conjunctive"),
    ("q_phr", '"phrase alpha beta"', "phrase"),
    ("q_slop", '"term0001 term0002"~3', "phrase"),
    ("q_and", '"term0001" AND "term0002"', "boolean"),
    ("q_or", '"term0001" OR "term0002"', "boolean"),
    ("q_not", '"term0001" NOT "term0002"', "boolean"),
    ("q_boost", "term0001^2.5 term0002", "disjunctive"),
    ("q_rare", "zzznotaword", "disjunctive"),
]


@pytest.fixture(scope="module")
def xs_pdf():
    return generate_transcripts("xs")


@pytest.fixture(scope="module")
def xs_df(spark, xs_pdf):
    return spark.createDataFrame(xs_pdf).cache()


@pytest.fixture(scope="module")
def xs_oracle(xs_pdf):
    return build_oracle_index(xs_pdf)


@pytest.fixture(scope="module")
def xs_index(spark, xs_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("percolate") / "idx")
    build_index(spark, xs_df, out, BuildConfig(num_groups=2))
    return CompressedIndex(spark, out)


@pytest.fixture(scope="module")
def saved():
    return register(REGISTRY)


@pytest.fixture(scope="module")
def perc_rows(xs_df, saved):
    rows = percolate(xs_df, saved).collect()
    out: dict[str, set] = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add((r.conv_id, r.turn_idx))
    return out


# ------------------------------------------------------------- matching


def test_match_sets_equal_oracle_all_modes(perc_rows, xs_oracle):
    for entry in REGISTRY:
        qid, qt, mode = entry[0], entry[1], entry[2]
        mm = entry[3] if len(entry) > 3 else 1
        want = oracle_matches(xs_oracle, qt, mode, min_match=mm)
        assert perc_rows.get(qid, set()) == want, qid


def test_min_match_bounds(xs_df, xs_oracle):
    """m=1 ≡ plain disjunctive; m=n ≡ conjunctive; m>n ≡ empty."""
    qt = "term0001 term0002"
    for mm, ref_mode in [(1, "disjunctive"), (2, "conjunctive")]:
        saved = register([("q", qt, "disjunctive", mm)])
        got = {
            (r.conv_id, r.turn_idx) for r in percolate(xs_df, saved).collect()
        }
        assert got == oracle_matches(xs_oracle, qt, ref_mode)
    saved = register([("q", qt, "disjunctive", 3)])
    assert percolate(xs_df, saved).count() == 0


def test_min_match_zero_rejected():
    """An explicit min_match=0 must fail parse_query's >= 1 check, not
    be silently coerced to 1 (the old `if mm` truthiness bug)."""
    with pytest.raises(ValueError, match="min_match"):
        register([("q", "term0001 term0002", "disjunctive", 0)])


def test_stopword_only_query_dropped_and_empty_registry(xs_df, spark):
    assert register([("q", "the and of", "disjunctive")]) == []
    out = percolate(xs_df, [])
    assert out.count() == 0
    assert out.columns == ["conv_id", "turn_idx", "query_id"]


def test_duplicate_query_id_raises():
    with pytest.raises(ValueError, match="duplicate"):
        register([("q", "a1b2", "disjunctive"), ("q", "c3d4", "disjunctive")])


def test_trigger_map_shapes(saved):
    trig = _trigger_map(saved)
    by_id = {sq.query_id: i for i, sq in enumerate(saved)}
    # disjunctive queries trigger on EVERY term
    for t in saved[by_id["q_dis"]].spec.score_terms:
        assert by_id["q_dis"] in trig[t]
    # conjunctive/phrase queries trigger on exactly one representative
    n_con = sum(by_id["q_con"] in v for v in trig.values())
    n_phr = sum(by_id["q_phr"] in v for v in trig.values())
    assert n_con == 1 and n_phr == 1
    # boolean OR triggers once per side; AND/NOT once on the left
    assert sum(by_id["q_or"] in v for v in trig.values()) == 2
    assert sum(by_id["q_and"] in v for v in trig.values()) == 1
    assert sum(by_id["q_not"] in v for v in trig.values()) == 1


# -------------------------------------------------------------- scoring


def test_scores_match_forward_topk(xs_df, xs_index, saved):
    stats = scoring_stats(xs_index, saved)
    scored = percolate(xs_df, saved, stats).collect()
    by_q: dict[str, dict] = {}
    for r in scored:
        by_q.setdefault(r.query_id, {})[(r.conv_id, r.turn_idx)] = r.score
    for entry in REGISTRY:
        qid, qt, mode = entry[0], entry[1], entry[2]
        if len(entry) > 3:  # topk has min_match as kwarg
            fwd = xs_index.topk(qt, mode, 10, min_match=entry[3])
        else:
            fwd = xs_index.topk(qt, mode, 10)
        for r in fwd.collect():
            assert by_q[qid][(r.conv_id, r.turn_idx)] == pytest.approx(
                r.score, rel=1e-12
            ), (qid, r.conv_id, r.turn_idx)


# ------------------------------------------------------------ streaming


@pytest.fixture(scope="module")
def stream_input(tmp_path_factory, xs_pdf):
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = tmp_path_factory.mktemp("alert_stream")
    inp = base / "incoming"
    inp.mkdir()
    schema = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("turn_idx", pa.int32()),
            pa.field("role", pa.string()),
            pa.field("text", pa.string()),
            pa.field("tool", pa.string()),
            pa.field("ts", pa.timestamp("us")),
        ]
    )
    third = len(xs_pdf) // 3
    for i in range(3):
        part = xs_pdf.iloc[i * third : (i + 1) * third if i < 2 else len(xs_pdf)]
        pq.write_table(
            pa.Table.from_pandas(part, schema=schema, preserve_index=False),
            str(inp / f"part{i}.parquet"),
        )
    return str(inp), str(base / "out")


def test_streaming_alerts_equal_batch_percolate(
    spark, stream_input, saved, xs_df, perc_rows
):
    inp, out = stream_input
    alerter = PercolateAlerter(spark, saved, out)
    alerter.start(inp).awaitTermination()
    got: dict[str, set] = {}
    for r in alerter.alerts().collect():
        got.setdefault(r.query_id, set()).add((r.conv_id, r.turn_idx))
    want = {qid: s for qid, s in perc_rows.items() if s}
    assert got == want
    # replaying a committed batch id is a no-op (exactly-once alerts)
    n_before = alerter.alerts().count()
    alerter.process_batch(xs_df, 0)
    assert alerter.alerts().count() == n_before


# ------------------------------------------------- unified query strings


QS_REGISTRY = [
    ("qs_mixed", '+term0001 "term0002 term0003" -term0004', "qs"),
    ("qs_msm", "term0001 term0002 term0003", "qs", 2),
    ("qs_filtered", "+role:assistant term0001 term0002", "qs"),
    ("qs_negfilter", "-tool:bash +term0001", "qs"),
    ("qs_notphrase", '+term0001 -"term0002 term0003"', "qs"),
]


def test_query_string_percolation_equals_forward(xs_df, xs_pdf, xs_oracle):
    from search_engine_spark.oracle import oracle_query_string

    saved = register(QS_REGISTRY)
    rows = percolate(xs_df, saved).collect()
    got: dict[str, set] = {}
    for r in rows:
        got.setdefault(r.query_id, set()).add((r.conv_id, r.turn_idx))
    for entry in QS_REGISTRY:
        qid, qt = entry[0], entry[1]
        mm = entry[3] if len(entry) > 3 else 1
        want = {
            key
            for key, _s in oracle_query_string(
                xs_oracle, qt, 10**6, transcripts=xs_pdf,
                min_should_match=(mm if mm > 1 else None),
            )
        }
        assert got.get(qid, set()) == want, qid


def test_query_string_percolation_scores_match_forward(
    xs_df, xs_index,
):
    from search_engine_spark.operators.querystring import search_query_string

    qt = '+term0001 term0002^2 -term0004'
    saved = register([("q", qt, "qs")])
    st = scoring_stats(xs_index, saved)
    rows = percolate(xs_df, saved, stats=st).collect()
    perc = {(r.conv_id, r.turn_idx): r.score for r in rows}
    fwd = search_query_string(xs_index, qt, 10**6).collect()
    assert perc  # nonempty
    for r in fwd:
        assert perc[(r.conv_id, r.turn_idx)] == r.score


def test_query_string_percolation_rejects_markers():
    with pytest.raises(ValueError, match="markers"):
        register([("q", "term000* other", "qs")])
