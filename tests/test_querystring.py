"""Unified query strings (ES query_string / Lucene bool query) vs the
pure-Python oracle, plus cross-mode identities against the standalone
tested modes.

Layers:
* grammar — parse_query_string structure + every documented loud error;
* resolution — stopword-drop vs expansion-empty, min_should defaults,
  boost largest-wins (shared resolver, so one test covers both sides);
* engine == oracle on a battery of mixed query strings (top-k AND
  match counts), incl. field filters with the NULL contract;
* cross-mode identities: a query string that degenerates to a standing
  mode must return that mode's exact rows (the standing modes carry
  their own oracle certification, so this doubles the certification);
* composition: tombstones, search_after, collapse, MultiIndex
  segmented identity.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from search_engine_spark.boolquery import (
    parse_query_string,
    resolve_query_string,
)
from search_engine_spark.config import BuildConfig
from search_engine_spark.corpus import generate_transcripts
from search_engine_spark.index.build import build_index
from search_engine_spark.index.multi import MultiIndex
from search_engine_spark.index.reader import CompressedIndex
from search_engine_spark.oracle import (
    build_oracle_index,
    oracle_query_string,
    oracle_query_string_count,
)
from search_engine_spark.operators.querystring import (
    compile_query_string,
    count_query_string,
    search_query_string,
)


@pytest.fixture(scope="module")
def xs_pdf():
    return generate_transcripts("xs")


@pytest.fixture(scope="module")
def xs_df(spark, xs_pdf):
    return spark.createDataFrame(xs_pdf).cache()


@pytest.fixture(scope="module")
def xs_index(spark, xs_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("qs") / "idx")
    build_index(spark, xs_df, out, BuildConfig(num_groups=2))
    return CompressedIndex(spark, out)


@pytest.fixture(scope="module")
def xs_oracle(xs_pdf):
    return build_oracle_index(xs_pdf)


def _rows(df):
    return [
        ((r["conv_id"], r["turn_idx"]), round(float(r["score"]), 9))
        for r in df.collect()
    ]


def _oracle_rows(pairs):
    return [((c, t), round(float(s), 9)) for (c, t), s in pairs]


# -- grammar ----------------------------------------------------------

def test_parse_structure():
    p = parse_query_string('+alpha -beta gamma^2 "a b"~1 -role:system tool:bash')
    occurs = [(c.occur, c.kind, c.value) for c in p.clauses]
    assert occurs == [
        ("must", "term", "alpha"),
        ("not", "term", "beta"),
        ("should", "term", "gamma"),
        ("should", "phrase", "a b"),
    ]
    assert p.clauses[2].boost == 2.0
    assert p.clauses[3].slop == 1
    assert [(f.field, f.value, f.negated) for f in p.filters] == [
        ("role", "system", True), ("tool", "bash", False),
    ]


def test_parse_markers():
    p = parse_query_string("pre* wild*card fuz~ fuz~1 /re[gx]/ plain")
    assert [(c.marker, c.value) for c in p.clauses] == [
        ("prefix", "pre"),
        ("wildcard", "wild*card"),
        ("fuzzy", "fuz"),
        ("fuzzy", "fuz"),  # ~1 normalizes to the bare ~ form
        ("regexp", "re[gx]"),
        (None, "plain"),
    ]


@pytest.mark.parametrize("bad", [
    'unbalanced "quote',
    "date:2020 term",  # unknown filter field
    "-term0001",  # no positive clause
    "-role:system",  # filter-only
    "term~2 other",  # fuzzy distance > 1
    "term^0 other",  # non-positive boost
    "term^2^3 other",  # double boost: residue 'term^2' must not reanalyze
    "term^-2 other",  # negative boost: matches no pattern, must not be dropped
    "",
])
def test_parse_loud_errors(bad):
    with pytest.raises(ValueError):
        parse_query_string(bad)


def test_phrase_boost_rejected():
    with pytest.raises(ValueError, match="phrase boost"):
        parse_query_string('"a b^2" c')


# -- resolution (shared) ----------------------------------------------

def test_stopword_must_drops_but_empty_expansion_blocks():
    # `+the` analyzes to nothing -> clause drops -> min_should stays 1
    r = resolve_query_string(parse_query_string("+the term0001"), {})
    assert r.clauses.must_groups == ()
    assert r.clauses.min_should == 1
    # an expansion-emptied must marker stays as an impossible clause
    r2 = resolve_query_string(
        parse_query_string("+zzz* term0001"), {("prefix", "zzz"): []}
    )
    assert r2.clauses.must_groups == ((),)
    assert r2.clauses.min_should == 0


def test_min_should_default_and_override():
    r = resolve_query_string(parse_query_string("+alpha beta gamma"), {})
    assert r.clauses.min_should == 0
    r = resolve_query_string(parse_query_string("alpha beta gamma"), {})
    assert r.clauses.min_should == 1
    r = resolve_query_string(
        parse_query_string("alpha beta gamma"), {}, min_should_match=2
    )
    assert r.clauses.min_should == 2
    with pytest.raises(ValueError):
        resolve_query_string(
            parse_query_string("alpha beta"), {}, min_should_match=0
        )


def test_boost_largest_wins():
    r = resolve_query_string(parse_query_string("term0001^2 term0001^3"), {})
    assert r.weights == {"term0001": 3.0}


# -- engine == oracle battery -----------------------------------------

BATTERY = [
    "+term0001 term0002",
    "term0001 term0002 -term0003",
    '+"term0001 term0002" term0005',
    '+term0001 -"term0002 term0003"',
    "term000* -term0001",
    "+role:assistant term0001 term0002",
    "-tool:bash +term0001",
    "+term0001 term0002^2.5",
    '"phrase alpha" beta',
    "+term0001 +term0002",
    "merg~ term0002",
    "+/term000[12]/ term0005",
    '+term0001 "term0002 term0004"~3',
]


@pytest.mark.parametrize("qs", BATTERY)
def test_engine_matches_oracle(xs_index, xs_df, xs_pdf, xs_oracle, qs):
    got = _rows(search_query_string(xs_index, qs, 10, meta=xs_df))
    want = _oracle_rows(
        oracle_query_string(xs_oracle, qs, 10, transcripts=xs_pdf)
    )
    assert got == want
    assert count_query_string(xs_index, qs, meta=xs_df) == (
        oracle_query_string_count(xs_oracle, qs, transcripts=xs_pdf)
    )


def test_min_should_match_two_of_three(xs_index, xs_pdf, xs_oracle):
    qs = "term0001 term0002 term0003"
    got = _rows(search_query_string(xs_index, qs, 10, min_should_match=2))
    want = _oracle_rows(
        oracle_query_string(xs_oracle, qs, 10, min_should_match=2)
    )
    assert got == want
    assert count_query_string(xs_index, qs, min_should_match=2) == (
        oracle_query_string_count(xs_oracle, qs, min_should_match=2)
    )


def test_impossible_must_and_all_dropped(xs_index, xs_df):
    assert search_query_string(xs_index, "+zzzqqq* term0001").count() == 0
    # all positive clauses analyzer-dropped -> typed empty, no Spark job
    out = search_query_string(xs_index, "+the of -term0001")
    assert out.columns == ["conv_id", "turn_idx", "score"]
    assert out.count() == 0
    assert count_query_string(xs_index, "+the of -term0001") == 0


def test_filters_require_meta(xs_index):
    with pytest.raises(ValueError, match="field filters"):
        search_query_string(xs_index, "role:assistant term0001")


# -- cross-mode identities --------------------------------------------

def test_degenerate_should_equals_disjunctive(xs_index):
    got = _rows(search_query_string(xs_index, "term0001 term0002", 10))
    want = _rows(xs_index.topk("term0001 term0002", "disjunctive", 10))
    assert got == want


def test_degenerate_must_equals_conjunctive(xs_index):
    got = _rows(search_query_string(xs_index, "+term0001 +term0002", 10))
    want = _rows(xs_index.topk("term0001 term0002", "conjunctive", 10))
    assert got == want


def test_degenerate_phrase_equals_phrase_mode(xs_index):
    got = _rows(search_query_string(xs_index, '+"phrase alpha beta"', 10))
    want = _rows(xs_index.topk('"phrase alpha beta"', "phrase", 10))
    assert got == want


def test_degenerate_not_equals_boolean_not(xs_index):
    got = _rows(
        search_query_string(xs_index, '+"term0001" -"term0002"', 10)
    )
    want = _rows(
        xs_index.topk('"term0001" NOT "term0002"', "boolean", 10)
    )
    assert got == want


def test_degenerate_and_equals_boolean_and(xs_index):
    got = _rows(
        search_query_string(xs_index, '+"term0001" +"term0002"', 10)
    )
    want = _rows(
        xs_index.topk('"term0001" AND "term0002"', "boolean", 10)
    )
    assert got == want


def test_degenerate_or_equals_boolean_or(xs_index):
    got = _rows(
        search_query_string(xs_index, '"term0001" "term0002"', 10)
    )
    want = _rows(
        xs_index.topk('"term0001" OR "term0002"', "boolean", 10)
    )
    assert got == want


# -- composition ------------------------------------------------------

def test_search_after_pages_are_contiguous(xs_index, xs_pdf, xs_oracle):
    qs = "+term0001 term0002 -term0009"
    full = _rows(search_query_string(xs_index, qs, 10))
    p1 = full[:5]
    # exact engine score for the cursor (the search_after contract)
    exact = {
        (r["conv_id"], r["turn_idx"]): float(r["score"])
        for r in search_query_string(xs_index, qs, 5).collect()
    }
    cursor = (exact[p1[-1][0]], p1[-1][0][0], p1[-1][0][1])
    p2 = _rows(search_query_string(xs_index, qs, 5, search_after=cursor))
    assert p1 + p2 == full
    want = _oracle_rows(
        oracle_query_string(xs_oracle, qs, 5, after=cursor)
    )
    assert p2 == want


def test_tombstones_equal_oracle_scope(xs_index, xs_pdf, xs_oracle):
    qs = "+term0001 term0002"
    dead = "conv-000003"
    got = _rows(search_query_string(xs_index, qs, 10, tombstones=[dead]))
    alive = {
        (str(c), int(t))
        for c, t in zip(xs_pdf["conv_id"], xs_pdf["turn_idx"])
        if str(c) != dead
    }
    want = _oracle_rows(
        oracle_query_string(xs_oracle, qs, 10, scope=alive)
    )
    assert got == want


def test_collapse_one_turn_per_conversation(xs_index, xs_oracle):
    qs = "+term0001 term0002"
    got = _rows(search_query_string(xs_index, qs, 5, collapse=True))
    full = oracle_query_string(xs_oracle, qs, 10**6)
    best: dict[str, tuple] = {}
    for (c, t), s in full:  # full is rank-ordered; first hit per conv wins
        if c not in best:
            best[c] = ((c, t), round(float(s), 9))
    want = sorted(best.values(), key=lambda r: (-r[1], r[0][0], r[0][1]))[:5]
    assert got == want
    assert len({c for (c, _t), _s in got}) == len(got)


def test_multiindex_identity(spark, xs_pdf, xs_df, tmp_path_factory, xs_oracle):
    d = tmp_path_factory.mktemp("qs_multi")
    convs = sorted(xs_pdf["conv_id"].unique())
    half = set(convs[: len(convs) // 2])
    a = xs_pdf[xs_pdf["conv_id"].isin(half)]
    b = xs_pdf[~xs_pdf["conv_id"].isin(half)]
    build_index(spark, spark.createDataFrame(a), str(d / "a"), BuildConfig(num_groups=2))
    build_index(spark, spark.createDataFrame(b), str(d / "b"), BuildConfig(num_groups=2))
    mi = MultiIndex(spark, [str(d / "a"), str(d / "b")])
    for qs in (
        "+term0001 term0002 -term0003",
        'term000* +"term0001 term0002"',
        "+role:assistant term0001 term0002",
    ):
        meta = xs_df if "role:" in qs else None
        pdf = xs_pdf if "role:" in qs else None
        got = _rows(search_query_string(mi, qs, 10, meta=meta))
        want = _oracle_rows(
            oracle_query_string(xs_oracle, qs, 10, transcripts=pdf)
        )
        assert got == want
        assert count_query_string(mi, qs, meta=meta) == (
            oracle_query_string_count(xs_oracle, qs, transcripts=pdf)
        )


def test_null_field_filter_contract(spark, tmp_path_factory):
    """A NULL tool never equals a positive filter value and always
    passes a negated one — pinned on a corpus with an explicit NULL."""
    pdf = pd.DataFrame({
        "conv_id": ["c0", "c0", "c1"],
        "turn_idx": [0, 1, 0],
        "role": ["user", "assistant", "user"],
        "text": ["alpha beta", "alpha gamma", "alpha delta"],
        "tool": ["bash", None, None],
        "ts": pd.to_datetime(["2026-01-01"] * 3),
    })
    df = spark.createDataFrame(pdf)
    out = str(tmp_path_factory.mktemp("qs_null") / "idx")
    build_index(spark, df, out, BuildConfig(num_groups=1))
    idx = CompressedIndex(spark, out)
    oidx = build_oracle_index(pdf)
    for qs in ("alpha tool:bash", "alpha -tool:bash"):
        got = _rows(search_query_string(idx, qs, 10, meta=df))
        want = _oracle_rows(
            oracle_query_string(oidx, qs, 10, transcripts=pdf)
        )
        assert got == want
    assert count_query_string(idx, "alpha -tool:bash", meta=df) == 2


# -- composition with the analytics surface ---------------------------

def test_aggregations_over_query_string_match_set(xs_index, xs_df, xs_pdf, xs_oracle):
    """A compiled qs spec feeds every match-set operator: stats count
    the oracle's candidate set; significant terms never emit the
    query's own clause terms (must_not included)."""
    from search_engine_spark.operators.querystring import compile_query_string
    from search_engine_spark.pipeline.aggs import cardinality, match_stats
    from search_engine_spark.pipeline.significant import significant_terms
    from search_engine_spark.pipeline.tophits import top_hits_by

    qs = "+term0001 -term0004"
    spec, _filters = compile_query_string(xs_index, qs)
    want_n = oracle_query_string_count(xs_oracle, qs)
    stats = match_stats(xs_index, xs_df, "", spec=spec).collect()[0]
    assert stats["count"] == want_n
    card = cardinality(
        xs_index, xs_df, "", col="turn_idx", spec=spec
    ).collect()[0]["value"]
    assert 0 < card <= want_n
    sig = significant_terms(xs_index, xs_df, "", spec=spec, n=10).collect()
    assert {r["term"] for r in sig}.isdisjoint({"term0001", "term0004"})
    th = top_hits_by(xs_index, xs_df, "", by="role", k=2, spec=spec)
    rows = th.collect()
    assert rows and all(r["rank"] <= 2 for r in rows)
    got_keys = {(r["conv_id"], r["turn_idx"]) for r in rows}
    want_keys = {
        key for key, _s in oracle_query_string(xs_oracle, qs, 10**6)
    }
    assert got_keys <= want_keys


def test_batch_row_identical_to_per_query(xs_index):
    from search_engine_spark.operators.querystring import (
        search_query_string_batch,
    )

    qs_list = [
        "+term0001 term0002",
        'term0003 -"term0001 term0002"',
        "term000* -term0001",
        ("+term0001 +term0002", 3),
    ]
    batch = search_query_string_batch(xs_index, qs_list, 5).collect()
    by_qid: dict[int, list] = {}
    for r in batch:
        by_qid.setdefault(r.query_id, []).append(
            ((r.conv_id, r.turn_idx), round(float(r.score), 9))
        )
    for qid, q in enumerate(qs_list):
        text, kk = (q, 5) if isinstance(q, str) else q
        want = _rows(search_query_string(xs_index, text, kk))
        assert by_qid.get(qid, []) == want, text


def test_batch_mixes_specs_and_plain_modes(xs_index):
    spec, _f = compile_query_string(xs_index, "+term0001 -term0004")
    batch = xs_index.topk_batch(
        [(spec, 5), ("term0001 term0002", "disjunctive", 5)]
    ).collect()
    got0 = [
        ((r.conv_id, r.turn_idx), round(float(r.score), 9))
        for r in batch if r.query_id == 0
    ]
    got1 = [
        ((r.conv_id, r.turn_idx), round(float(r.score), 9))
        for r in batch if r.query_id == 1
    ]
    assert got0 == _rows(search_query_string(xs_index, "+term0001 -term0004", 5))
    assert got1 == _rows(xs_index.topk("term0001 term0002", "disjunctive", 5))


def test_batch_rejects_field_filters(xs_index):
    from search_engine_spark.operators.querystring import (
        search_query_string_batch,
    )

    with pytest.raises(ValueError, match="shared scope"):
        search_query_string_batch(xs_index, ["role:assistant term0001"])


def test_explain_contributions_sum_to_qs_score(xs_index):
    """ES _explain over a bool query: per-term contributions (positive
    terms only) sum to the search score bit-for-bit; a must_not-excluded
    doc explains as unmatched."""
    qs = '+term0001 term0002^2 -term0004'
    spec, _f = compile_query_string(xs_index, qs)
    top = search_query_string(xs_index, qs, 3).collect()
    for r in top:
        rows = xs_index.explain(
            qs, r.conv_id, r.turn_idx, "bool", spec=spec
        ).collect()
        total = 0.0
        for e in sorted(rows, key=lambda e: e["term"]):
            total += e["contribution"]
        assert total == r.score
        assert all(e["term"] != "term0004" for e in rows)
    # a doc containing the must_not term is outside the match set
    excluded = xs_index.topk("term0004", "conjunctive", 1).collect()[0]
    rows = xs_index.explain(
        qs, excluded.conv_id, excluded.turn_idx, "bool", spec=spec
    ).collect()
    assert rows == []


# -- parenthesized alternatives groups --------------------------------

def test_parse_groups():
    p = parse_query_string('+(alpha beta) -(gamma delta) (epsilon zeta)^2')
    assert [(c.occur, c.kind, c.value, c.boost) for c in p.clauses] == [
        ("must", "group", "alpha beta", None),
        ("not", "group", "gamma delta", None),
        ("should", "group", "epsilon zeta", 2.0),
    ]
    with pytest.raises(ValueError, match="inside groups"):
        parse_query_string("+(alpha bet*) term")
    with pytest.raises(ValueError, match="inside groups"):
        parse_query_string("(role:user alpha) term")
    with pytest.raises(ValueError, match="empty group"):
        parse_query_string("() term")
    with pytest.raises(ValueError, match="unbalanced"):
        parse_query_string("(alpha term")


def test_group_resolution_is_any_of():
    r = resolve_query_string(parse_query_string("+(alpha beta) gamma"), {})
    assert r.clauses.must_groups == (("alpha", "beta"),)
    assert r.clauses.should_groups == (("gamma",),)
    assert r.clauses.min_should == 0
    # boost applies to every alternative
    r2 = resolve_query_string(parse_query_string("(alpha beta)^3"), {})
    assert r2.weights == {"alpha": 3.0, "beta": 3.0}


GROUP_BATTERY = [
    "+(term0001 term0002) -term0003",
    "(term0001 term0002) (term0003 term0004)",
    "+(term0001 term0005) +(term0002 term0006)",
    "term0001 -(term0002 term0003)",
    '+(term0001 term0002)^2 "term0003 term0004"',
]


@pytest.mark.parametrize("qs", GROUP_BATTERY)
def test_group_engine_matches_oracle(xs_index, xs_oracle, qs):
    got = _rows(search_query_string(xs_index, qs, 10))
    want = _oracle_rows(oracle_query_string(xs_oracle, qs, 10))
    assert got == want
    assert count_query_string(xs_index, qs) == (
        oracle_query_string_count(xs_oracle, qs)
    )


def test_group_percolation_matches_forward(xs_df, xs_pdf, xs_oracle):
    from search_engine_spark.operators.percolate import percolate, register

    saved = register([("g", "+(term0001 term0002) -term0003", "qs")])
    rows = percolate(xs_df, saved).collect()
    got = {(r.conv_id, r.turn_idx) for r in rows}
    want = {
        key for key, _s in oracle_query_string(
            xs_oracle, "+(term0001 term0002) -term0003", 10**6
        )
    }
    assert got == want


# -- range filters ----------------------------------------------------

RANGE_BATTERY = [
    "+term0001 term0002 ts>=2026-01-01T00:30:00",
    "+term0001 term0002 turn_idx<3",
    "+term0001 term0002 -turn_idx>=3",
    "+term0001 ts>=2026-01-01T00:10:00 ts<2026-01-01T01:00:00",
    "+term0001 role:assistant turn_idx>=1",
]


@pytest.mark.parametrize("qs", RANGE_BATTERY)
def test_range_filters_match_oracle(xs_index, xs_df, xs_pdf, xs_oracle, qs):
    got = _rows(search_query_string(xs_index, qs, 10, meta=xs_df))
    want = _oracle_rows(
        oracle_query_string(xs_oracle, qs, 10, transcripts=xs_pdf)
    )
    assert got == want
    assert count_query_string(xs_index, qs, meta=xs_df) == (
        oracle_query_string_count(xs_oracle, qs, transcripts=xs_pdf)
    )


def test_range_filter_parse_validation():
    p = parse_query_string("term0001 ts>=2026-01-01 -turn_idx<2")
    assert [(f.field, f.op, f.value, f.negated) for f in p.filters] == [
        ("ts", ">=", "2026-01-01", False),
        ("turn_idx", "<", "2", True),
    ]
    with pytest.raises(ValueError, match="bad ts range"):
        parse_query_string("term0001 ts>=notadate")
    with pytest.raises(ValueError, match="integer"):
        parse_query_string("term0001 turn_idx>five")


def test_range_filter_percolation(xs_df, xs_pdf, xs_oracle):
    from search_engine_spark.operators.percolate import percolate, register

    qt = "+term0001 ts>=2026-01-01T00:30:00 -turn_idx>=4"
    saved = register([("r", qt, "qs")])
    rows = percolate(xs_df, saved).collect()
    got = {(r.conv_id, r.turn_idx) for r in rows}
    want = {
        key
        for key, _s in oracle_query_string(
            xs_oracle, qt, 10**6, transcripts=xs_pdf
        )
    }
    assert got == want and got


# -- recency and hybrid over query strings ----------------------------

def test_recency_query_string(xs_index, xs_df, xs_pdf, xs_oracle):
    from search_engine_spark.operators.querystring import (
        recency_query_string,
    )

    qs = "+term0001 -term0004"
    out = recency_query_string(
        xs_index, xs_df, qs, "2026-01-01T01:00:00", 600.0, k=10**6
    ).collect()
    # decay reorders, never filters: the match set and the BM25 scores
    # are exactly the bool query's
    want = {
        key: round(float(s), 9)
        for key, s in oracle_query_string(xs_oracle, qs, 10**6)
    }
    got = {
        (r.conv_id, r.turn_idx): round(float(r.score), 9) for r in out
    }
    assert got == want
    # ordered by the decayed score
    rs = [r.recency_score for r in out]
    assert rs == sorted(rs, reverse=True)


def test_hybrid_query_string_degenerates_to_plain(spark, xs_index, xs_pdf):
    from search_engine_spark.operators.querystring import (
        hybrid_query_string,
    )
    from search_engine_spark.pipeline.hybrid import hash_embed, hybrid_topk

    emb = hash_embed(spark.createDataFrame(xs_pdf), dim=16)
    got = hybrid_query_string(
        xs_index, emb, "term0001 term0002", 5, dim=16
    ).collect()
    want = hybrid_topk(
        xs_index, emb, "term0001 term0002", 5, mode="disjunctive", dim=16
    ).collect()
    assert [(r.conv_id, r.turn_idx, r.score) for r in got] == [
        (r.conv_id, r.turn_idx, r.score) for r in want
    ]


def test_hybrid_query_string_filters_scope_both_legs(
    spark, xs_index, xs_df, xs_pdf,
):
    from search_engine_spark.operators.querystring import (
        hybrid_query_string,
    )
    from search_engine_spark.pipeline.hybrid import hash_embed

    emb = hash_embed(spark.createDataFrame(xs_pdf), dim=16)
    out = hybrid_query_string(
        xs_index, emb, "+term0001 role:assistant", 10, meta=xs_df, dim=16,
    ).collect()
    allowed = {
        (r.conv_id, r.turn_idx)
        for r in xs_df.filter("role = 'assistant'").collect()
    }
    assert out and all((r.conv_id, r.turn_idx) in allowed for r in out)


# -- review fixes: loud failures and msm=1 ----------------------------

@pytest.mark.parametrize("bad, msg", [
    ("role:assistant^2 error", "bad filter value"),
    ('"pod evict"^2 error', "phrase boost"),
    ("turn_idx:3 error", "range comparator"),
    ("ts:2026 error", "range comparator"),
    ("foo-bar~2 x", "fuzzy distance"),
    ("(error failure x", "unbalanced"),
])
def test_review_loud_failures(bad, msg):
    with pytest.raises(ValueError, match=msg):
        parse_query_string(bad)


def test_explicit_min_should_match_one_with_must(xs_index, xs_oracle):
    """ES contract: an explicit minimum_should_match=1 alongside must
    clauses requires >=1 should clause too (the default would be 0)."""
    qs = "+term0001 term0002 term0003"
    strict = _rows(search_query_string(xs_index, qs, 10**6, min_should_match=1))
    loose = _rows(search_query_string(xs_index, qs, 10**6))
    assert len(strict) < len(loose)
    want = _oracle_rows(
        oracle_query_string(xs_oracle, qs, 10**6, min_should_match=1)
    )
    assert strict == want
    # percolation respects the explicit 1 the same way
    from search_engine_spark.operators.percolate import register

    saved = register([("s", qs, "qs", 1)])
    assert saved[0].spec.bool_clauses.min_should == 1


def test_degenerate_compiles_to_blockmax_mode(xs_index):
    """Pure-should min_should=1 strings compile to mode='disjunctive'
    (block-max pruned kernel — the scale path); any must/not/phrase or
    msm>1 keeps the bool set-algebra kernel."""
    deg, _ = compile_query_string(xs_index, "term0001 term0002 (term0003 term0004)")
    assert deg.mode == "disjunctive"
    degw, _ = compile_query_string(xs_index, "term0001^2 term000*")
    assert degw.mode == "disjunctive"
    for qs, msm in [
        ("+term0001 term0002", None),
        ("term0001 -term0002", None),
        ('"term0001 term0002" term0003', None),
        ("term0001 term0002", 2),
    ]:
        spec, _f = compile_query_string(xs_index, qs, min_should_match=msm)
        assert spec.mode == "bool", qs
    # rewrite preserves results exactly (belt over the identity tests)
    got = _rows(search_query_string(xs_index, "term0001 term0002 (term0003 term0004)", 10))
    want = _rows(xs_index.topk("term0001 term0002 term0003 term0004", "disjunctive", 10))
    assert got == want
