"""Search service facade (service.search): composed /api/search analog.

Results must equal the bare topk ranking; snippets must window the first
raw-term hit exactly like the standalone snippets operator; suggestions
follow the Java-port generator; pagination slices the same ranked list.
"""

from __future__ import annotations

import pytest

from search_engine_spark.config import BuildConfig
from search_engine_spark.corpus import generate_transcripts
from search_engine_spark.index.build import build_index
from search_engine_spark.index.multi import MultiIndex
from search_engine_spark.index.reader import CompressedIndex
from search_engine_spark.service import search


@pytest.fixture(scope="module")
def xs_setup(spark, tmp_path_factory):
    pdf = generate_transcripts("xs")
    out = str(tmp_path_factory.mktemp("svc") / "idx")
    tr = spark.createDataFrame(pdf[["conv_id", "turn_idx", "text"]])
    build_index(spark, tr, out, BuildConfig(num_groups=2))
    return CompressedIndex(spark, out), tr


def test_search_page_matches_topk(spark, xs_setup):
    idx, tr = xs_setup
    page = search(idx, tr, "term0001 term0002", k=5)
    got = [(r["conv_id"], r["turn_idx"], round(r["score"], 9)) for r in page["results"]]
    want = [
        (r.conv_id, r.turn_idx, round(r.score, 9))
        for r in idx.topk("term0001 term0002", "disjunctive", 5).collect()
    ]
    assert got == want
    assert len(got) == 5


def test_search_snippets_window_the_hit(spark, xs_setup):
    idx, tr = xs_setup
    page = search(idx, tr, "term0001", k=5)
    texts = {
        (r.conv_id, r.turn_idx): r.text
        for r in tr.filter(
            tr.conv_id.isin([r["conv_id"] for r in page["results"]])
        ).collect()
    }
    for res in page["results"]:
        raw = texts[(res["conv_id"], res["turn_idx"])].lower()
        assert "term0001" in raw
        assert "term0001" in res["snippet"].lower()
        core = res["snippet"].strip(".")
        assert core in texts[(res["conv_id"], res["turn_idx"])]


def test_search_pagination_slices_one_ranking(spark, xs_setup):
    idx, tr = xs_setup
    p1 = search(idx, tr, "term0001 term0002", k=3, page=1)
    p2 = search(idx, tr, "term0001 term0002", k=3, page=2)
    deep = [
        (r.conv_id, r.turn_idx)
        for r in idx.topk("term0001 term0002", "disjunctive", 6).collect()
    ]
    got = [(r["conv_id"], r["turn_idx"]) for r in p1["results"] + p2["results"]]
    assert got == deep
    with pytest.raises(ValueError, match="1-based"):
        search(idx, tr, "term0001", page=0)


def test_search_suggestions_follow_reference_rules(spark, xs_setup):
    idx, tr = xs_setup
    page = search(idx, tr, "term0001", k=5)
    for s in page["suggested_queries"]:
        assert s.startswith("term0001 ")  # single-word query: append-only form
        extra = s.split(" ", 1)[1]
        assert len(extra) > 3 and "term0001" not in extra


def test_search_over_segments(spark, xs_setup, tmp_path_factory):
    """Same surface over an LSM MultiIndex."""
    _, tr = xs_setup
    pdf = generate_transcripts("xs")
    d = tmp_path_factory.mktemp("svc")
    a = pdf[pdf.conv_id < "conv-000010"]
    b = pdf[pdf.conv_id >= "conv-000010"]
    roots = []
    for name, part in (("a", a), ("b", b)):
        out = str(d / name)
        build_index(
            spark,
            spark.createDataFrame(part[["conv_id", "turn_idx", "text"]]),
            out,
            BuildConfig(num_groups=2),
        )
        roots.append(out)
    multi = MultiIndex(spark, roots)
    single, _ = xs_setup
    pm = search(multi, tr, "term0001 term0002", k=5)
    ps = search(single, tr, "term0001 term0002", k=5)
    assert pm["results"] == ps["results"]
    assert pm["suggested_queries"] == ps["suggested_queries"]


def test_search_empty_query(spark, xs_setup):
    idx, tr = xs_setup
    page = search(idx, tr, "zzzznotaterm")
    assert page["results"] == [] and page["suggested_queries"] == []


def test_search_did_you_mean_on_zero_hits(spark, xs_setup):
    """A misspelled term query with zero hits carries an executable
    corrected query; a hopeless query (no ed<=1 neighbor) carries none."""
    idx, tr = xs_setup
    page = search(idx, tr, "termm0003")
    assert page["results"] == [] and page["did_you_mean"] == "term0003"
    rerun = search(idx, tr, page["did_you_mean"], analyzed=True)
    assert rerun["results"]  # the correction actually finds hits
    assert "did_you_mean" not in search(idx, tr, "zzzznotaterm")
    assert "did_you_mean" not in search(idx, tr, "term0003")  # has hits


def test_did_you_mean_roundtrip_stem_unstable(spark, xs_setup):
    """The corrected query is ANALYZED vocabulary: 'causx' corrects to
    'caus' (stem of cause/causes), which a re-analysis would corrupt to
    'cau' (Porter is not idempotent) — analyzed=True resubmission is the
    contract, and it must find hits where the naive round-trip finds none."""
    idx, tr = xs_setup
    page = search(idx, tr, "causx")
    assert page["results"] == [] and page["did_you_mean"] == "caus"
    assert search(idx, tr, "caus", analyzed=True)["results"]
    naive = search(idx, tr, "caus")  # re-stems to 'cau' -> zero hits
    assert naive["results"] == []


def test_did_you_mean_not_on_deep_pages(spark, xs_setup):
    """A matching query's out-of-range page is NOT 'found nothing' —
    no correction offered (and no vocabulary lookup paid)."""
    idx, tr = xs_setup
    page = search(idx, tr, "term0001 zzzqx", page=99)
    assert page["results"] == [] and "did_you_mean" not in page
    assert page["total_results"] > 0


def test_boolean_snippets_ignore_operator_words(spark, xs_setup):
    """'AND' must not enter the snippet locator (substring locate would
    center windows on 'and' inside unrelated words)."""
    idx, tr = xs_setup
    page = search(idx, tr, '"alpha" AND "beta"', mode="boolean", k=5)
    assert page["results"]
    for res in page["results"]:
        s = res["snippet"].lower()
        assert "alpha" in s or "beta" in s


def test_search_totals_pagination(spark, xs_setup):
    from search_engine_spark.corpus import generate_transcripts
    from search_engine_spark.oracle import build_oracle_index, oracle_match_count

    idx, tr = xs_setup
    oracle = build_oracle_index(generate_transcripts("xs"))
    page = search(idx, tr, "term0001 term0002", k=7)
    want = oracle_match_count(oracle, "term0001 term0002")
    assert page["total_results"] == want
    assert page["total_pages"] == -(-want // 7)
    lean = search(idx, tr, "term0001 term0002", k=7, include_total=False)
    assert "total_results" not in lean


def test_search_with_tombstones(spark, xs_setup):
    idx, tr = xs_setup
    base = search(idx, tr, "term0001 term0002", k=3)
    dead = base["results"][0]
    page = search(
        idx, tr, "term0001 term0002", k=3,
        tombstones=[(dead["conv_id"], dead["turn_idx"])],
    )
    keys = [(r["conv_id"], r["turn_idx"]) for r in page["results"]]
    assert (dead["conv_id"], dead["turn_idx"]) not in keys
    assert page["total_results"] == base["total_results"] - 1


@pytest.fixture(scope="module")
def xs_full_setup(spark, tmp_path_factory):
    """Full-shape corpus (role/tool/ts) — what --where predicates filter."""
    pdf = generate_transcripts("xs")
    out = str(tmp_path_factory.mktemp("svcf") / "idx")
    tr = spark.createDataFrame(pdf)
    build_index(spark, tr, out, BuildConfig(num_groups=2))
    return CompressedIndex(spark, out), tr


def test_search_where_scopes_results_and_totals(spark, xs_full_setup):
    idx, tr = xs_full_setup
    where = "role = 'assistant'"
    page = search(idx, tr, "term0001 term0002", k=5, where=where)
    got = [(r["conv_id"], r["turn_idx"], round(r["score"], 9)) for r in page["results"]]
    scope = tr.filter(where)
    want = [
        (r.conv_id, r.turn_idx, round(r.score, 9))
        for r in idx.topk("term0001 term0002", "disjunctive", 5, scope=scope).collect()
    ]
    assert got == want and len(got) == 5
    assert page["total_results"] == idx.match_count(
        "term0001 term0002", scope=scope
    )


def test_search_facets(spark, xs_full_setup):
    idx, tr = xs_full_setup
    page = search(idx, tr, "term0001 term0002", k=5, facet_col="role")
    want = {
        r["role"]: r["n"]
        for r in idx.facet_counts("term0001 term0002", tr, "role").collect()
    }
    assert page["facets"] == want
    assert sum(page["facets"].values()) == page["total_results"]
    scoped = search(
        idx, tr, "term0001 term0002", k=5, where="role = 'user'", facet_col="role"
    )
    assert set(scoped["facets"]) == {"user"}
    assert scoped["facets"]["user"] == scoped["total_results"]


def test_search_collapse(spark, xs_setup):
    idx, tr = xs_setup
    page = search(idx, tr, "term0001 term0002", k=5, collapse=True)
    got = [(r["conv_id"], r["turn_idx"], round(r["score"], 9)) for r in page["results"]]
    want = [
        (r.conv_id, r.turn_idx, round(r.score, 9))
        for r in idx.topk_conversations("term0001 term0002", "disjunctive", 5).collect()
    ]
    assert got == want and len(got) == 5
    convs = [c for c, _t, _s in got]
    assert len(convs) == len(set(convs))
    # ES field-collapsing contract: total still counts matching TURNS
    assert page["total_results"] == idx.match_count("term0001 term0002")
    # snippets come from the representative turn
    for res in page["results"]:
        assert res["snippet"]


def test_search_collapse_pagination(spark, xs_setup):
    idx, tr = xs_setup
    p1 = search(idx, tr, "term0001 term0002", k=3, page=1, collapse=True)
    p2 = search(idx, tr, "term0001 term0002", k=3, page=2, collapse=True)
    deep = idx.topk_conversations("term0001 term0002", "disjunctive", 6).collect()
    want2 = [(r.conv_id, round(r.score, 9)) for r in deep[3:6]]
    assert [(r["conv_id"], round(r["score"], 9)) for r in p2["results"]] == want2
    # pages partition the collapsed ranking: no conversation repeats
    c1 = {r["conv_id"] for r in p1["results"]}
    c2 = {r["conv_id"] for r in p2["results"]}
    assert not (c1 & c2) and len(c1) == len(c2) == 3
    assert p2["page"] == 2 and p2["total_results"] == p1["total_results"]


def test_search_recency(spark, xs_full_setup):
    from search_engine_spark.operators.recency import recency_topk

    idx, tr = xs_full_setup
    rec = {"now": "2026-01-01 01:00:00", "scale_s": 600.0}
    page = search(idx, tr, "term0001 term0002", k=5, recency=rec)
    got = [
        (r["conv_id"], r["turn_idx"], round(r["score"], 9),
         round(r["recency_score"], 9))
        for r in page["results"]
    ]
    want = [
        (r.conv_id, r.turn_idx, round(r.score, 9), round(r.recency_score, 9))
        for r in recency_topk(
            idx, tr, "term0001 term0002", rec["now"], rec["scale_s"], k=5
        ).collect()
    ]
    assert got == want and len(got) == 5
    # decay reorders, never filters: totals count the undecayed match set
    assert page["total_results"] == idx.match_count("term0001 term0002")
    for res in page["results"]:
        assert res["snippet"]
    with pytest.raises(ValueError, match="collapse"):
        search(idx, tr, "term0001", k=5, recency=rec, collapse=True)


def test_search_recency_pagination(spark, xs_full_setup):
    idx, tr = xs_full_setup
    rec = {"now": "2026-01-01 01:00:00", "scale_s": 600.0}
    p1 = search(idx, tr, "term0001 term0002", k=3, page=1, recency=rec)
    p2 = search(idx, tr, "term0001 term0002", k=3, page=2, recency=rec)
    k1 = {(r["conv_id"], r["turn_idx"]) for r in p1["results"]}
    k2 = {(r["conv_id"], r["turn_idx"]) for r in p2["results"]}
    assert not (k1 & k2) and len(k1) == len(k2) == 3
    # page 2 continues the same decayed ranking
    assert p2["results"][0]["recency_score"] <= p1["results"][-1]["recency_score"]


def test_search_synonyms(spark, xs_full_setup):
    from search_engine_spark.index.synonyms import write_synonyms
    from search_engine_spark.oracle import oracle_expand_synonyms

    idx, tr = xs_full_setup
    mapping = {"term0001": ["term0002", "term0003"]}
    # explicit mapping (no sidecar write needed)
    page = search(idx, tr, "term0001", k=5, synonyms=mapping)
    eq = oracle_expand_synonyms(mapping, "term0001")
    assert page["expanded_query"] == eq
    want = [
        (r.conv_id, r.turn_idx, round(r.score, 9))
        for r in idx.topk(eq, "disjunctive", 5, analyzed=True).collect()
    ]
    got = [
        (r["conv_id"], r["turn_idx"], round(r["score"], 9))
        for r in page["results"]
    ]
    assert got == want
    assert page["total_results"] == idx.match_count(eq, analyzed=True)
    with pytest.raises(ValueError, match="disjunctive"):
        search(idx, tr, "term0001", mode="conjunctive", synonyms=mapping)
    # sidecar-driven (synonyms=True) — persisted on the index root
    write_synonyms(spark, idx.paths.root, mapping)
    fresh = CompressedIndex(spark, idx.paths.root)
    page2 = search(fresh, tr, "term0001", k=5, synonyms=True)
    assert page2["expanded_query"] == eq
    assert [
        (r["conv_id"], r["turn_idx"]) for r in page2["results"]
    ] == [(c, t) for c, t, _s in got]


def test_search_synonyms_compose_with_prefix(spark, xs_full_setup):
    """* expansion then synonym splice — one analyzed rewrite end to end."""
    idx, tr = xs_full_setup
    mapping = {"term0001": ["term0003"]}
    page = search(idx, tr, "term0001*", k=5, synonyms=mapping)
    assert "term0003" in page["expanded_query"].split()
    eq = page["expanded_query"]
    want = [
        (r.conv_id, r.turn_idx, round(r.score, 9))
        for r in idx.topk(eq, "disjunctive", 5, analyzed=True).collect()
    ]
    got = [
        (r["conv_id"], r["turn_idx"], round(r["score"], 9))
        for r in page["results"]
    ]
    assert got == want


def test_search_highlight(spark, xs_setup):
    """highlight=True: snippets carry <em>-tagged query terms; stripping
    the tags recovers the plain-snippet response exactly, and every
    result's snippet tags ≥1 term (results match, so their window
    contains a hit by construction)."""
    idx, tr = xs_setup
    plain = search(idx, tr, "term0001 term0002", k=5)
    marked = search(idx, tr, "term0001 term0002", k=5, highlight=True)
    assert [(r["conv_id"], r["turn_idx"]) for r in marked["results"]] == [
        (r["conv_id"], r["turn_idx"]) for r in plain["results"]
    ]
    for mres, pres in zip(marked["results"], plain["results"]):
        assert "<em>" in mres["snippet"]
        stripped = mres["snippet"].replace("<em>", "").replace("</em>", "")
        assert stripped == pres["snippet"]


def test_search_highlight_suggestions_untagged(spark, xs_setup):
    """Suggestions are queries, not display text: highlight=True must not
    leak <em> tags into suggested_queries."""
    idx, tr = xs_setup
    plain = search(idx, tr, "term0001", k=5)
    marked = search(idx, tr, "term0001", k=5, highlight=True)
    assert marked["suggested_queries"] == plain["suggested_queries"]
    assert all("<em>" not in s for s in marked["suggested_queries"])


def test_search_hybrid(spark, xs_full_setup):
    """hybrid= serves the fused BM25+vector page: rows match
    hybrid_topk exactly, snippets/suggestions are assembled as usual,
    and total_results stays the lexical match count."""
    from search_engine_spark.pipeline.hybrid import hash_embed, hybrid_topk

    idx, tr = xs_full_setup
    emb = hash_embed(tr, 16).cache()
    page = search(idx, tr, "term0001 term0002", k=5,
                  hybrid={"embeddings": emb, "dim": 16, "depth": 20})
    got = [(r["conv_id"], r["turn_idx"], round(r["score"], 9)) for r in page["results"]]
    want = [
        (r.conv_id, r.turn_idx, round(r.score, 9))
        for r in hybrid_topk(idx, emb, "term0001 term0002", k=5, depth=20,
                             dim=16).collect()
    ]
    assert got == want and len(got) == 5
    assert all(r["snippet"] for r in page["results"])
    assert page["total_results"] == idx.match_count("term0001 term0002")


def test_search_hybrid_scoped(spark, xs_full_setup):
    from search_engine_spark.pipeline.hybrid import hash_embed, hybrid_topk

    idx, tr = xs_full_setup
    emb = hash_embed(tr, 16).cache()
    where = "role = 'user'"
    page = search(idx, tr, "term0001 term0002", k=5, where=where,
                  hybrid={"embeddings": emb, "dim": 16, "depth": 20})
    scope = tr.filter(where)
    want = [
        (r.conv_id, r.turn_idx, round(r.score, 9))
        for r in hybrid_topk(idx, emb, "term0001 term0002", k=5, depth=20,
                             dim=16, scope=scope).collect()
    ]
    got = [(r["conv_id"], r["turn_idx"], round(r["score"], 9)) for r in page["results"]]
    assert got == want and len(got) == 5
    assert page["total_results"] == idx.match_count("term0001 term0002", scope=scope)


def test_search_hybrid_rejects_incompatible(spark, xs_full_setup):
    from search_engine_spark.pipeline.hybrid import hash_embed

    idx, tr = xs_full_setup
    emb = hash_embed(tr, 16)
    hy = {"embeddings": emb, "dim": 16}
    for kw in (
        {"collapse": True},
        {"recency": {"now": "2026-01-01T00:00:00", "scale_s": 3600}},
        {"tombstones": [("conv-000001", 0)]},
        {"synonyms": {"foo": ["bar"]}},
        {"analyzed": True},
    ):
        with pytest.raises(ValueError):
            search(idx, tr, "term0001", k=5, hybrid=hy, **kw)
    with pytest.raises(ValueError):
        search(idx, tr, "kuber*", k=5, hybrid=hy)


def test_search_query_string_mode(spark, xs_full_setup):
    """mode='qs': the page equals the standalone query-string operator's
    ranking; totals count the same candidate set; field filters compose
    with --where; facade rewrite layers are rejected."""
    from search_engine_spark.operators.querystring import (
        count_query_string,
        search_query_string,
    )

    idx, tr = xs_full_setup
    qs = '+term0001 "term0002 term0003" -term0004 role:assistant'
    page = search(idx, tr, qs, mode="qs", k=5)
    got = [
        (r["conv_id"], r["turn_idx"], round(r["score"], 9))
        for r in page["results"]
    ]
    want = [
        (r.conv_id, r.turn_idx, round(r.score, 9))
        for r in search_query_string(idx, qs, 5, meta=tr).collect()
    ]
    assert got == want
    assert page["total_results"] == count_query_string(idx, qs, meta=tr)
    # snippets never show must_not text; positive literals locate
    for r in page["results"]:
        assert "term0001" in r["snippet"] or "term0002" in r["snippet"]


def test_search_query_string_where_intersects_filters(spark, xs_full_setup):
    from search_engine_spark.operators.querystring import search_query_string

    idx, tr = xs_full_setup
    qs = "role:assistant +term0001 term0002"
    both = search(
        idx, tr, qs, mode="qs", k=10, where="tool = 'bash'"
    )
    manual = search_query_string(
        idx, "+term0001 term0002", 10,
        scope=tr.filter("role = 'assistant' AND tool = 'bash'"),
    ).collect()
    assert [
        (r["conv_id"], r["turn_idx"]) for r in both["results"]
    ] == [(r.conv_id, r.turn_idx) for r in manual]


def test_search_query_string_facets_and_rejections(spark, xs_full_setup):
    idx, tr = xs_full_setup
    page = search(idx, tr, "+term0001 -term0002", mode="qs", k=5,
                  facet_col="role")
    assert sum(page["facets"].values()) == page["total_results"]
    with pytest.raises(ValueError, match="qs"):
        search(idx, tr, "term0001", mode="qs", synonyms=True)
    # recency DOES compose with qs (decay reorders the bool match set)
    page = search(idx, tr, "+term0001 -term0002", mode="qs", k=5,
                  recency={"now": "2026-01-01T01:00:00", "scale_s": 600})
    assert page["results"]
    rs = [r["recency_score"] for r in page["results"]]
    assert rs == sorted(rs, reverse=True)


def test_search_function_score(spark, xs_full_setup):
    from search_engine_spark.operators.function_score import function_score_topk

    idx, tr = xs_full_setup
    fns = {
        "functions": [
            {"kind": "field_value_factor", "field": "turn_idx",
             "factor": 0.5, "modifier": "log1p"},
            {"kind": "random_score", "seed": "svc"},
        ],
    }
    page = search(idx, tr, "term0001 term0002", k=5, functions=fns)
    got = [
        (r["conv_id"], r["turn_idx"], round(r["score"], 9),
         round(r["final_score"], 9))
        for r in page["results"]
    ]
    want = [
        (r.conv_id, r.turn_idx, round(r.score, 9), round(r.final_score, 9))
        for r in function_score_topk(
            idx, tr, "term0001 term0002", fns["functions"], k=5
        ).collect()
    ]
    assert got == want and len(got) == 5
    # shaping reorders, never filters: totals count the unshaped match set
    assert page["total_results"] == idx.match_count("term0001 term0002")
    for res in page["results"]:
        assert res["snippet"]
    with pytest.raises(ValueError, match="collapse"):
        search(idx, tr, "term0001", k=5, functions=fns, collapse=True)
    with pytest.raises(ValueError, match="ONE"):
        search(idx, tr, "term0001", k=5, functions=fns,
               recency={"now": "2026-01-01 01:00:00", "scale_s": 600.0})


def test_search_collapse_inner_hits(spark, xs_full_setup):
    from search_engine_spark.operators.innerhits import collapse_inner_hits

    idx, tr = xs_full_setup
    qt = "term0001 term0002"
    page = search(idx, tr, qt, k=3, collapse=True, inner_hits=2)
    got = [
        (r["conv_id"], round(r["conv_score"], 9), r["hit_rank"],
         r["turn_idx"], round(r["score"], 9))
        for r in page["results"]
    ]
    want = [
        (r.conv_id, round(r.conv_score, 9), r.hit_rank, r.turn_idx,
         round(r.score, 9))
        for r in collapse_inner_hits(idx, qt, k=3, inner_n=2).collect()
    ]
    assert got == want
    # 3 conversations × ≤2 hits; every row has a snippet, rank-1 leads
    assert len({r["conv_id"] for r in page["results"]}) == 3
    for res in page["results"]:
        assert res["snippet"]
    # pagination slices conversations: pages partition the conv ranking
    p1 = search(idx, tr, qt, k=2, page=1, collapse=True, inner_hits=2)
    p2 = search(idx, tr, qt, k=2, page=2, collapse=True, inner_hits=2)
    c1 = {r["conv_id"] for r in p1["results"]}
    c2 = {r["conv_id"] for r in p2["results"]}
    assert c1 and c2 and not (c1 & c2)
    # total_results still counts TURNS (the ES collapse contract)
    assert page["total_results"] == idx.match_count(qt)
    with pytest.raises(ValueError, match="collapse"):
        search(idx, tr, qt, k=3, inner_hits=2)
