"""Query-time synonym expansion (index/synonyms.py) vs the oracle.

Lucene ``SynonymGraphFilter`` query-time shape: a curated raw-word
mapping is analyzed ONCE at write time (Porter is not idempotent), each
analyzed query term splices its synonyms in after it, and the rewrite
executes through the ordinary ``analyzed=True`` disjunctive path —
BM25 stats untouched, no reindex on synonym edits.
"""

from __future__ import annotations

import pytest

from search_engine_spark.config import BuildConfig
from search_engine_spark.corpus import generate_transcripts
from search_engine_spark.index.build import build_index
from search_engine_spark.index.multi import MultiIndex
from search_engine_spark.index.reader import CompressedIndex
from search_engine_spark.index.synonyms import (
    analyze_mapping,
    expand_terms,
    load_synonyms,
    write_synonyms,
)
from search_engine_spark.oracle import (
    build_oracle_index,
    oracle_expand_synonyms,
    oracle_topk,
)
from search_engine_spark.textproc import analyze_text

#: Raw-word mapping over xs-corpus vocabulary: synthetic terms, an
#: english word whose stem differs from its surface form ("running" →
#: "run"), and a multi-word synonym phrase.
MAPPING = {
    "term0001": ["term0002", "term0003"],
    "running": "caresses",
    "window": ["merge sort"],
}

_QUERIES = [
    "term0001",
    "term0001 term0005",
    "running window",
    "zzznothing term0001",
]


@pytest.fixture(scope="module")
def xs_pdf():
    return generate_transcripts("xs")


@pytest.fixture(scope="module")
def xs_index(spark, xs_pdf, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("syn") / "idx")
    build_index(
        spark,
        spark.createDataFrame(xs_pdf[["conv_id", "turn_idx", "text"]]),
        out,
        BuildConfig(num_groups=2),
    )
    return CompressedIndex(spark, out)


@pytest.fixture(scope="module")
def xs_oracle(xs_pdf):
    return build_oracle_index(xs_pdf)


def test_analyze_mapping_shape():
    syn = analyze_mapping(MAPPING)
    # keys are analyzed (stemmed) single terms
    assert analyze_text("running")[0] in syn
    # multi-word phrase flattens to its analyzed terms, in order
    assert syn[analyze_text("window")[0]] == analyze_text("merge sort")
    # values are analyzed too
    assert syn["term0001"] == ["term0002", "term0003"]


def test_analyze_mapping_drops_key_and_dedupes():
    syn = analyze_mapping({"merge": ["merge", "merging", "merges"]})
    key = analyze_text("merge")[0]
    vals = syn.get(key, [])
    assert key not in vals
    assert len(vals) == len(set(vals))


def test_analyze_mapping_rejects_bad_keys():
    with pytest.raises(ValueError, match="exactly one term"):
        analyze_mapping({"merge sort": ["x"]})  # multi-token key
    with pytest.raises(ValueError, match="exactly one term"):
        analyze_mapping({"the": ["x"]})  # stopword key → zero terms


def test_analyze_mapping_empty_values_drop_out():
    # value analyzes to only the key itself → rule drops out entirely
    assert analyze_mapping({"merge": ["merge"]}) == {}


def test_expand_terms_splice_order():
    syn = {"a": ["x", "y"], "b": ["x"]}
    assert expand_terms(["a", "b"], syn) == ["a", "x", "y", "b"]
    assert expand_terms(["b", "a"], syn) == ["b", "x", "a", "y"]
    assert expand_terms(["c"], syn) == ["c"]


def test_engine_matches_oracle_rewrite(xs_index):
    for q in _QUERIES:
        assert xs_index.expand_synonyms(q, MAPPING) == oracle_expand_synonyms(
            MAPPING, q
        ), q


def test_expanded_topk_matches_oracle(xs_index, xs_oracle):
    for q in _QUERIES:
        eq = xs_index.expand_synonyms(q, MAPPING)
        got = [
            (r.conv_id, r.turn_idx, round(r.score, 9))
            for r in xs_index.topk(eq, "disjunctive", 10, analyzed=True).collect()
        ]
        want = [
            (key[0], key[1], round(s, 9))
            for key, s in oracle_topk(
                xs_oracle,
                oracle_expand_synonyms(MAPPING, q),
                "disjunctive",
                10,
                analyzed=True,
            )
        ]
        assert got == want, q


def test_expansion_widens_results(xs_index, xs_oracle):
    """A synonym must actually recall docs the literal query misses."""
    eq = xs_index.expand_synonyms("term0001", MAPPING)
    base = {
        key for key, _s in oracle_topk(xs_oracle, "term0001", "disjunctive", 1 << 62)
    }
    widened = {
        (r.conv_id, r.turn_idx)
        for r in xs_index.matches("term0001 term0002 term0003", analyzed=True).collect()
    }
    assert eq.split() == ["term0001", "term0002", "term0003"]
    assert len(widened) > len(base)


def test_composes_with_prefix_expansion(xs_index):
    """analyzed=True input: a prior prefix/fuzzy expand_query pass (whose
    vocabulary terms must NOT be re-stemmed) feeds the synonym splice."""
    eq = xs_index.expand_query("term0001* running")
    assert eq is not None
    combined = xs_index.expand_synonyms(eq, MAPPING, analyzed=True).split()
    # the prefix-expanded literal term0001 still picks up its synonyms
    i = combined.index("term0001")
    assert combined[i + 1 : i + 3] == ["term0002", "term0003"]
    # and the analyzed stem of "running" picks up the "caresses" stem
    from search_engine_spark.textproc import analyze_text as _an

    run_stem, caress_stem = _an("running")[0], _an("caresses")[0]
    j = combined.index(run_stem)
    assert combined[j + 1] == caress_stem


def test_sidecar_roundtrip(spark, xs_index):
    root = xs_index.paths.root
    write_synonyms(spark, root, MAPPING)
    assert load_synonyms(spark, root) == analyze_mapping(MAPPING)
    # persisted sidecar drives expansion when no explicit mapping given
    fresh = CompressedIndex(spark, root)
    assert fresh.expand_synonyms("term0001") == oracle_expand_synonyms(
        MAPPING, "term0001"
    )
    # explicit mapping overrides the sidecar
    assert fresh.expand_synonyms(
        "term0001", {"term0001": ["term0099"]}
    ) == "term0001 term0099"


def test_no_sidecar_is_analyzed_passthrough(spark, xs_pdf, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("syn_plain") / "idx")
    build_index(
        spark,
        spark.createDataFrame(xs_pdf[["conv_id", "turn_idx", "text"]]),
        out,
        BuildConfig(num_groups=2),
    )
    idx = CompressedIndex(spark, out)
    assert idx.expand_synonyms("Running the term0001") == " ".join(
        analyze_text("Running the term0001")
    )


def test_empty_mapping_writes_empty_sidecar(spark, tmp_path):
    root = str(tmp_path)
    write_synonyms(spark, root, {})
    assert load_synonyms(spark, root) == {}


def test_multi_index_uses_base_segment_sidecar(
    spark, xs_pdf, xs_index, tmp_path_factory
):
    """Sidecar lives on segment 0; MultiIndex expansion == single-index
    expansion, and the expanded query executes identically."""
    d = tmp_path_factory.mktemp("syn_multi")
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
    write_synonyms(spark, roots[0], MAPPING)
    multi = MultiIndex(spark, roots)
    for q in _QUERIES:
        eq = multi.expand_synonyms(q)
        assert eq == oracle_expand_synonyms(MAPPING, q), q
        got_multi = [
            (r.conv_id, r.turn_idx, round(r.score, 9))
            for r in multi.topk(eq, "disjunctive", 10, analyzed=True).collect()
        ]
        got_single = [
            (r.conv_id, r.turn_idx, round(r.score, 9))
            for r in xs_index.topk(eq, "disjunctive", 10, analyzed=True).collect()
        ]
        assert got_multi == got_single, q
