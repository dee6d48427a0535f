"""Query-term highlighting (operators/highlight.py).

ES ``highlight`` semantics on the reference snippet generator's
surface-text contract: every case-insensitive occurrence tagged, the
longest query term wins at overlaps, original casing preserved, misses
dropped.  Cross-checked row-for-row against the DuckDB twin
(highlight_sql) on the same rows.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from search_engine_spark.operators.highlight import (
    highlight,
    highlight_sql,
    highlighted_snippets,
    term_pattern,
)
from search_engine_spark.operators.snippets import snippets

_DOCS = [
    (1, "A Vector of values"),
    (2, "vec and VECTOR and vectors"),
    (3, "stream of streams, Stream"),
    (4, "nothing relevant here"),
    (5, "c++ stream parser"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(_DOCS, "doc_id int, text string").cache()


def _by_id(df):
    return {r.doc_id: (r.n_hits, r.highlighted) for r in df.collect()}


def test_highlight_tags_every_occurrence(docs_df):
    out = _by_id(highlight(docs_df, ["vector", "stream"]))
    assert out[1] == (1, "A <em>Vector</em> of values")
    # 'vectors' contains 'vector' — substring semantics, like the
    # reference's indexOf-based snippet window
    assert out[2] == (2, "vec and <em>VECTOR</em> and <em>vector</em>s")
    assert out[3] == (3, "<em>stream</em> of <em>stream</em>s, <em>Stream</em>")
    assert 4 not in out  # no hit → no highlight row
    assert out[5] == (1, "c++ <em>stream</em> parser")


def test_longest_term_wins_at_overlap(docs_df):
    """'vec' is a prefix of 'vector': the alternation is length-desc, so
    a position matching both tags the longer term (both engines are
    leftmost-first on alternation)."""
    out = _by_id(highlight(docs_df, ["vec", "vector"]))
    assert out[2] == (3, "<em>vec</em> and <em>VECTOR</em> and <em>vector</em>s")
    assert out[1] == (1, "A <em>Vector</em> of values")


def test_metacharacters_escaped(docs_df):
    out = _by_id(highlight(docs_df, ["c++ stream"]))
    assert out == {5: (1, "<em>c++ stream</em> parser")}


def test_term_pattern_contract():
    assert term_pattern(["Vec", "vector", "vec"]) == "(vector|vec)"
    with pytest.raises(ValueError):
        term_pattern(["", None])


def test_duckdb_twin_identical(docs_df):
    terms = ["vector", "vec", "stream"]
    got = _by_id(highlight(docs_df, terms))
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(_DOCS, columns=["doc_id", "text"]))
    want = {
        int(d): (int(n), h)
        for d, n, h in con.execute(highlight_sql("documents", terms)).fetchall()
    }
    assert got == want


def test_highlighted_snippets_compose(docs_df):
    terms = ["vector", "stream"]
    plain = {r.doc_id: (r.hit_pos, r.snippet) for r in snippets(docs_df, terms).collect()}
    marked = {
        r.doc_id: (r.hit_pos, r.snippet)
        for r in highlighted_snippets(docs_df, terms).collect()
    }
    assert set(marked) == set(plain)
    for doc_id, (pos, snip) in marked.items():
        assert pos == plain[doc_id][0]
        # stripping the tags recovers the plain snippet exactly
        assert snip.replace("<em>", "").replace("</em>", "") == plain[doc_id][1]
        assert "<em>" in snip
