"""PageRank (vs dense-matrix oracle) and snippet-generation tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_pagerank_matches_dense_oracle(spark):
    from search_engine_spark.pipeline.graph import pagerank, pagerank_numpy

    edge_list = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"),  # d is a source; e below is dangling
        ("c", "e"),
    ]
    edges = spark.createDataFrame(edge_list, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
    want = pagerank_numpy(edge_list)
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_star_graph(spark):
    from search_engine_spark.pipeline.graph import pagerank, pagerank_numpy

    edge_list = [("x1", "hub"), ("x2", "hub"), ("x3", "hub"), ("hub", "x1")]
    edges = spark.createDataFrame(edge_list, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
    want = pagerank_numpy(edge_list)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-12)
    # the hub out-ranks the pure-source leaves x2/x3
    assert got["hub"] > got["x2"] == got["x3"]


def test_pagerank_reliable_checkpoint_path(spark, tmp_path):
    """checkpoint_dir= selects reliable checkpoint() over localCheckpoint;
    results are identical and checkpoint files actually land in the dir."""
    import os

    from search_engine_spark.pipeline.graph import pagerank, pagerank_numpy

    edge_list = [("a", "b"), ("b", "c"), ("c", "a"), ("d", "c")]
    edges = spark.createDataFrame(edge_list, "src string, dst string")
    ckpt = str(tmp_path / "ckpt")
    got = {r["node"]: r["rank"] for r in pagerank(edges, checkpoint_dir=ckpt).collect()}
    want = pagerank_numpy(edge_list)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-12)
    assert os.path.isdir(ckpt) and os.listdir(ckpt), "no reliable checkpoint written"


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    from search_engine_spark.pipeline.graph import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(6)], "node long")
    edges = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "src long, dst long")
    ckpt = str(tmp_path / "cc_ckpt")
    got = {
        r["node"]: r["comp"]
        for r in connected_components(nodes, edges, checkpoint_dir=ckpt).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}


def test_write_pagerank_artifact_and_blend_identity(spark, tmp_path):
    """write_pagerank persists the (node, rank) table; blend_topk over
    the persisted artifact is row-identical to the inline-recompute
    path it replaces."""
    from search_engine_spark.pipeline.graph import (
        blend_topk,
        term_cooccurrence_edges,
        write_pagerank,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark merge window spark data"),
            (2, "data stream merge spark window"),
            (3, "window vector data stream spark"),
            (4, "merge merge data window stream"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "pr")
    write_pagerank(term_cooccurrence_edges(docs), path)
    pr = spark.read.parquet(path)
    assert set(pr.columns) == {"node", "rank"}
    terms = ["spark", "merge"]
    inline = blend_topk(docs, terms, k=4).collect()
    artifact = blend_topk(docs, terms, k=4, rank_table=pr).collect()
    assert [tuple(r) for r in artifact] == [tuple(r) for r in inline]


def test_term_cooccurrence_edges(spark):
    from search_engine_spark.pipeline.graph import term_cooccurrence_edges

    docs = spark.createDataFrame(
        [(1, "a b c a b"), (2, "b b c")], "doc_id long, text string"
    )
    got = {(r["src"], r["dst"]) for r in term_cooccurrence_edges(docs).collect()}
    # distinct consecutive pairs, self-loops (b b) dropped
    assert got == {("a", "b"), ("b", "c"), ("c", "a")}


def test_snippets_window_and_ellipses(spark):
    from search_engine_spark.operators.snippets import snippets

    long_text = ("x " * 100) + "needle haystack " + ("y " * 100)
    docs = spark.createDataFrame(
        [
            (1, "needle at the very start of a short text"),
            (2, long_text.strip()),
            (3, "no match here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in snippets(docs, ["needle"]).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["hit_pos"] == 1
    assert rows[1]["snippet"].startswith("needle")
    assert not rows[1]["snippet"].startswith("...")
    assert rows[2]["snippet"].startswith("...") and rows[2]["snippet"].endswith("...")
    assert "needle" in rows[2]["snippet"]


def test_snippets_earliest_term_wins(spark):
    from search_engine_spark.operators.snippets import snippets

    docs = spark.createDataFrame(
        [(1, "zzz beta zzz alpha zzz")], "doc_id long, text string"
    )
    r = snippets(docs, ["alpha", "beta"]).collect()[0]
    assert r["hit_pos"] == 5  # 'beta' occurs first
