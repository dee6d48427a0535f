"""Build edge cases: tiny corpora, all-empty text, stream-offset property."""

from __future__ import annotations

import numpy as np
import pytest

from search_engine_spark.config import BuildConfig
from search_engine_spark.index.build import build_index
from search_engine_spark.index.codec import stream_byte_offsets, varbyte_encode
from search_engine_spark.index.reader import CompressedIndex

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


def _build(spark, tmp_path, rows, **cfg):
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["lit"]).lit(None).cast("timestamp"))
    out = str(tmp_path / "idx")
    build_index(spark, df, out, BuildConfig(num_groups=2, **cfg))
    return CompressedIndex(spark, out)


def test_single_doc_corpus(spark, tmp_path):
    idx = _build(spark, tmp_path, [("c0", 0, "user", "hello world hello", None)])
    assert idx.n_docs == 1
    rows = idx.topk("hello", "disjunctive", 10).collect()
    assert [(r["conv_id"], r["turn_idx"]) for r in rows] == [("c0", 0)]


def test_all_empty_text(spark, tmp_path):
    idx = _build(
        spark, tmp_path,
        [("c0", 0, "user", "", None), ("c1", 0, "user", "", None)],
    )
    assert idx.n_docs == 2
    assert idx.avgdl == 0.0
    assert idx.topk("anything", "disjunctive", 10).collect() == []


def test_mixed_empty_and_stopword_only(spark, tmp_path):
    idx = _build(
        spark, tmp_path,
        [
            ("c0", 0, "user", "", None),
            ("c0", 1, "user", "the of and a", None),  # all index-side stopwords
            ("c1", 0, "user", "searchable content here", None),
        ],
    )
    assert idx.n_docs == 3  # every turn counts toward N
    rows = idx.topk("searchable", "disjunctive", 10).collect()
    assert [(r["conv_id"], r["turn_idx"]) for r in rows] == [("c1", 0)]


def test_stream_byte_offsets_manual():
    vals = np.array([0, 300, 7, 128, 5], dtype=np.uint64)
    blob = varbyte_encode(vals)
    # counts [2, 0, 3]: doc0 = vals[0:2], doc1 = none, doc2 = vals[2:5]
    off = stream_byte_offsets(blob, np.array([2, 0, 3]))
    assert off[0] == 0 and off[-1] == len(blob)
    from search_engine_spark.index.codec import varbyte_decode

    assert np.array_equal(varbyte_decode(bytes(blob[off[0]:off[1]])), vals[:2])
    assert off[1] == off[2]  # zero-count doc spans no bytes
    assert np.array_equal(varbyte_decode(bytes(blob[off[2]:off[3]])), vals[2:])


if HAVE_HYP:

    @given(
        st.lists(
            st.lists(st.integers(min_value=0, max_value=1 << 40), max_size=20),
            min_size=1,
            max_size=40,
        )
    )
    @settings(max_examples=150, deadline=None)
    def test_stream_byte_offsets_roundtrip(groups):
        from search_engine_spark.index.codec import varbyte_decode

        flat = np.array([v for g in groups for v in g], dtype=np.uint64)
        counts = np.array([len(g) for g in groups], dtype=np.int64)
        blob = varbyte_encode(flat)
        off = stream_byte_offsets(blob, counts)
        assert off[0] == 0 and off[-1] == len(blob)
        for i, g in enumerate(groups):
            part = varbyte_decode(bytes(blob[off[i] : off[i + 1]]))
            assert np.array_equal(part, np.array(g, dtype=np.uint64))
