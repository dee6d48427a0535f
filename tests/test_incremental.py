"""Incremental index extension (extend.py) vs from-scratch builds.

The invariant under test: for any split of a corpus into base + delta,
``extend_index(build(base), delta)`` answers every query identically to
``build(base ∪ delta)`` — across all three delta shapes (appended
conversations, appended turns inside existing conversations, and
lexicographically interleaved new conversations, which breaks doc-id
order isomorphism and must flip the reader to tie-safe kernels).
"""

from __future__ import annotations

import pandas as pd
import pytest

from search_engine_spark.config import BuildConfig
from search_engine_spark.corpus import REFERENCE_QUERIES, generate_transcripts
from search_engine_spark.index.build import build_index, load_meta
from search_engine_spark.index.extend import extend_index
from search_engine_spark.index.reader import CompressedIndex

# disjunctive head/tail, conjunctive, phrase, boolean — every kernel path
_PROBE_QUERIES = [REFERENCE_QUERIES[i] for i in (0, 1, 2, 3, 7)] + [
    {"query_text": '"phrase alpha beta"', "mode": "phrase", "k": 10},
    {"query_text": '"alpha" AND "beta"', "mode": "boolean", "k": 10},
    {"query_text": '"alpha" NOT "beta"', "mode": "boolean", "k": 10},
]


def _rows(index: CompressedIndex, q: dict) -> list[tuple]:
    return [
        (r.conv_id, r.turn_idx, round(r.score, 9))
        for r in index.topk(q["query_text"], q["mode"], q.get("k", 10)).collect()
    ]


_FULL_ROWS_CACHE: dict[tuple, list] = {}


def _assert_same_answers(full: CompressedIndex, inc: CompressedIndex) -> None:
    assert inc.n_docs == full.n_docs
    assert inc.avgdl == pytest.approx(full.avgdl, rel=1e-12)
    for i, q in enumerate(_PROBE_QUERIES):
        key = (id(full), i)  # the full indexes are module-scoped fixtures
        if key not in _FULL_ROWS_CACHE:
            _FULL_ROWS_CACHE[key] = _rows(full, q)
        assert _rows(inc, q) == _FULL_ROWS_CACHE[key], q["query_text"]


def _spark_df(spark, pdf: pd.DataFrame):
    return spark.createDataFrame(pdf[["conv_id", "turn_idx", "text"]])


@pytest.fixture(scope="module")
def sm_pdf():
    return generate_transcripts("sm")


@pytest.fixture(scope="module")
def xs_pdf():
    return generate_transcripts("xs")


@pytest.fixture(scope="module")
def sm_full_index(spark, sm_pdf, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("inc") / "full")
    build_index(spark, _spark_df(spark, sm_pdf), out, BuildConfig(num_groups=4))
    return CompressedIndex(spark, out)


@pytest.fixture(scope="module")
def xs_full_index(spark, xs_pdf, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("inc") / "xsfull")
    build_index(spark, _spark_df(spark, xs_pdf), out, BuildConfig(num_groups=2))
    return CompressedIndex(spark, out)


def test_extend_with_new_conversations(spark, sm_pdf, sm_full_index, tmp_path_factory):
    """Time-ordered ingest: new conv ids sort after existing ones, so
    order isomorphism (and the exact-cut/WAND path) is preserved."""
    d = str(tmp_path_factory.mktemp("inc"))
    base = sm_pdf[sm_pdf.conv_id < "conv-000120"]
    delta = sm_pdf[sm_pdf.conv_id >= "conv-000120"]
    build_index(spark, _spark_df(spark, base), f"{d}/base", BuildConfig(num_groups=4))
    extend_index(spark, f"{d}/base", _spark_df(spark, delta), f"{d}/ext")
    ext = CompressedIndex(spark, f"{d}/ext")
    meta = load_meta(f"{d}/ext")
    assert meta["docid_order_isomorphic"] is True
    assert meta["n_docs_before_extend"] == len(base)
    assert ext.tie_safe is False  # fast exact-cut kernels stay on
    _assert_same_answers(sm_full_index, ext)


def test_extend_with_appended_turns(spark, xs_pdf, xs_full_index, tmp_path_factory):
    """New turns of EXISTING conversations interleave inside old posting
    runs — exercises the merge kernel's per-posting reorder fallback."""
    d = str(tmp_path_factory.mktemp("inc"))
    base = xs_pdf[xs_pdf.turn_idx < 3]
    delta = xs_pdf[xs_pdf.turn_idx >= 3]
    build_index(spark, _spark_df(spark, base), f"{d}/base", BuildConfig(num_groups=2))
    extend_index(spark, f"{d}/base", _spark_df(spark, delta), f"{d}/ext")
    ext = CompressedIndex(spark, f"{d}/ext")
    assert load_meta(f"{d}/ext")["docid_order_isomorphic"] is True
    _assert_same_answers(xs_full_index, ext)


def test_extend_interleaved_convs_is_tie_safe(spark, xs_pdf, xs_full_index, tmp_path_factory):
    """New conv ids sorting BEFORE existing ones break doc-id order
    isomorphism: the extend must record that, the reader must switch to
    tie-safe kernels, and answers must still match a full rebuild."""
    d = str(tmp_path_factory.mktemp("inc"))
    conv_num = xs_pdf.conv_id.str.slice(5).astype(int)
    base = xs_pdf[conv_num % 2 == 0]
    delta = xs_pdf[conv_num % 2 == 1]
    build_index(spark, _spark_df(spark, base), f"{d}/base", BuildConfig(num_groups=2))
    extend_index(spark, f"{d}/base", _spark_df(spark, delta), f"{d}/ext")
    ext = CompressedIndex(spark, f"{d}/ext")
    assert load_meta(f"{d}/ext")["docid_order_isomorphic"] is False
    assert ext.tie_safe is True
    _assert_same_answers(xs_full_index, ext)


def test_extend_chain_twice(spark, xs_pdf, xs_full_index, tmp_path_factory):
    """extend(extend(build(a), b), c) == build(a ∪ b ∪ c)."""
    d = str(tmp_path_factory.mktemp("inc"))
    a = xs_pdf[xs_pdf.conv_id < "conv-000008"]
    b = xs_pdf[(xs_pdf.conv_id >= "conv-000008") & (xs_pdf.conv_id < "conv-000015")]
    c = xs_pdf[xs_pdf.conv_id >= "conv-000015"]
    build_index(spark, _spark_df(spark, a), f"{d}/base", BuildConfig(num_groups=2))
    extend_index(spark, f"{d}/base", _spark_df(spark, b), f"{d}/e1")
    extend_index(spark, f"{d}/e1", _spark_df(spark, c), f"{d}/e2")
    _assert_same_answers(xs_full_index, CompressedIndex(spark, f"{d}/e2"))


def test_extend_rejects_already_indexed_turns(spark, xs_pdf, tmp_path_factory):
    """Re-submitting an indexed (conv, turn) is an update — fail loud."""
    d = str(tmp_path_factory.mktemp("inc"))
    base = xs_pdf[xs_pdf.conv_id < "conv-000010"]
    build_index(spark, _spark_df(spark, base), f"{d}/base", BuildConfig(num_groups=2))
    overlap = xs_pdf[xs_pdf.conv_id < "conv-000002"]
    with pytest.raises(ValueError, match="already present"):
        extend_index(spark, f"{d}/base", _spark_df(spark, overlap), f"{d}/ext")


def test_extend_rejects_in_place(spark, xs_pdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("inc"))
    base = xs_pdf[xs_pdf.conv_id < "conv-000010"]
    build_index(spark, _spark_df(spark, base), f"{d}/base", BuildConfig(num_groups=2))
    with pytest.raises(ValueError, match="out_dir"):
        extend_index(spark, f"{d}/base", _spark_df(spark, base), f"{d}/base")
