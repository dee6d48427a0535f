"""Codec round-trip tests (SURVEY.md §5.2 item 1)."""

from __future__ import annotations

import numpy as np
import pytest

from search_engine_spark.index.codec import (
    decode_positions,
    decode_postings_block,
    delta_decode,
    delta_encode,
    encode_positions,
    encode_postings_block,
    varbyte_decode,
    varbyte_encode,
)

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


def test_varbyte_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


def test_varbyte_known_values():
    # 0 → 0x00; 127 → 0x7F; 128 → 0x80 0x01 (LSB-first 7-bit groups)
    assert varbyte_encode(np.array([0])) == b"\x00"
    assert varbyte_encode(np.array([127])) == b"\x7f"
    assert varbyte_encode(np.array([128])) == b"\x80\x01"
    assert varbyte_encode(np.array([300])) == b"\xac\x02"


def test_varbyte_roundtrip_ranges():
    rng = np.random.default_rng(7)
    for hi in (1, 128, 1 << 14, 1 << 21, 1 << 35, 1 << 52, (1 << 63) - 1):
        vals = rng.integers(0, hi, size=1000, dtype=np.uint64)
        assert np.array_equal(varbyte_decode(varbyte_encode(vals)), vals)


def test_varbyte_u64_max():
    vals = np.array([0, 1, (1 << 64) - 1, 1 << 63], dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(vals)), vals)


def test_delta_requires_ascending():
    with pytest.raises(ValueError):
        delta_encode(np.array([5, 3]))


def test_postings_block_roundtrip():
    rng = np.random.default_rng(11)
    doc_ids = np.unique(rng.integers(0, 10**12, size=5000))
    tfs = rng.integers(1, 500, size=doc_ids.size)
    db, tb = encode_postings_block(doc_ids, tfs)
    d2, t2 = decode_postings_block(db, tb)
    assert np.array_equal(d2, doc_ids)
    assert np.array_equal(t2, tfs)
    # compression sanity: way under 8 bytes/doc for clustered ids
    assert len(db) < doc_ids.size * 8


def test_positions_roundtrip():
    rng = np.random.default_rng(13)
    lists = [np.sort(rng.choice(2000, size=rng.integers(0, 40), replace=False)) for _ in range(200)]
    lists.append(np.array([], dtype=np.int64))
    blob = encode_positions(lists)
    out = decode_positions(blob, len(lists))
    assert len(out) == len(lists)
    for a, b in zip(lists, out):
        assert np.array_equal(np.asarray(a, dtype=np.int64), b)


def test_positions_all_empty():
    blob = encode_positions([np.array([], dtype=np.int64)] * 3)
    out = decode_positions(blob, 3)
    assert all(x.size == 0 for x in out)


if HAVE_HYP:

    @given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1), max_size=300))
    @settings(max_examples=200, deadline=None)
    def test_varbyte_roundtrip_hypothesis(vals):
        a = np.array(vals, dtype=np.uint64)
        assert np.array_equal(varbyte_decode(varbyte_encode(a)), a)

    @given(
        st.lists(st.integers(min_value=0, max_value=10**14), min_size=1, max_size=300)
    )
    @settings(max_examples=200, deadline=None)
    def test_delta_roundtrip_hypothesis(vals):
        a = np.unique(np.array(vals, dtype=np.int64))
        assert np.array_equal(delta_decode(delta_encode(a)), a)
