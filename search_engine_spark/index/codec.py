"""Delta + varbyte posting-list compression (numpy-vectorized).

The reference stores postings as PostgreSQL rows (`inverted_index`,
`word_position` — Indexer/Entities/InvertedIndex.java:9-37,
WordPosition.java:9-34).  Our engine stores them as compressed binary
blobs inside Parquet/Iceberg rows: sorted doc ids are delta-encoded then
varbyte (LEB128, 7-bit groups, little-endian, continuation bit 0x80)
packed; term frequencies and positions likewise.  All encode/decode is
numpy array code — no per-value Python in the hot path — so it runs
fast inside Arrow-batched pandas UDF kernels.

Wire formats
------------
* ``varbyte_encode(a)``: each uint64 value → 1-10 bytes, 7 bits per
  byte little-endian, high bit set on all but the final byte.
* doc-id blob: varbyte(delta(doc_ids)) with delta[0] = doc_ids[0].
* tf blob: varbyte(tfs) (no delta — tfs are small and unordered).
* positions blob: varbyte(concat(n_pos_per_doc) ++ flat deltas), where
  each doc's position list is independently delta-encoded (first value
  absolute).  Positions are token offsets within one turn
  (SURVEY.md §7.3 "positions semantics").
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_SHIFTS = np.arange(0, 70, 7, dtype=np.uint64)  # 10 groups cover 64 bits


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a non-negative integer array to varbyte bytes."""
    a = np.ascontiguousarray(values, dtype=_U64)
    if a.size == 0:
        return b""
    # number of 7-bit groups per value: 1 + floor(log128(v)) for v>0
    nbits = np.zeros(a.shape, dtype=np.int64)
    nz = a > 0
    # bit_length via log2 on float is unsafe for >2^53; use a loop over the
    # 10 possible byte counts instead (vectorized comparisons).
    counts = np.ones(a.shape, dtype=np.int64)
    for g in range(1, 10):
        counts += (a >= (_U64(1) << _SHIFTS[g])).astype(np.int64)
    del nbits, nz
    total = int(counts.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(counts)  # index one past each value's last byte
    starts = ends - counts
    # write each byte layer g: values needing >g bytes contribute byte g
    mask7 = _U64(0x7F)
    for g in range(10):
        sel = counts > g
        if not sel.any():
            break
        byte_vals = ((a[sel] >> _SHIFTS[g]) & mask7).astype(np.uint8)
        is_last = counts[sel] == (g + 1)
        byte_vals = np.where(is_last, byte_vals, byte_vals | np.uint8(0x80))
        out[starts[sel] + g] = byte_vals
    return out.tobytes()


def varbyte_decode(blob: bytes | bytearray | memoryview) -> np.ndarray:
    """Decode varbyte bytes back to a uint64 array."""
    b = np.frombuffer(blob, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=_U64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    n = ends.size
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    payload = (b & 0x7F).astype(_U64)
    # shift each byte by 7 * (offset within its value)
    offsets = np.arange(b.size, dtype=np.int64) - np.repeat(starts, ends - starts + 1)
    shifted = payload << (offsets.astype(_U64) * _U64(7))
    sums = np.add.reduceat(shifted, starts)
    return sums


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    a = np.ascontiguousarray(sorted_vals, dtype=np.int64)
    if a.size == 0:
        return a.astype(_U64)
    d = np.empty(a.shape, dtype=np.int64)
    d[0] = a[0]
    np.subtract(a[1:], a[:-1], out=d[1:])
    if d.size > 1 and d[1:].min() < 0:
        raise ValueError("delta_encode requires ascending input")
    return d.astype(_U64)


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(deltas.astype(np.int64))


def encode_postings_block(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """(sorted doc_ids, tfs) → (doc_blob, tf_blob)."""
    return varbyte_encode(delta_encode(doc_ids)), varbyte_encode(tfs)


def decode_postings_block(doc_blob: bytes, tf_blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """(doc_blob, tf_blob) → (int64 doc_ids ascending, int64 tfs)."""
    return (
        delta_decode(varbyte_decode(doc_blob)),
        varbyte_decode(tf_blob).astype(np.int64),
    )


def encode_positions(pos_lists: list[np.ndarray]) -> bytes:
    """Per-doc position lists → one blob: varbyte(counts ++ flat deltas)."""
    counts = np.fromiter((len(p) for p in pos_lists), dtype=np.int64, count=len(pos_lists))
    if counts.sum() == 0:
        return varbyte_encode(counts)
    flat = np.concatenate([delta_encode(np.asarray(p, dtype=np.int64)) for p in pos_lists if len(p)])
    return varbyte_encode(np.concatenate([counts.astype(_U64), flat]))


def stream_byte_offsets(blob: bytes | memoryview, counts: np.ndarray) -> np.ndarray:
    """Byte boundaries of per-doc runs inside a concatenated varbyte stream.

    ``counts[i]`` = number of varbyte values belonging to doc i.  Returns
    ``offsets`` with len(counts)+1 entries such that doc i's bytes are
    ``blob[offsets[i]:offsets[i+1]]``.  Vectorized: terminal bytes have
    the high bit clear.
    """
    b = np.frombuffer(blob, dtype=np.uint8)
    ends = np.flatnonzero((b & 0x80) == 0)  # index of last byte of each value
    cum = np.cumsum(np.asarray(counts, dtype=np.int64))
    offsets = np.zeros(len(cum) + 1, dtype=np.int64)
    nz = cum > 0
    offsets[1:][nz] = ends[cum[nz] - 1] + 1
    # docs with zero values inherit the previous offset
    np.maximum.accumulate(offsets, out=offsets)
    return offsets


def decode_positions(blob: bytes, n_docs: int) -> list[np.ndarray]:
    """Inverse of :func:`encode_positions` for a block of ``n_docs`` docs."""
    vals = varbyte_decode(blob)
    counts = vals[:n_docs].astype(np.int64)
    flat = vals[n_docs:].astype(np.int64)
    out: list[np.ndarray] = []
    off = 0
    for c in counts:
        out.append(np.cumsum(flat[off : off + c]))
        off += c
    return out
