"""Property test: vectorized phrase_candidates == brute-force reference.

The kernel packs (candidate_rank << 32) | (position - order) keys and
intersects them across terms (kernels.py); this pins it against a direct
per-doc/per-position reference over randomized corpora, including
repeated phrase terms and multi-block posting lists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from search_engine_spark.index.codec import delta_encode, varbyte_encode
from search_engine_spark.index.kernels import TermPostings, phrase_candidates


def _make_tp(term: str, doc_pos: dict[int, list[int]], block_size: int) -> TermPostings:
    docs = sorted(doc_pos)
    rows = []
    for s in range(0, len(docs), block_size):
        blk = docs[s : s + block_size]
        d = np.asarray(blk, dtype=np.int64)
        tfs = np.asarray([len(doc_pos[x]) for x in blk], dtype=np.int64)
        dls = np.full(len(blk), 50, dtype=np.int64)
        pos_stream = b"".join(
            varbyte_encode(delta_encode(np.asarray(doc_pos[x], dtype=np.int64)))
            for x in blk
        )
        rows.append(
            {
                "block_id": s // block_size,
                "n": len(blk),
                "doc_blob": varbyte_encode(delta_encode(d)),
                "tf_blob": varbyte_encode(tfs.astype(np.uint64)),
                "dl_blob": varbyte_encode(dls.astype(np.uint64)),
                "pos_blob": pos_stream,
                "max_tf": int(tfs.max()),
                "min_dl": int(dls.min()),
            }
        )
    return TermPostings(term, pd.DataFrame(rows), 1.0, 50.0)


def _ref_phrase(terms: list[str], corpus: dict[str, dict[int, list[int]]]) -> list[int]:
    doc_sets = [set(corpus[t]) for t in terms]
    out = []
    for d in sorted(set.intersection(*doc_sets)):
        starts = corpus[terms[0]][d]
        if any(
            all(p + j in corpus[t][d] for j, t in enumerate(terms)) for p in starts
        ):
            out.append(d)
    return out


# small universes force doc overlap and adjacent positions
_pos_lists = st.lists(st.integers(0, 12), min_size=1, max_size=6, unique=True).map(sorted)
_term_docs = st.dictionaries(st.integers(0, 30), _pos_lists, min_size=1, max_size=12)


@settings(max_examples=200, deadline=None)
@given(
    corpus=st.fixed_dictionaries({"a": _term_docs, "b": _term_docs, "c": _term_docs}),
    phrase=st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=4),
    block_size=st.integers(1, 5),
)
def test_phrase_candidates_matches_reference(corpus, phrase, block_size):
    plists = {t: _make_tp(t, dp, block_size) for t, dp in corpus.items() if dp}
    got = phrase_candidates(phrase, plists).tolist()
    want = (
        _ref_phrase(phrase, corpus)
        if all(t in corpus and corpus[t] for t in phrase)
        else []
    )
    assert got == want


def test_phrase_repeated_term_adjacent():
    corpus = {"a": {1: [0, 1], 2: [0, 2], 3: [5]}}
    plists = {"a": _make_tp("a", corpus["a"], 2)}
    assert phrase_candidates(["a", "a"], plists).tolist() == [1]


# ---------------------------------------------------------------- slop


def _ref_phrase_slop(
    terms: list[str], corpus: dict[str, dict[int, list[int]]], slop: int
) -> list[int]:
    """Brute force: enumerate one position per term; a doc matches iff
    some strictly-increasing assignment spans <= (n-1) + slop."""
    import itertools

    doc_sets = [set(corpus[t]) for t in terms]
    out = []
    for d in sorted(set.intersection(*doc_sets)):
        pls = [corpus[t][d] for t in terms]
        for combo in itertools.product(*pls):
            if all(combo[i + 1] > combo[i] for i in range(len(combo) - 1)) and (
                combo[-1] - combo[0] - (len(combo) - 1)
            ) <= slop:
                out.append(d)
                break
    return out


@settings(max_examples=200, deadline=None)
@given(
    corpus=st.fixed_dictionaries({"a": _term_docs, "b": _term_docs, "c": _term_docs}),
    phrase=st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=4),
    block_size=st.integers(1, 5),
    slop=st.integers(0, 4),
)
def test_sloppy_phrase_matches_brute_force(corpus, phrase, block_size, slop):
    plists = {t: _make_tp(t, dp, block_size) for t, dp in corpus.items() if dp}
    got = phrase_candidates(phrase, plists, slop).tolist()
    want = (
        _ref_phrase_slop(phrase, corpus, slop)
        if all(t in corpus and corpus[t] for t in phrase)
        else []
    )
    assert got == want
    # widening the window never loses a match
    wider = phrase_candidates(phrase, plists, slop + 1).tolist()
    assert set(got) <= set(wider)


@settings(max_examples=150, deadline=None)
@given(
    corpus=st.fixed_dictionaries({"a": _term_docs, "b": _term_docs, "c": _term_docs}),
    phrase=st.lists(st.sampled_from(["a", "b", "c"]), min_size=2, max_size=4),
    slop=st.integers(0, 4),
)
def test_oracle_sloppy_phrase_matches_brute_force(corpus, phrase, slop):
    """The pure-Python oracle's greedy chain == brute force (same random
    universe as the kernel test, so both sides pin to one reference)."""
    from search_engine_spark.oracle import OracleIndex, _phrase_match_docs

    postings = {
        t: [((f"d{d:03d}", 0), len(ps), ps) for d, ps in sorted(dp.items())]
        for t, dp in corpus.items()
    }
    idx = OracleIndex(n_docs=40, avgdl=10.0, doclen={}, postings=postings)
    got = sorted(k[0] for k in _phrase_match_docs(idx, phrase, slop))
    want = [f"d{d:03d}" for d in _ref_phrase_slop(phrase, corpus, slop)]
    assert got == want


def test_sloppy_phrase_gap_boundary():
    # a at 0, b at 3: gap of 2 tokens between them — needs slop >= 2
    corpus = {"a": {7: [0]}, "b": {7: [3]}}
    plists = {t: _make_tp(t, dp, 2) for t, dp in corpus.items()}
    assert phrase_candidates(["a", "b"], plists, 1).tolist() == []
    assert phrase_candidates(["a", "b"], plists, 2).tolist() == [7]
    # order matters: b never precedes a
    assert phrase_candidates(["b", "a"], plists, 9).tolist() == []
