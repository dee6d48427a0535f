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
