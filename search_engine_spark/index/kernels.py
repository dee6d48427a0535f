"""Per-group query kernels over compressed posting blocks.

These run inside ``applyInPandas`` cogroups — one invocation per index
group (doc-range shard), Arrow-batched, numpy-vectorized.  Two scoring
paths that must agree bit-for-bit:

* ``exact``: decode all postings for the query terms, score every
  matching doc (vectorized), take the group-local top-k.  The internal
  cross-check and the fast path for small candidate sets.
* ``wand``: document-at-a-time Block-Max WAND (Broder et al. 2003;
  Ding & Suel 2011 block-max refinement) using per-block
  ``idf * max_partial`` upper bounds — skips docs/blocks that cannot
  enter the top-k.  Replaces the reference's arbitrary LIMIT-1000
  candidate truncation (``QueryService.java:449`` — SURVEY.md T2/§4.2)
  with *provably lossless* early termination.

Float determinism: a doc's score is always the sum of per-term
contributions in **lexicographic term order** (SURVEY.md §7.3), matching
the pure-Python oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import BM25_B, BM25_K1
from .codec import varbyte_decode


class TermPostings:
    """Decoded postings of one term within one group."""

    __slots__ = (
        "term", "doc_ids", "tfs", "dls", "block_starts", "block_ubs", "pos_blobs",
        "_pos", "_block_pos", "_flat",
    )

    def __init__(self, term: str, pdf: pd.DataFrame, idf: float, avgdl: float):
        rows = pdf.sort_values("block_id")
        docs, tfs, dls, starts, ubs = [], [], [], [], []
        n = 0
        self.pos_blobs: list[tuple[int, bytes]] = []  # (start_offset, blob)
        for r in rows.itertuples(index=False):
            deltas = varbyte_decode(r.doc_blob)
            docs.append(np.cumsum(deltas.astype(np.int64)))
            tfs.append(varbyte_decode(r.tf_blob).astype(np.int64))
            # v5: the block carries each posting's doclen — scoring
            # never consults a side doclen table
            dls.append(varbyte_decode(r.dl_blob).astype(np.int64))
            starts.append(n)
            # avgdl-independent stored bound (max_tf, min_dl): partial is
            # increasing in tf, decreasing in dl, so this dominates every
            # posting in the block at the query-time avgdl
            ub_partial = float(
                _partial(
                    np.asarray([r.max_tf], dtype=np.int64),
                    np.asarray([float(r.min_dl)]),
                    avgdl,
                )[0]
            )
            ubs.append(idf * ub_partial)
            self.pos_blobs.append((n, r.pos_blob))
            n += int(r.n)
        self.term = term
        self.doc_ids = np.concatenate(docs) if docs else np.empty(0, dtype=np.int64)
        self.tfs = np.concatenate(tfs) if tfs else np.empty(0, dtype=np.int64)
        self.dls = np.concatenate(dls) if dls else np.empty(0, dtype=np.int64)
        self.block_starts = np.asarray(starts, dtype=np.int64)
        self.block_ubs = np.asarray(ubs, dtype=np.float64)
        self._pos: list[np.ndarray] | None = None
        self._block_pos: dict[int, list[np.ndarray]] = {}
        self._flat: tuple[np.ndarray, np.ndarray] | None = None

    def flat_positions(self) -> tuple[np.ndarray, np.ndarray]:
        """ALL positions as one flat array (lazy decode, phrase path).

        Returns ``(flat, offs)`` with posting ``i``'s positions at
        ``flat[offs[i]:offs[i+1]]``.  The per-posting delta streams are
        resolved with ONE segmented cumsum over the whole term — a
        per-posting ``np.cumsum`` loop costs ~µs per posting (seconds
        for a 100k-posting head term); this is ~10 ms."""
        if self._flat is None:
            parts = [varbyte_decode(blob) for _, blob in self.pos_blobs]
            deltas = (
                np.concatenate(parts).astype(np.int64)
                if parts
                else np.empty(0, dtype=np.int64)
            )
            offs = np.concatenate(
                [[0], np.cumsum(self.tfs)]
            ).astype(np.int64)
            c = np.cumsum(deltas)
            # positions of posting i = c[offs[i]:offs[i+1]] - c[offs[i]-1]
            base = np.zeros(len(self.tfs), dtype=np.int64)
            starts = offs[:-1]
            nz = starts > 0
            base[nz] = c[starts[nz] - 1]
            self._flat = (c - np.repeat(base, self.tfs), offs)
        return self._flat

    def positions(self) -> list[np.ndarray]:
        """Per-posting position arrays (views into the flat decode)."""
        if self._pos is None:
            flat, offs = self.flat_positions()
            self._pos = [
                flat[offs[i] : offs[i + 1]] for i in range(len(offs) - 1)
            ]
        return self._pos

    def positions_at(self, i: int) -> np.ndarray:
        """Positions of posting ``i``, decoding ONLY its block (cached).

        The selective path for candidate-bounded operators (proximity
        rerank): a group may hold millions of postings but only the
        block containing each of the k candidates is ever decompressed.
        """
        if self._pos is not None:
            return self._pos[i]
        b = int(np.searchsorted(self.block_starts, i, side="right") - 1)
        blk = self._block_pos.get(b)
        if blk is None:
            start, blob = self.pos_blobs[b]
            nxt = (
                int(self.block_starts[b + 1])
                if b + 1 < len(self.block_starts)
                else len(self.doc_ids)
            )
            flat = varbyte_decode(blob).astype(np.int64)
            counts = self.tfs[start:nxt]
            offs = np.concatenate([[0], np.cumsum(counts)])
            blk = [
                np.cumsum(flat[offs[j] : offs[j + 1]]) for j in range(len(counts))
            ]
            self._block_pos[b] = blk
        return blk[i - int(self.block_starts[b])]


class DocLens:
    """Group doclen lookup: sorted doc_id array → dl array.

    Since format v5 the QUERY path reads per-posting doclens inline
    from the blocks (``TermPostings.dls``); this class serves the side
    doclen table for diagnostics/stats consumers only."""

    __slots__ = ("doc_ids", "dls")

    def __init__(self, dl_pdf: pd.DataFrame):
        if len(dl_pdf) == 0:
            self.doc_ids = np.empty(0, dtype=np.int64)
            self.dls = np.empty(0, dtype=np.float64)
            return
        r = dl_pdf.iloc[0]
        self.doc_ids = np.cumsum(varbyte_decode(r["doc_blob"]).astype(np.int64))
        self.dls = varbyte_decode(r["dl_blob"]).astype(np.float64)

    def lookup(self, docs: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self.doc_ids, docs)
        # cheap vectorized integrity check: a doc_id absent from the
        # group's doclen (corrupt / mixed-version index) must fail loud,
        # not silently score against a neighboring doc's length
        if idx.size and (
            np.any(idx >= self.doc_ids.size) or np.any(self.doc_ids[idx] != docs)
        ):
            missing = (
                docs[idx >= self.doc_ids.size]
                if np.any(idx >= self.doc_ids.size)
                else docs[self.doc_ids[np.minimum(idx, self.doc_ids.size - 1)] != docs]
            )
            raise ValueError(
                f"index corruption: doc_ids {missing[:5].tolist()} missing "
                "from group doclen (mixed-version or partial index?)"
            )
        return self.dls[idx]


def _partial(tfs: np.ndarray, dls: np.ndarray, avgdl: float) -> np.ndarray:
    """BM25 tf component (IndexerService.java:1069-1070; k1=1.2, b=0.75)."""
    t = tfs.astype(np.float64)
    return t * (BM25_K1 + 1.0) / (t + BM25_K1 * (1.0 - BM25_B + BM25_B * dls / avgdl))


def exact_topk(
    plists: dict[str, TermPostings],
    idf: dict[str, float],
    avgdl: float,
    k: int,
    candidates: np.ndarray | None = None,
    with_ties: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Score all (or ``candidates``) matching docs; return group top-k.

    Returns (doc_ids, scores) sorted by (score desc, doc_id asc).

    ``with_ties`` keeps every doc whose score equals the k-th score
    (SQL ``WITH TIES``): required when doc_id order is NOT isomorphic
    to the final (conv_id, turn_idx) tie-break order — e.g. the dense
    scheme's arrival-ordered streaming ids — so the global sort, not
    the group cut, resolves boundary ties.
    """
    terms = sorted(plists)
    if not terms:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    if candidates is not None:
        union = candidates
    else:
        union = np.unique(np.concatenate([plists[t].doc_ids for t in terms]))
    if union.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    scores = np.zeros(union.size, dtype=np.float64)
    for t in terms:  # lexicographic order == oracle summation order
        p = plists[t]
        if p.doc_ids.size == 0:
            continue
        idx = np.searchsorted(union, p.doc_ids)
        ok = (idx < union.size) & (union[np.minimum(idx, union.size - 1)] == p.doc_ids)
        scores[idx[ok]] += idf[t] * _partial(
            p.tfs[ok], p.dls[ok].astype(np.float64), avgdl
        )
    hit = scores > 0.0
    union, scores = union[hit], scores[hit]
    order = np.lexsort((union, -scores))
    if with_ties and order.size > k:
        kth = scores[order[k - 1]] if k > 0 else np.inf
        cut = k
        while cut < order.size and scores[order[cut]] == kth:
            cut += 1
        order = order[:cut]
    else:
        order = order[:k]
    return union[order], scores[order]


def wand_topk(
    plists: dict[str, TermPostings],
    idf: dict[str, float],
    avgdl: float,
    k: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Block-Max WAND disjunctive top-k over one group.

    Lossless: ties at the threshold resolve to the earliest doc_id, and
    docs are visited in ascending doc_id order, so skipping
    ``upper_bound <= threshold`` docs once the heap is full never drops a
    doc that deterministic tie-breaking would have kept.
    """
    import heapq

    terms = [t for t in sorted(plists) if plists[t].doc_ids.size > 0]
    if not terms:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)

    docs = {t: plists[t].doc_ids for t in terms}
    tfs = {t: plists[t].tfs for t in terms}
    cur = {t: 0 for t in terms}  # cursor index into docs[t]
    n = {t: docs[t].size for t in terms}
    term_ub = {t: float(plists[t].block_ubs.max()) for t in terms}
    bstarts = {t: plists[t].block_starts for t in terms}
    bubs = {t: plists[t].block_ubs for t in terms}

    # heap of (score, -doc_id): smallest = weakest entry (lowest score,
    # then LARGEST doc_id — the one a tied earlier doc must NOT displace).
    heap: list[tuple[float, int]] = []
    theta = -1.0

    def block_ub(t: str, i: int) -> float:
        bi = np.searchsorted(bstarts[t], i, side="right") - 1
        return float(bubs[t][bi])

    alive = set(terms)
    while alive:
        order = sorted(alive, key=lambda t: (docs[t][cur[t]], t))
        # find pivot: smallest prefix whose global-UB sum beats theta
        acc = 0.0
        pivot_idx = -1
        for i, t in enumerate(order):
            acc += term_ub[t]
            if acc > theta:
                pivot_idx = i
                break
        if pivot_idx < 0:
            break  # even all terms together cannot beat theta
        pivot_doc = int(docs[order[pivot_idx]][cur[order[pivot_idx]]])
        first_doc = int(docs[order[0]][cur[order[0]]])
        if first_doc == pivot_doc:
            # block-max refinement over EVERY term aligned on pivot_doc —
            # aligned terms beyond pivot_idx still contribute to this
            # doc's score, so excluding them would under-bound it and
            # wrongly skip true top-k docs (caught by the multi-block
            # WAND==exact test)
            bacc = 0.0
            for t in order:
                if int(docs[t][cur[t]]) != pivot_doc:
                    break  # sorted: the aligned terms form a prefix
                bacc += block_ub(t, cur[t])
            if bacc > theta:
                score = 0.0
                # every aligned posting carries the SAME doc's length —
                # take it from the first aligned term (inline v5 dls)
                dl = float(plists[order[0]].dls[cur[order[0]]])
                for t in sorted(alive):  # lexicographic summation order
                    i = cur[t]
                    if i < n[t] and int(docs[t][i]) == pivot_doc:
                        tfv = np.asarray([tfs[t][i]], dtype=np.int64)
                        score += idf[t] * float(
                            _partial(tfv, np.asarray([dl]), avgdl)[0]
                        )
                if len(heap) < k:
                    heapq.heappush(heap, (score, -pivot_doc))
                    if len(heap) == k:
                        theta = heap[0][0]
                elif score > heap[0][0] or (
                    score == heap[0][0] and pivot_doc < -heap[0][1]
                ):
                    heapq.heapreplace(heap, (score, -pivot_doc))
                    theta = heap[0][0]
            # advance every cursor sitting on pivot_doc
            for t in list(alive):
                if int(docs[t][cur[t]]) == pivot_doc:
                    cur[t] += 1
                    if cur[t] >= n[t]:
                        alive.discard(t)
        else:
            # advance all pre-pivot cursors to >= pivot_doc
            for t in order[:pivot_idx]:
                j = int(np.searchsorted(docs[t], pivot_doc))
                cur[t] = j
                if j >= n[t]:
                    alive.discard(t)

    if not heap:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    out_docs = np.asarray([-d for _s, d in heap], dtype=np.int64)
    out_scores = np.asarray([s for s, _d in heap], dtype=np.float64)
    order = np.lexsort((out_docs, -out_scores))
    return out_docs[order], out_scores[order]


def conjunctive_candidates(plists: dict[str, TermPostings]) -> np.ndarray:
    """Docs containing ALL terms (QueryService.java:595-615 semantics)."""
    arrays = [p.doc_ids for p in plists.values()]
    if not arrays:
        return np.empty(0, dtype=np.int64)
    out = arrays[0]
    for a in arrays[1:]:
        out = np.intersect1d(out, a, assume_unique=True)
        if out.size == 0:
            break
    return out


def phrase_candidates(
    ordered_terms: list[str], plists: dict[str, TermPostings]
) -> np.ndarray:
    """Docs where the terms appear at consecutive positions (post-stem).

    Oracle `_phrase_match_docs` / positional check (Ranker1.java:370-449)
    without per-position queries: intersect doc lists, then intersect
    shifted position arrays per surviving doc.
    """
    if any(t not in plists or plists[t].doc_ids.size == 0 for t in ordered_terms):
        return np.empty(0, dtype=np.int64)
    cand = plists[ordered_terms[0]].doc_ids
    for t in ordered_terms[1:]:
        cand = np.intersect1d(cand, plists[t].doc_ids, assume_unique=True)
    if cand.size == 0 or len(ordered_terms) == 1:
        return cand
    # Vectorized alignment: pack each candidate position into one int64
    # key (candidate_rank << 32) | (position - term_order) — a phrase hit
    # is a key present for EVERY term, so the per-doc python loop over
    # np.isin calls (≈100 µs × |cand| docs) collapses into
    # len(terms)-1 sorted intersections over flat arrays.  Keys are
    # strictly increasing (docs ascend, positions ascend within a doc),
    # so intersect1d runs in its assume_unique fast path.  Work is
    # bounded by the CANDIDATE docs' position counts, not the full lists.
    survivors: np.ndarray | None = None
    for j, t in enumerate(ordered_terms):
        tp = plists[t]
        flat, offs = tp.flat_positions()
        idx = np.searchsorted(tp.doc_ids, cand)
        cnts = offs[idx + 1] - offs[idx]
        total = int(cnts.sum())
        out_starts = np.concatenate([[0], np.cumsum(cnts)])[:-1]
        gather = (
            np.arange(total, dtype=np.int64)
            - np.repeat(out_starts, cnts)
            + np.repeat(offs[idx], cnts)
        )
        pos_vals = flat[gather]
        keys = (
            np.repeat(np.arange(cand.size, dtype=np.int64), cnts) << 32
        ) + (pos_vals - j)
        if j > 0:
            keys = keys[pos_vals >= j]  # a phrase cannot start before 0
        survivors = (
            keys
            if survivors is None
            else np.intersect1d(survivors, keys, assume_unique=True)
        )
        if survivors.size == 0:
            return np.empty(0, dtype=np.int64)
    return cand[np.unique(survivors >> 32)]
