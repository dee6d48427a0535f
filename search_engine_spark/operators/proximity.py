"""Term-proximity scoring — the reference's ``calculateTermProximity``
(QueryService.java:1374-1445): the minimum token distance between any two
DISTINCT query terms in a document maps to a boost tier
(+2.0 at ≤3, +1.0 at ≤10, +0.5 at ≤50, else 0 — ``:1427-1438``).

The reference computes it per candidate by splitting the content string
per request; here it is a numpy kernel over the compressed index's
position arrays, applied only to the k survivors of the BM25 top-k (the
reference applies it to every candidate — SURVEY.md §4.2 flags that as an
N+1 pattern).  Proximity is a RERANK feature, NOT part of the §4.3 BM25
rank-identity contract; it is exposed as an optional post-processor.
"""

from __future__ import annotations

import numpy as np

# QueryService.java:1427-1438
TIERS = ((3, 2.0), (10, 1.0), (50, 0.5))


def min_pair_distance(pos_by_term: list[np.ndarray]) -> int | None:
    """Minimum |p_i − p_j| across occurrences of different terms.

    Linear merge over the sorted per-term position arrays (the classic
    k-way minimal-pair sweep), not the reference's O(n²) per-position
    rescans (Ranker1.java:416-441).
    """
    present = [p for p in pos_by_term if p is not None and len(p)]
    if len(present) < 2:
        return None
    tagged = np.concatenate(
        [np.stack([p, np.full(len(p), i)], axis=1) for i, p in enumerate(present)]
    )
    tagged = tagged[np.argsort(tagged[:, 0], kind="stable")]
    best = None
    for a, b in zip(tagged[:-1], tagged[1:]):
        if a[1] != b[1]:
            d = int(b[0] - a[0])
            best = d if best is None or d < best else best
    return best


def proximity_boost(distance: int | None) -> float:
    """Distance → additive boost per the reference tier ladder."""
    if distance is None:
        return 0.0
    for limit, boost in TIERS:
        if distance <= limit:
            return boost
    return 0.0


def rerank_with_proximity(index, query_text: str, k: int = 10, mode: str = "disjunctive"):
    """BM25 top-k, then add the proximity boost and re-sort.

    Returns list of (conv_id, turn_idx, base_score, distance, boosted).
    Positions for the k candidates are decoded from the bucket-pruned
    postings of the query terms only.
    """
    from ..index.kernels import TermPostings
    from ..index.reader import parse_query
    from ..textproc import analyze_query

    base = index.topk(query_text, mode, k).collect()
    if not base:
        return []
    spec = parse_query(query_text, mode)
    terms = spec.score_terms if spec else sorted(set(analyze_query(query_text)))
    if not terms:
        return []
    idf = index.idf_map(terms)
    post = index.postings_df(terms).toPandas()

    # map candidate (conv, turn) → doc_id via the conv table
    convs = {r["conv_id"]: r["conv_rank"] for r in index._convs.collect()}
    out = []
    plists: dict[tuple[int, str], TermPostings] = {}
    for row in base:
        doc_id = (convs[row["conv_id"]] << index.turn_bits) | row["turn_idx"]
        pos_arrays = []
        for t in terms:
            gmask = post["term"] == t
            if not gmask.any():
                pos_arrays.append(None)
                continue
            found = None
            for g, gdf in post[gmask].groupby("group"):
                key = (int(g), t)
                tp = plists.get(key)
                if tp is None:
                    tp = TermPostings(t, gdf, idf.get(t, 0.0), index.avgdl)
                    plists[key] = tp
                i = int(np.searchsorted(tp.doc_ids, doc_id))
                if i < tp.doc_ids.size and tp.doc_ids[i] == doc_id:
                    found = tp.positions()[i]
                    break
            pos_arrays.append(found)
        dist = min_pair_distance(pos_arrays)
        boost = proximity_boost(dist)
        out.append(
            (row["conv_id"], row["turn_idx"], row["score"], dist, row["score"] + boost)
        )
    out.sort(key=lambda x: (-x[4], x[0], x[1]))
    return out
