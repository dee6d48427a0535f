"""Field-sorted retrieval — "the latest turns matching this query".

The Elasticsearch ``sort`` clause (``sort: [{ts: desc}]``): results
ordered by a metadata field instead of relevance.  The reference ranks
only by score; transcripts carry ``ts``, and chronological retrieval of
a match set ("show me the most recent mentions of X") is the most
common transcript query after relevance itself.

Contract (pinned against ``oracle.oracle_topk_by_field``):

* order by ``sort_col`` (default ``ts``) ascending or descending;
* missing values sort LAST in either direction — the ES
  ``missing: _last`` default (Spark's own default differs: nulls
  first on ASC — so the direction-aware null ordering is explicit);
* ties break by (conv_id, turn_idx) ascending — deterministic pages;
* scores are not computed (the ES behavior when sorting by field
  without ``track_scores``) — matching is a set predicate here, so the
  kernels run the cheap candidates pass, never the scorer.

Scale shape: the match set comes from ``index.matches`` (bucket-pruned
postings, grouped candidate kernels, output O(matches)); the sort
column rides a column-pruned (conv_id, turn_idx, sort_col) corpus scan
semi-joined to the match keys; the cut is a TakeOrderedAndProject —
distributed per-partition top-k then a k-row merge, never a full sort.
Composes with scope/tombstones/min_match/analyzed like every reader
surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def topk_by_field(
    index,
    transcripts: DataFrame,
    query_text: str,
    sort_col: str = "ts",
    ascending: bool = False,
    k: int = 10,
    mode: str = "disjunctive",
    tombstones: list | None = None,
    scope: DataFrame | None = None,
    analyzed: bool = False,
    min_match: int = 1,
    spec=None,
) -> DataFrame:
    """Top-k matches by a metadata field → DataFrame(conv_id, turn_idx,
    ``sort_col``), ES ``sort`` semantics (missing last, deterministic
    key tie-break).  ``spec`` (a compiled ``QuerySpec``, e.g. from
    ``compile_query_string``) bypasses parsing — the unified
    query-string composition hook shared by every match-set operator."""
    matched = index.matches(
        query_text, mode, tombstones=tombstones, scope=scope,
        analyzed=analyzed, min_match=min_match, spec=spec,
    )
    col = (
        F.col(sort_col).asc_nulls_last()
        if ascending
        else F.col(sort_col).desc_nulls_last()
    )
    return (
        transcripts.select("conv_id", "turn_idx", sort_col)
        .join(matched, ["conv_id", "turn_idx"], "leftsemi")
        .orderBy(col, F.asc("conv_id"), F.asc("turn_idx"))
        .limit(k)
    )
