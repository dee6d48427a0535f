"""More-like-this — similar-turn retrieval seeded by one document.

The reference has no similar-document query (its closest feature is the
related-query suggester, ``QueryService.java`` suggestions); transcript
users constantly ask "show me turns like this one".  This is the
Elasticsearch ``more_like_this`` shape, deterministic and
oracle-checkable:

1. read the SOURCE turn's text — one pushdown-filtered row from the
   corpus parquet (``PushedFilters`` on conv_id/turn_idx, ReadSchema
   pruned to the text column);
2. analyze it with the index pipeline and rank its distinct terms by
   tf*idf descending (term ascending on ties) — tf counted driver-side
   (one document), idf from the index's bucket-pruned idf table
   (``index.idf_map``); keep the top ``max_terms``
   (:func:`search_engine_spark.oracle.mlt_select_terms`, SHARED with the
   pure-Python oracle so both sides rank float-for-float identically);
3. run the standard disjunctive BM25 top-k over those terms through the
   ANALYZED execution path (the terms are already vocabulary terms — a
   second Porter pass could corrupt them), overfetching k+1;
4. drop the source turn and cut to k.

Scale shape: step 1 is a single-row pruned scan; step 2 collects one
document's term set plus |terms| idf rows; steps 3-4 are the existing
bucket-pruned topk plan (block-max kernel, broadcast label join,
TakeOrderedAndProject).  Works on both readers (``CompressedIndex`` and
the segmented ``MultiIndex``) since it composes their public surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..oracle import MLT_MAX_TERMS, mlt_select_terms
from ..textproc import analyze_text

RESULT_SCHEMA = "conv_id string, turn_idx int, score double"


def mlt_query_terms(
    index,
    transcripts: DataFrame,
    conv_id: str,
    turn_idx: int,
    max_terms: int = MLT_MAX_TERMS,
) -> list[str]:
    """The derived MLT query: the source turn's top tf*idf terms.

    Raises ``KeyError`` when the (conv_id, turn_idx) row does not exist;
    returns ``[]`` for an existing-but-empty (or all-stopword) turn.
    """
    rows = (
        transcripts.filter(
            (F.col("conv_id") == conv_id) & (F.col("turn_idx") == turn_idx)
        )
        .select("text")
        .collect()
    )
    if not rows:
        raise KeyError(f"no such turn: ({conv_id!r}, {turn_idx})")
    toks = analyze_text(rows[0]["text"] or "")
    if not toks:
        return []
    return mlt_select_terms(toks, index.idf_map(sorted(set(toks))), max_terms)


def more_like_this(
    index,
    transcripts: DataFrame,
    conv_id: str,
    turn_idx: int,
    k: int = 10,
    max_terms: int = MLT_MAX_TERMS,
    terms: list[str] | None = None,
) -> DataFrame:
    """Turns most similar to (conv_id, turn_idx), the source excluded →
    DataFrame(conv_id, turn_idx, score) ordered by (score desc, conv_id,
    turn_idx).  ``terms`` skips re-derivation when the caller already
    ran :func:`mlt_query_terms` (e.g. to echo them).  Oracle:
    ``oracle.oracle_more_like_this``."""
    if terms is None:
        terms = mlt_query_terms(index, transcripts, conv_id, turn_idx, max_terms)
    spark = index.spark
    if not terms:
        return spark.createDataFrame([], RESULT_SCHEMA)
    # k+1 overfetch: excluding the source afterwards leaves >= k rows
    # whenever they exist, and both cuts share the deterministic
    # (score desc, conv_id, turn_idx) order, so the result equals the
    # oracle's exclude-then-cut (ranks 1..k+1 minus the source).
    res = index.topk(" ".join(terms), "disjunctive", k + 1, analyzed=True)
    return (
        res.filter(
            ~((F.col("conv_id") == conv_id) & (F.col("turn_idx") == turn_idx))
        )
        .orderBy(F.desc("score"), "conv_id", "turn_idx")
        .limit(k)
    )
