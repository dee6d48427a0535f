"""Field-collapsing with inner hits — the full ES ``collapse`` +
``inner_hits`` response shape over transcripts.

``topk_conversations`` returns one representative turn per conversation
(the collapse ranking); the next thing a search UI asks for is "and the
other matching turns inside each of those conversations" — ES's
``inner_hits`` block.  This operator returns, for the top-``k``
collapsed conversations, each conversation's top-``inner_n`` matching
turns:

    (conv_id, conv_score, hit_rank, turn_idx, score)

ordered by (conv_score desc, conv_id asc, hit_rank asc) — ``hit_rank``
is 1-based within the conversation (score desc, turn_idx asc ties), so
row ``hit_rank = 1`` IS the collapse representative (identical
tie-break), pinned by tests.

Composition, not a new kernel: the collapse ranking comes from the
existing ``topk_conversations`` pass and the inner turns from ONE
``matches_scored`` pass (both the same O(postings) kernel class every
paginated request pays).  The per-conversation window runs AFTER the
broadcast semi-join against the k winning conversations — so it ranks
only those conversations' matches, a k-bounded row set, and Spark
rewrites the rank filter to WindowGroupLimit (per-group top-N before
the exchange).  No stage touches O(corpus) rows beyond the candidate
kernels themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def collapse_inner_hits(
    index,
    query_text: str,
    mode: str = "disjunctive",
    k: int = 10,
    inner_n: int = 3,
    tombstones: list | None = None,
    scope: DataFrame | None = None,
    analyzed: bool = False,
    min_match: int = 1,
    spec=None,
) -> DataFrame:
    """Collapsed conversations with their inner hits (see module doc).
    Composes with tombstones/scope/analyzed/min_match/spec like
    ``topk`` — both passes receive the identical constraints, so the
    inner hits are drawn from exactly the collapsed ranking's match
    set.  Oracle: ``oracle.oracle_collapse_inner_hits``."""
    if inner_n < 1:
        raise ValueError(f"inner_n must be >= 1, got {inner_n}")
    if spec is None:
        # resolve ONCE and feed the identical spec to both passes, so
        # the inner hits are drawn from exactly the collapsed ranking's
        # match set (min_match included — matches_scored has no
        # min_match surface of its own)
        from ..index.reader import parse_query

        spec = index._resolve_spec(
            parse_query(query_text, mode, analyzed=analyzed, min_match=min_match)
        )
        if spec is None:  # every query term analyzer-dropped
            return index.spark.createDataFrame(
                [],
                "conv_id string, conv_score double, hit_rank int, "
                "turn_idx int, score double",
            )
    tops = index.topk_conversations(
        query_text, mode, k, tombstones=tombstones, scope=scope,
        analyzed=analyzed, spec=spec,
    ).select("conv_id", F.col("score").alias("conv_score"))
    scored = index.matches_scored(
        query_text, mode, tombstones=tombstones, scope=scope,
        analyzed=analyzed, spec=spec,
    )
    w = Window.partitionBy("conv_id").orderBy(
        F.desc("score"), F.asc("turn_idx")
    )
    return (
        scored.join(F.broadcast(tops), "conv_id")
        .withColumn("hit_rank", F.row_number().over(w))
        .filter(F.col("hit_rank") <= int(inner_n))
        .select("conv_id", "conv_score", "hit_rank", "turn_idx", "score")
        .orderBy(F.desc("conv_score"), F.asc("conv_id"), F.asc("hit_rank"))
    )
