"""Recency-decay rescoring — freshness-aware ranking over transcripts.

The reference ranks purely by term relevance (+PageRank); transcripts
carry a ``ts`` column, and the operation every transcript-search user
asks for next is "like that, but prefer recent conversations".  This is
the Elasticsearch ``function_score`` exponential-decay shape (public
API semantics: decay(age) = exp(ln(decay) / scale * max(0, age -
offset))), applied multiplicatively to the BM25 score:

    final(d) = bm25(d) * exp(lam * max(0, now - ts(d) - offset)),
    lam      = ln(decay_rate) / scale_s        (decay_rate=0.5 →
                                                scale_s is a half-life)

Losslessness: the decayed order is NOT monotone in BM25 (a fresh
mediocre turn can outrank a stale great one), so a top-N BM25 overfetch
can silently drop true winners.  The operator therefore rescores the
FULL match set via ``index.matches_scored`` — one grouped kernel pass
over the query terms' postings (the same O(postings) cost class as
``match_count``, which every paginated request already pays) — then
joins ``ts`` and cuts top-k.

Scale shape: the match set is query-bounded; the ``ts`` join reads ONLY
(conv_id, turn_idx, ts) from the corpus (column-pruned scan) and joins
on the match keys, so AQE broadcast-joins the match side when small.
The final cut is a TakeOrderedAndProject, never a full sort.

Determinism across session timezones: ``age`` is the difference of two
``cast(timestamp as long)`` values under the SAME session clock (the
``ts`` column and the ``now`` literal), so the session-timezone offset
cancels; tests pin UTC, the contract oracle embeds plain literals.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

#: function_score defaults: multiplier at distance `scale` past `offset`.
DECAY_RATE = 0.5


def recency_topk(
    index,
    transcripts: DataFrame,
    query_text: str,
    now: str,
    scale_s: float,
    mode: str = "disjunctive",
    k: int = 10,
    offset_s: float = 0.0,
    decay_rate: float = DECAY_RATE,
    tombstones: list | None = None,
    scope: DataFrame | None = None,
    analyzed: bool = False,
    spec=None,
) -> DataFrame:
    """Freshness-decayed top-k → DataFrame(conv_id, turn_idx, score,
    recency_score), ordered by (recency_score desc, conv_id, turn_idx).

    ``index`` is a ``CompressedIndex`` or ``MultiIndex``; ``now`` is an
    ISO timestamp string on the same clock as the corpus ``ts`` column
    (explicit, never wall-clock — results must be reproducible);
    ``scale_s`` is the half-life in seconds at the default
    ``decay_rate=0.5``.  Composes with tombstones/scope/analyzed like
    ``topk``.  ``score`` is the undecayed BM25 (kept so callers can
    display both, like the reference's response rows)."""
    if scale_s <= 0:
        raise ValueError(f"scale_s must be positive, got {scale_s}")
    if not (0.0 < decay_rate < 1.0):
        raise ValueError(f"decay_rate must be in (0, 1), got {decay_rate}")
    lam = math.log(decay_rate) / float(scale_s)
    scored = index.matches_scored(
        query_text, mode, tombstones=tombstones, scope=scope, analyzed=analyzed, spec=spec
    )
    ts = transcripts.select("conv_id", "turn_idx", "ts")
    now_s = F.to_timestamp(F.lit(now)).cast("long")
    # ts may arrive as TIMESTAMP or TIMESTAMP_NTZ (parquet without a
    # zone annotation reads as NTZ); NTZ has no direct long cast, and
    # the intermediate timestamp cast applies the SAME session clock as
    # the `now` literal, so the zone offset still cancels.
    ts_s = F.col("ts").cast("timestamp").cast("long")
    age = F.greatest(
        F.lit(0.0),
        (now_s - ts_s).cast("double") - F.lit(float(offset_s)),
    )
    return (
        scored.join(ts, ["conv_id", "turn_idx"])
        .withColumn(
            "recency_score", F.col("score") * F.exp(F.lit(lam) * age)
        )
        .select("conv_id", "turn_idx", "score", "recency_score")
        .orderBy(F.desc("recency_score"), F.asc("conv_id"), F.asc("turn_idx"))
        .limit(k)
    )
