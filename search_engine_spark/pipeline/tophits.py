"""Top hits per bucket — the best-scoring turns for each metadata value.

The Elasticsearch ``terms`` aggregation with a ``top_hits`` sub-agg
("best 3 matches per role/tool/day"); the reference has no analog.
Deterministic contract: within each bucket, hits rank by (score desc,
conv_id asc, turn_idx asc) — the engine's global tie-break — and
buckets emit ascending.

Plan shape: the exhaustive-scoring kernel (``index.matches_scored`` —
the same O(postings) cost class every paginated request pays for
match_count) feeds a key join to a (keys, by)-pruned transcripts scan,
then a rank-filtered window — Spark rewrites ``row_number <= k`` over a
window into WindowGroupLimit (per-partition top-k, no full sort), the
same shape the batch reader uses per query.  At 100 TB the window
shuffles only the match set, partitioned by bucket value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def top_hits_by(
    index,
    transcripts: DataFrame,
    query_text: str,
    by: str,
    mode: str = "disjunctive",
    k: int = 3,
    tombstones: list | None = None,
    scope: DataFrame | None = None,
    analyzed: bool = False,
    spec=None,
) -> DataFrame:
    """Best ``k`` hits per value of transcripts column ``by`` →
    DataFrame(<by>, rank, conv_id, turn_idx, score) ordered by
    (<by> asc, rank asc).  Oracle: ``oracle.oracle_top_hits_by``."""
    scored = index.matches_scored(
        query_text, mode, tombstones=tombstones, scope=scope, analyzed=analyzed, spec=spec
    )
    joined = scored.join(
        transcripts.select("conv_id", "turn_idx", by), ["conv_id", "turn_idx"]
    )
    w = Window.partitionBy(by).orderBy(
        F.desc("score"), F.col("conv_id"), F.col("turn_idx")
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(by, "rank", "conv_id", "turn_idx", "score")
        .orderBy(by, "rank")
    )
