"""Date histogram — when did the matching turns happen.

The Elasticsearch ``date_histogram`` aggregation over the transcripts
engine: bucket the query's match set by a calendar interval of the
``ts`` column and count turns per bucket.  The reference has no analog;
it is the first chart every transcript-search UI draws ("when did
'timeout' spike?").

Plan shape: the match set is query-bounded (``index.matches``), joined
to a (conv_id, turn_idx, ts)-pruned transcripts scan (text is never
read), ``date_trunc`` + one partial-aggregated groupBy — all JVM
expressions, no UDF — and an interval-bounded result (one row per
non-empty bucket, ascending).  At 100 TB the cost is the match-set join
plus a count shuffle of at most |buckets| groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Calendar intervals date_trunc understands, narrowed to the useful set.
INTERVALS = ("minute", "hour", "day", "week", "month", "year")


def date_histogram(
    index,
    transcripts: DataFrame,
    query_text: str,
    mode: str = "disjunctive",
    interval: str = "hour",
    tombstones: list | None = None,
    scope: DataFrame | None = None,
    analyzed: bool = False,
) -> DataFrame:
    """Per-interval match counts → DataFrame(bucket timestamp, n long),
    ascending by bucket; empty buckets are omitted (the ES
    ``min_doc_count: 1`` shape).  Oracle: ``oracle.oracle_date_histogram``."""
    if interval not in INTERVALS:
        raise ValueError(f"interval must be one of {INTERVALS}, got {interval!r}")
    matched = index.matches(
        query_text, mode, tombstones=tombstones, scope=scope, analyzed=analyzed
    )
    return (
        transcripts.select("conv_id", "turn_idx", "ts")
        .join(matched, ["conv_id", "turn_idx"], "leftsemi")
        .groupBy(F.date_trunc(interval, F.col("ts")).alias("bucket"))
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )
