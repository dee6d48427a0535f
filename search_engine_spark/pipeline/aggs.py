"""Match-set metric aggregations — cardinality and field stats.

Two more Elasticsearch aggregation shapes over the transcript engine's
match set (joining pipeline/histogram.py, pipeline/tophits.py,
pipeline/significant.py):

- ``cardinality`` — how many DISTINCT values of a metadata column the
  query's matches span ("this query hits 412 conversations / 3 tools").
  Exact by default; ``approx=True`` switches to Spark's HyperLogLog++
  (``approx_count_distinct``), the documented 100-TB path — one pass, a
  constant-size sketch per partition, no distinct shuffle.
- ``match_stats`` — the ES ``stats`` aggregation (count/min/max/avg/sum)
  over a numeric field of the matched turns; the default field
  ``chars = length(text)`` answers "how big are the matching turns".

Plan shape, both: the match set is query-bounded (``index.matches``),
semi/inner-joined to a column-pruned transcripts scan (only the keys +
the aggregated column are read), then ONE partially-aggregated global
agg — all JVM expressions, no UDF.  At 100 TB the cost is the match-set
join; the aggregation state is O(1) (stats) or O(distinct)/O(sketch)
(cardinality exact/approx).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import rnd


def cardinality(
    index,
    transcripts: DataFrame,
    query_text: str,
    col: str = "conv_id",
    mode: str = "disjunctive",
    approx: bool = False,
    rsd: float = 0.05,
    tombstones: list | None = None,
    scope: DataFrame | None = None,
    analyzed: bool = False,
) -> DataFrame:
    """Distinct ``col`` values among the matching turns → one-row
    DataFrame(value long).  Oracle: ``oracle.oracle_cardinality``.

    ``col`` may be a match-key column (conv_id, turn_idx — no corpus
    join at all) or any transcripts column (keys + that column joined,
    text never read unless it IS the column)."""
    matched = index.matches(
        query_text, mode, tombstones=tombstones, scope=scope, analyzed=analyzed
    )
    if col in ("conv_id", "turn_idx"):
        src = matched
    else:
        src = transcripts.select("conv_id", "turn_idx", col).join(
            matched, ["conv_id", "turn_idx"], "leftsemi"
        )
    agg = (
        F.approx_count_distinct(col, rsd) if approx else F.countDistinct(col)
    )
    return src.agg(agg.alias("value"))


#: match_stats fields: name → column-expression factory over the pruned
#: scan (factories, not Columns: building a Column needs a live session).
_FIELDS = {
    "chars": lambda: F.length("text").cast("long"),
    "turn_idx": lambda: F.col("turn_idx").cast("long"),
}


def match_stats(
    index,
    transcripts: DataFrame,
    query_text: str,
    field: str = "chars",
    mode: str = "disjunctive",
    tombstones: list | None = None,
    scope: DataFrame | None = None,
    analyzed: bool = False,
) -> DataFrame:
    """ES ``stats`` aggregation over the match set → one row
    (count long, min long, max long, avg double·5dp, sum long).
    Oracle: ``oracle.oracle_match_stats``."""
    if field not in _FIELDS:
        raise ValueError(f"field must be one of {sorted(_FIELDS)}, got {field!r}")
    expr = _FIELDS[field]()
    src_col = "text" if field == "chars" else field
    matched = index.matches(
        query_text, mode, tombstones=tombstones, scope=scope, analyzed=analyzed
    )
    vals = (
        transcripts.select("conv_id", "turn_idx", src_col)
        .join(matched, ["conv_id", "turn_idx"], "leftsemi")
        .select(expr.alias("v"))
    )
    return vals.agg(
        F.count("v").alias("count"),
        F.min("v").alias("min"),
        F.max("v").alias("max"),
        rnd(F.avg("v"), 5).alias("avg"),
        F.sum("v").alias("sum"),
    )
