"""Match-set metric aggregations — cardinality, stats, percentiles.

Elasticsearch metric-aggregation shapes over the transcript engine's
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
- ``extended_stats`` — the ES ``extended_stats`` aggregation: stats plus
  sum_of_squares and POPULATION variance / std deviation (ES's default),
  derived from the exact integer sums (``sum_sq/n - (sum/n)^2``) so the
  number is bit-reproducible across engines — no float-order-dependent
  streaming moments on the contract path.
- ``percentiles`` — the ES ``percentiles`` aggregation: exact linear
  interpolation (Spark SQL ``percentile``; ES-parity is t-digest,
  matched here by ``approx=True`` → ``percentile_approx``, the one-pass
  bounded-memory 100-TB path).
- ``stats_by`` — a terms bucket aggregation with a stats SUB-aggregation
  (ES ``terms`` + ``stats``): per-bucket count/min/max/avg/sum of a
  numeric field across the match set.

Plan shape, all: the match set is query-bounded (``index.matches``),
semi/inner-joined to a column-pruned transcripts scan (only the keys +
the aggregated column are read), then ONE partially-aggregated agg —
all JVM expressions, no UDF.  At 100 TB the cost is the match-set
join; the aggregation state is O(1) (stats, extended), O(k buckets)
(stats_by), O(distinct)/O(sketch) (cardinality exact/approx),
O(matches) only for exact percentiles (whose documented scale path is
the approx sketch).
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


def _matched_values(
    index,
    transcripts: DataFrame,
    query_text: str,
    field: str,
    mode: str,
    tombstones: list | None,
    scope: DataFrame | None,
    analyzed: bool,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The shared scan for every metric aggregation: the numeric field
    (as ``v``) of each matched turn, plus ``extra_cols``, read through a
    column-pruned transcripts scan semi-joined to the match set."""
    if field not in _FIELDS:
        raise ValueError(f"field must be one of {sorted(_FIELDS)}, got {field!r}")
    expr = _FIELDS[field]()
    src_col = "text" if field == "chars" else field
    matched = index.matches(
        query_text, mode, tombstones=tombstones, scope=scope, analyzed=analyzed
    )
    cols = ["conv_id", "turn_idx", src_col, *extra_cols]
    return (
        transcripts.select(*dict.fromkeys(cols))
        .join(matched, ["conv_id", "turn_idx"], "leftsemi")
        .select(expr.alias("v"), *extra_cols)
    )


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
    vals = _matched_values(
        index, transcripts, query_text, field, mode, tombstones, scope, analyzed
    )
    return vals.agg(
        F.count("v").alias("count"),
        F.min("v").alias("min"),
        F.max("v").alias("max"),
        rnd(F.avg("v"), 5).alias("avg"),
        F.sum("v").alias("sum"),
    )


def extended_stats(
    index,
    transcripts: DataFrame,
    query_text: str,
    field: str = "chars",
    mode: str = "disjunctive",
    tombstones: list | None = None,
    scope: DataFrame | None = None,
    analyzed: bool = False,
) -> DataFrame:
    """ES ``extended_stats``: ``match_stats`` columns + sum_sq (long),
    variance / std_dev (POPULATION, double·5dp — the ES default).

    Variance is derived from the exact integer aggregates
    (``sum_sq/n - (sum/n)^2``) rather than Spark's streaming
    ``var_pop``: with both sums exact longs the double arithmetic is
    order-independent, so Spark and the pure-Python oracle produce the
    identical IEEE value (``oracle.oracle_extended_stats``)."""
    vals = _matched_values(
        index, transcripts, query_text, field, mode, tombstones, scope, analyzed
    )
    agg = vals.agg(
        F.count("v").alias("count"),
        F.min("v").alias("min"),
        F.max("v").alias("max"),
        rnd(F.avg("v"), 5).alias("avg"),
        F.sum("v").alias("sum"),
        F.sum(F.col("v") * F.col("v")).alias("sum_sq"),
    )
    n = F.col("count").cast("double")
    var = F.when(
        F.col("count") > 0,
        F.col("sum_sq") / n - (F.col("sum") / n) * (F.col("sum") / n),
    )
    return agg.select(
        "count",
        "min",
        "max",
        "avg",
        "sum",
        "sum_sq",
        rnd(var, 5).alias("variance"),
        rnd(F.sqrt(var), 5).alias("std_dev"),
    )


def percentiles(
    index,
    transcripts: DataFrame,
    query_text: str,
    field: str = "chars",
    percents: tuple = (1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0),
    mode: str = "disjunctive",
    approx: bool = False,
    accuracy: int = 10000,
    tombstones: list | None = None,
    scope: DataFrame | None = None,
    analyzed: bool = False,
) -> DataFrame:
    """ES ``percentiles`` aggregation over the match set → one row, one
    double·5dp column per requested percent (``p50``, ``p99_9``, …).

    Exact path (default): Spark SQL ``percentile`` — linear
    interpolation at rank ``p·(n-1)``, the same contract as numpy's
    default and the pure-Python oracle (``oracle.oracle_percentiles``).
    ``approx=True`` switches to ``percentile_approx`` (Greenwald-Khanna,
    bounded memory) — the 100-TB path, mirroring ES's own t-digest
    approximation; the exact variant's O(matches) per-group state is the
    reason it is the contract path but not the scale path."""
    if not percents:
        raise ValueError("percents must be non-empty")
    fracs = [float(p) / 100.0 for p in percents]
    if any(not 0.0 <= f <= 1.0 for f in fracs):
        raise ValueError(f"percents must lie in [0, 100], got {percents}")
    vals = _matched_values(
        index, transcripts, query_text, field, mode, tombstones, scope, analyzed
    )
    frac_arr = F.array(*[F.lit(f) for f in fracs])
    agg_col = (
        F.percentile_approx("v", frac_arr, F.lit(accuracy))
        if approx
        else F.percentile("v", frac_arr)
    )
    row = vals.agg(agg_col.alias("q"))

    def _name(p) -> str:
        s = f"{float(p):g}".replace(".", "_").replace("-", "m")
        return f"p{s}"

    return row.select(
        *[
            rnd(F.col("q")[i].cast("double"), 5).alias(_name(p))
            for i, p in enumerate(percents)
        ]
    )


def stats_by(
    index,
    transcripts: DataFrame,
    query_text: str,
    bucket_col: str = "role",
    field: str = "chars",
    mode: str = "disjunctive",
    tombstones: list | None = None,
    scope: DataFrame | None = None,
    analyzed: bool = False,
) -> DataFrame:
    """ES ``terms`` bucket aggregation with a ``stats`` sub-aggregation:
    per-``bucket_col`` count/min/max/avg/sum of ``field`` across the
    match set, ordered by bucket → (bucket, count, min, max, avg·5dp,
    sum).  One hash aggregation keyed on the bucket (map-side partials,
    O(k) state); buckets absent from the match set are absent from the
    result (ES ``min_doc_count=1``), and rows where ``bucket_col`` is
    null are skipped (the ES missing-values default — pass an ES
    ``missing`` replacement upstream via ``withColumn`` if wanted).
    Oracle: ``oracle.oracle_stats_by``."""
    vals = _matched_values(
        index,
        transcripts,
        query_text,
        field,
        mode,
        tombstones,
        scope,
        analyzed,
        extra_cols=(bucket_col,),
    )
    return (
        vals.filter(F.col(bucket_col).isNotNull())
        .groupBy(F.col(bucket_col).alias("bucket"))
        .agg(
            F.count("v").alias("count"),
            F.min("v").alias("min"),
            F.max("v").alias("max"),
            rnd(F.avg("v"), 5).alias("avg"),
            F.sum("v").alias("sum"),
        )
        .orderBy("bucket")
    )
