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
- ``value_histogram`` — the ES numeric ``histogram`` aggregation:
  fixed-interval buckets of a numeric field, gap-filled between the
  observed extremes when ``min_doc_count=0`` (the ES default shape —
  the fill is a ``sequence`` expression, never a driver loop).
- ``range_agg`` — the ES ``range`` aggregation: explicit
  ``[from, to)`` buckets (open ends allowed, overlaps allowed — a value
  counts in EVERY range containing it), all requested buckets returned
  even when empty, in the requested order.
- ``composite_agg`` — the ES ``composite`` aggregation: the paginated
  bucket surface.  Buckets keyed by one or more metadata columns in
  ascending key order, an exclusive ``after`` cursor, ``size`` buckets
  per page — how a caller walks MILLIONS of buckets without one giant
  response (the bucket scan itself aggregates once per page, like ES).

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
    spec=None,
) -> DataFrame:
    """Distinct ``col`` values among the matching turns → one-row
    DataFrame(value long).  Oracle: ``oracle.oracle_cardinality``.

    ``col`` may be a match-key column (conv_id, turn_idx — no corpus
    join at all) or any transcripts column (keys + that column joined,
    text never read unless it IS the column)."""
    matched = index.matches(
        query_text, mode, tombstones=tombstones, scope=scope, analyzed=analyzed, spec=spec
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
    spec=None,
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
        query_text, mode, tombstones=tombstones, scope=scope, analyzed=analyzed, spec=spec
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
    spec=None,
) -> DataFrame:
    """ES ``stats`` aggregation over the match set → one row
    (count long, min long, max long, avg double·5dp, sum long).
    Oracle: ``oracle.oracle_match_stats``."""
    vals = _matched_values(
        index, transcripts, query_text, field, mode, tombstones, scope,
        analyzed, spec,
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
    spec=None,
) -> DataFrame:
    """ES ``extended_stats``: ``match_stats`` columns + sum_sq (long),
    variance / std_dev (POPULATION, double·5dp — the ES default).

    Variance is derived from the exact integer aggregates
    (``sum_sq/n - (sum/n)^2``) rather than Spark's streaming
    ``var_pop``: with both sums exact longs the double arithmetic is
    order-independent, so Spark and the pure-Python oracle produce the
    identical IEEE value (``oracle.oracle_extended_stats``)."""
    vals = _matched_values(
        index, transcripts, query_text, field, mode, tombstones, scope,
        analyzed, spec,
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
    spec=None,
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
        index, transcripts, query_text, field, mode, tombstones, scope,
        analyzed, spec,
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


def percentile_ranks(
    index,
    transcripts: DataFrame,
    query_text: str,
    values: tuple,
    field: str = "chars",
    mode: str = "disjunctive",
    tombstones: list | None = None,
    scope: DataFrame | None = None,
    analyzed: bool = False,
    spec=None,
) -> DataFrame:
    """ES ``percentile_ranks`` aggregation over the match set → one row,
    one double·5dp column per probe value (``r100``, ``r2_5``, …): the
    percent of matched ``field`` values at or below the probe — the
    inverse of :func:`percentiles`.

    Computed as the EXACT empirical CDF, ``100 · count(v <= x) / n``,
    in one partially-aggregated pass with O(1) state per probe (an
    avg over a 0/1 indicator — pure JVM, the shape that holds at
    100 TB).  ES itself t-digest-approximates and interpolates between
    centroids; this is the exact quantity that approximation estimates
    (documented divergence, same convention as the exact
    :func:`percentiles` path).  Empty match set → NULL ranks (the ES
    null response)."""
    if not values:
        raise ValueError("values must be non-empty")
    vals = _matched_values(
        index, transcripts, query_text, field, mode, tombstones, scope,
        analyzed, spec,
    )

    def _name(x) -> str:
        s = f"{float(x):g}".replace(".", "_").replace("-", "m")
        return f"r{s}"

    return vals.agg(
        *[
            rnd(
                F.avg((F.col("v") <= F.lit(float(x))).cast("double")) * 100.0, 5
            ).alias(_name(x))
            for x in values
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
    spec=None,
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
        spec,
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


def value_histogram(
    index,
    transcripts: DataFrame,
    query_text: str,
    field: str = "chars",
    interval: int = 100,
    mode: str = "disjunctive",
    min_doc_count: int = 0,
    tombstones: list | None = None,
    scope: DataFrame | None = None,
    analyzed: bool = False,
    spec=None,
) -> DataFrame:
    """ES numeric ``histogram`` aggregation over the match set →
    (bucket long, n long) ascending.  ``bucket = v - (v mod interval)``
    — ``pmod`` keeps the arithmetic exact in LONGs for any sign, the
    same ``floor(v/interval)·interval`` contract as ES with offset 0.

    ``min_doc_count=0`` (the ES default) gap-fills empty buckets
    between the observed min and max keys via ONE ``sequence`` +
    ``explode`` over the two-value aggregate — no driver-side loop, and
    the fill is bounded by the key span, not the match count.
    ``min_doc_count=1`` drops empty buckets (the ``date_histogram``
    shape).  Oracle: ``oracle.oracle_value_histogram``."""
    if interval <= 0:
        raise ValueError(f"interval must be positive, got {interval}")
    if min_doc_count not in (0, 1):
        raise ValueError("min_doc_count must be 0 or 1 (the ES-useful pair)")
    vals = _matched_values(
        index, transcripts, query_text, field, mode, tombstones, scope,
        analyzed, spec,
    )
    key = (F.col("v") - F.pmod(F.col("v"), F.lit(interval))).alias("bucket")
    counts = vals.groupBy(key).agg(F.count("*").alias("n"))
    if min_doc_count == 1:
        return counts.orderBy("bucket")
    # gap-fill: all interval multiples between the observed extremes
    grid = (
        counts.agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .filter(F.col("lo").isNotNull())
        .select(
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.lit(int(interval)))
            ).alias("bucket")
        )
    )
    return (
        grid.join(counts, "bucket", "left")
        .select("bucket", F.coalesce("n", F.lit(0)).alias("n"))
        .orderBy("bucket")
    )


def _range_key(lo, hi) -> str:
    """ES range-bucket key: ``*-100``, ``100-500``, ``500-*``."""
    fmt = lambda v: "*" if v is None else f"{v:g}"  # noqa: E731
    return f"{fmt(lo)}-{fmt(hi)}"


def range_agg(
    index,
    transcripts: DataFrame,
    query_text: str,
    ranges: list,
    field: str = "chars",
    mode: str = "disjunctive",
    tombstones: list | None = None,
    scope: DataFrame | None = None,
    analyzed: bool = False,
    spec=None,
) -> DataFrame:
    """ES ``range`` aggregation over the match set → one row PER
    REQUESTED RANGE in request order: (idx int, key string, n long).

    ``ranges`` is a list of ``(from, to)`` pairs — ``from`` inclusive,
    ``to`` exclusive, ``None`` for an open end (the ES contract).
    Ranges may overlap: a value counts in every range containing it, so
    the implementation explodes a LITERAL array of range structs per
    matched value (state O(#ranges), the per-row fanout is the #ranges
    constant) rather than a single ``when`` chain that could only
    assign one bucket.  Empty requested buckets come back with n=0 via
    the left join from the literal range frame.  Oracle:
    ``oracle.oracle_range_agg``."""
    if not ranges:
        raise ValueError("ranges must be non-empty")
    specs = []
    for i, (lo, hi) in enumerate(ranges):
        if lo is None and hi is None:
            raise ValueError(f"range {i} is unbounded on both ends")
        if lo is not None and hi is not None and not lo < hi:
            raise ValueError(f"range {i}: from {lo!r} must be < to {hi!r}")
        specs.append((i, _range_key(lo, hi), lo, hi))
    vals = _matched_values(
        index, transcripts, query_text, field, mode, tombstones, scope,
        analyzed, spec,
    )
    lit_specs = F.array(
        *[
            F.struct(
                F.lit(i).alias("idx"),
                F.lit(k).alias("key"),
                F.lit(lo).cast("double").alias("lo"),
                F.lit(hi).cast("double").alias("hi"),
            )
            for i, k, lo, hi in specs
        ]
    )
    hits = (
        vals.select("v", F.explode(lit_specs).alias("r"))
        .filter(
            (F.col("r.lo").isNull() | (F.col("v") >= F.col("r.lo")))
            & (F.col("r.hi").isNull() | (F.col("v") < F.col("r.hi")))
        )
        .groupBy(F.col("r.idx").alias("idx"))
        .agg(F.count("*").alias("n"))
    )
    spark = transcripts.sparkSession
    frame = spark.createDataFrame(
        [(i, k) for i, k, _, _ in specs], "idx int, key string"
    )
    return (
        frame.join(F.broadcast(hits), "idx", "left")
        .select("idx", "key", F.coalesce("n", F.lit(0)).alias("n"))
        .orderBy("idx")
    )


def composite_agg(
    index,
    transcripts: DataFrame,
    query_text: str,
    sources: tuple = ("role",),
    size: int = 10,
    after: tuple | None = None,
    mode: str = "disjunctive",
    tombstones: list | None = None,
    scope: DataFrame | None = None,
    analyzed: bool = False,
    spec=None,
) -> DataFrame:
    """ES ``composite`` aggregation: paginated buckets over the match
    set → ``size`` rows of (``*sources``, n long) in ascending source
    order, strictly AFTER the exclusive ``after`` key tuple.

    The pagination cursor is a struct comparison (Spark orders structs
    lexicographically by field), pushed BELOW the final sort — at page
    N the plan still aggregates every bucket once (exactly ES's cost
    model: composite re-walks the shards per page) but ships only
    buckets past the cursor into the TakeOrdered cut, so a caller walks
    millions of buckets in constant-size pages with no offset blowup.
    Rows with a null source value are dropped (ES
    ``missing_bucket: false``, the default).  Oracle:
    ``oracle.oracle_composite_agg``."""
    if not sources:
        raise ValueError("sources must be non-empty")
    if size <= 0:
        raise ValueError(f"size must be positive, got {size}")
    if after is not None and len(after) != len(sources):
        raise ValueError(
            f"after key arity {len(after)} != sources arity {len(sources)}"
        )
    matched = index.matches(
        query_text, mode, tombstones=tombstones, scope=scope, analyzed=analyzed, spec=spec
    )
    cols = ["conv_id", "turn_idx", *[c for c in sources if c not in
            ("conv_id", "turn_idx")]]
    src = transcripts.select(*cols).join(
        matched, ["conv_id", "turn_idx"], "leftsemi"
    )
    for c in sources:
        src = src.filter(F.col(c).isNotNull())
    buckets = src.groupBy(*sources).agg(F.count("*").alias("n"))
    if after is not None:
        cursor = F.struct(*[F.col(c) for c in sources]) > F.struct(
            *[F.lit(v) for v in after]
        )
        buckets = buckets.filter(cursor)
    return buckets.orderBy(*sources).limit(size)


def multi_terms(
    index,
    transcripts: DataFrame,
    query_text: str,
    fields: tuple = ("role", "tool"),
    n: int = 10,
    mode: str = "disjunctive",
    tombstones: list | None = None,
    scope: DataFrame | None = None,
    analyzed: bool = False,
    spec=None,
) -> DataFrame:
    """ES ``multi_terms`` aggregation: composite-KEY term counts over
    the match set → top-``n`` rows of (``*fields``, n long) ordered by
    (n desc, fields asc) — "which (role, tool) combinations dominate
    the sessions matching 'timeout'".  Documents missing ANY key field
    are skipped (the ES default).  Unlike ``composite_agg`` (ascending
    cursor pagination over ALL buckets) this is the count-ranked view.

    Scale shape: one hash aggregation keyed on the field tuple
    (map-side partials, O(distinct combinations) state) over the
    column-pruned match-set semi-join; final cut is a
    TakeOrderedAndProject.  Oracle: ``oracle.oracle_multi_terms``."""
    if not fields or len(fields) < 2:
        raise ValueError(f"multi_terms needs >= 2 key fields, got {fields!r}")
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    matched = index.matches(
        query_text, mode, tombstones=tombstones, scope=scope, analyzed=analyzed, spec=spec
    )
    cols = ["conv_id", "turn_idx", *[c for c in fields if c not in
            ("conv_id", "turn_idx")]]
    src = transcripts.select(*dict.fromkeys(cols)).join(
        matched, ["conv_id", "turn_idx"], "leftsemi"
    )
    for c in fields:
        src = src.filter(F.col(c).isNotNull())
    return (
        src.groupBy(*fields)
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), *[F.asc(c) for c in fields])
        .limit(n)
    )


def top_metrics_by(
    index,
    transcripts: DataFrame,
    query_text: str,
    bucket_col: str = "role",
    sort_field: str = "ts",
    metric_field: str = "turn_idx",
    mode: str = "disjunctive",
    tombstones: list | None = None,
    scope: DataFrame | None = None,
    analyzed: bool = False,
    spec=None,
) -> DataFrame:
    """ES ``top_metrics`` as a per-bucket sub-aggregation: for every
    ``bucket_col`` value in the match set, the ``metric_field`` value of
    the matched turn with the LARGEST ``sort_field`` ("per role, the
    turn_idx of its most recent matching turn") → (bucket, top_sort,
    top_metric) ordered by bucket.

    Determinism: the reduction is ``max`` over a (sort, metric) struct
    (Spark orders structs lexicographically), so sort-value ties break
    by metric value instead of partition order — ES top_metrics makes
    no tie promise; this contract is strictly stronger and
    engine-portable.  One hash aggregation, O(buckets) state, no
    window, no shuffle beyond the bucket agg.  Oracle:
    ``oracle.oracle_top_metrics_by``."""
    matched = index.matches(
        query_text, mode, tombstones=tombstones, scope=scope, analyzed=analyzed, spec=spec
    )
    cols = dict.fromkeys(
        ["conv_id", "turn_idx", bucket_col, sort_field, metric_field]
    )
    src = (
        transcripts.select(*cols)
        .join(matched, ["conv_id", "turn_idx"], "leftsemi")
        .filter(F.col(bucket_col).isNotNull() & F.col(sort_field).isNotNull())
    )
    top = F.max(
        F.struct(
            F.col(sort_field).alias("s"), F.col(metric_field).alias("m")
        )
    ).alias("top")
    return (
        src.groupBy(F.col(bucket_col).alias("bucket"))
        .agg(top)
        .select(
            "bucket",
            F.col("top.s").alias("top_sort"),
            F.col("top.m").alias("top_metric"),
        )
        .orderBy("bucket")
    )
