"""Match-set metric aggregations (pipeline/aggs.py) vs the pure-Python
oracle: ES ``cardinality`` (exact + HLL++ approx) and ``stats``.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import BuildConfig
from search_engine_spark.corpus import generate_transcripts
from search_engine_spark.index.build import build_index
from search_engine_spark.index.reader import CompressedIndex
from search_engine_spark.oracle import (
    build_oracle_index,
    oracle_cardinality,
    oracle_match_stats,
)
from search_engine_spark.pipeline.aggs import cardinality, match_stats

_QUERIES = [
    ("term0001", "disjunctive"),
    ("term0003 term0004", "conjunctive"),
    ('"phrase alpha beta"', "phrase"),
    ("term0001 term0002", "disjunctive"),
]


@pytest.fixture(scope="module")
def xs_pdf():
    return generate_transcripts("xs")


@pytest.fixture(scope="module")
def xs_df(spark, xs_pdf):
    return spark.createDataFrame(xs_pdf).cache()


@pytest.fixture(scope="module")
def xs_index(spark, xs_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("aggs") / "idx")
    build_index(spark, xs_df, out, BuildConfig(num_groups=2))
    return CompressedIndex(spark, out)


@pytest.fixture(scope="module")
def xs_oracle(xs_pdf):
    return build_oracle_index(xs_pdf)


@pytest.mark.parametrize("q,m", _QUERIES)
@pytest.mark.parametrize("col", ["conv_id", "role"])
def test_cardinality_matches_oracle(xs_index, xs_df, xs_pdf, xs_oracle, q, m, col):
    got = cardinality(xs_index, xs_df, q, col, m).collect()[0].value
    assert got == oracle_cardinality(xs_oracle, xs_pdf, q, m, col)


def test_cardinality_approx_within_rsd(xs_index, xs_df, xs_pdf, xs_oracle):
    q, m = "term0001 term0002", "disjunctive"
    exact = oracle_cardinality(xs_oracle, xs_pdf, q, m, "conv_id")
    approx = cardinality(
        xs_index, xs_df, q, "conv_id", m, approx=True, rsd=0.05
    ).collect()[0].value
    assert exact > 0
    # HLL++ at rsd=0.05: allow a generous 3-sigma band
    assert abs(approx - exact) <= max(2, 0.15 * exact)


def test_cardinality_scoped(xs_index, xs_df, xs_pdf, xs_oracle):
    """Scope composes: cardinality over the role-filtered match set."""
    q, m = "term0001 term0002", "disjunctive"
    scope_df = xs_df.filter("role = 'assistant'")
    got = cardinality(xs_index, xs_df, q, "conv_id", m, scope=scope_df).collect()[0].value
    sub = xs_pdf[xs_pdf.role == "assistant"]
    # oracle over the scoped match set: intersect matches with scope keys
    from search_engine_spark.oracle import oracle_matches

    keys = oracle_matches(
        xs_oracle, q, m, scope=set(zip(sub.conv_id, sub.turn_idx))
    )
    assert got == len({c for c, _t in keys})


@pytest.mark.parametrize("q,m", _QUERIES)
def test_match_stats_matches_oracle(xs_index, xs_df, xs_pdf, xs_oracle, q, m):
    row = match_stats(xs_index, xs_df, q, "chars", m).collect()[0]
    want = oracle_match_stats(xs_oracle, xs_pdf, q, m, "chars")
    assert row["count"] == want["count"]
    assert row["min"] == want["min"]
    assert row["max"] == want["max"]
    assert row["sum"] == want["sum"]
    assert row["avg"] == pytest.approx(want["avg"], abs=2e-5)


def test_match_stats_turn_idx_field(xs_index, xs_df, xs_pdf, xs_oracle):
    q, m = "term0003 term0004", "disjunctive"
    row = match_stats(xs_index, xs_df, q, "turn_idx", m).collect()[0]
    want = oracle_match_stats(xs_oracle, xs_pdf, q, m, "turn_idx")
    assert (row["count"], row["min"], row["max"], row["sum"]) == (
        want["count"], want["min"], want["max"], want["sum"],
    )


def test_match_stats_empty_match_set(xs_index, xs_df):
    row = match_stats(xs_index, xs_df, "zzznoterm", "chars").collect()[0]
    assert row["count"] == 0
    assert row["min"] is None and row["max"] is None
    assert row["avg"] is None and row["sum"] is None


def test_unknown_stats_field_rejected(xs_index, xs_df):
    with pytest.raises(ValueError):
        match_stats(xs_index, xs_df, "term0001", "no_such_field")


# ---------------------------------------------------------------------
# extended_stats / percentiles / stats_by (ES extended_stats,
# percentiles, terms+stats sub-aggregation)
# ---------------------------------------------------------------------

from search_engine_spark.oracle import (  # noqa: E402
    oracle_extended_stats,
    oracle_percentiles,
    oracle_stats_by,
)
from search_engine_spark.pipeline.aggs import (  # noqa: E402
    extended_stats,
    percentiles,
    stats_by,
)


@pytest.mark.parametrize("q,m", _QUERIES)
def test_extended_stats_matches_oracle(xs_index, xs_df, xs_pdf, xs_oracle, q, m):
    row = extended_stats(xs_index, xs_df, q, "chars", m).collect()[0]
    want = oracle_extended_stats(xs_oracle, xs_pdf, q, m, "chars")
    assert row["count"] == want["count"]
    assert row["sum_sq"] == want["sum_sq"]
    assert row["variance"] == pytest.approx(want["variance"], abs=2e-5)
    assert row["std_dev"] == pytest.approx(want["std_dev"], abs=2e-5)


def test_extended_stats_empty_match_set(xs_index, xs_df):
    row = extended_stats(xs_index, xs_df, "zzznoterm", "chars").collect()[0]
    assert row["count"] == 0
    assert row["variance"] is None and row["std_dev"] is None


def test_extended_stats_single_value_zero_variance(xs_index, xs_df, xs_pdf):
    """A one-turn match set has variance exactly 0 (no float debris —
    the integer-sum formula guarantees it)."""
    # find a term matching exactly one turn via the oracle index
    from search_engine_spark.oracle import build_oracle_index

    idx = build_oracle_index(xs_pdf)
    term = next(
        (t for t, pl in idx.postings.items() if len(pl) == 1 and t.isalnum()),
        None,
    )
    if term is None:
        pytest.skip("xs corpus has no df=1 alnum term")
    row = extended_stats(xs_index, xs_df, term, "chars").collect()[0]
    assert row["count"] == 1
    assert row["variance"] == 0.0 and row["std_dev"] == 0.0


@pytest.mark.parametrize("q,m", _QUERIES)
def test_percentiles_match_oracle(xs_index, xs_df, xs_pdf, xs_oracle, q, m):
    pct = (1.0, 25.0, 50.0, 75.0, 99.0, 99.9)
    row = percentiles(xs_index, xs_df, q, "chars", pct, m).collect()[0]
    want = oracle_percentiles(xs_oracle, xs_pdf, q, m, "chars", pct)
    for k, v in want.items():
        assert row[k] == pytest.approx(v, abs=2e-5), k


def test_percentiles_approx_brackets_exact(xs_index, xs_df, xs_pdf, xs_oracle):
    """percentile_approx (the 100-TB path) lands within the matched
    value range and near the exact p50 at high accuracy."""
    q, m = "term0001 term0002", "disjunctive"
    exact = oracle_percentiles(xs_oracle, xs_pdf, q, m, "chars", (50.0,))["p50"]
    row = percentiles(
        xs_index, xs_df, q, "chars", (50.0,), m, approx=True, accuracy=10000
    ).collect()[0]
    # GK sketch at accuracy=10000 over a few thousand values: rank error
    # <= n/accuracy, so the value should be within a few neighbors
    assert abs(row["p50"] - exact) <= 50


def test_percentiles_empty_and_validation(xs_index, xs_df):
    row = percentiles(xs_index, xs_df, "zzznoterm", "chars", (50.0,)).collect()[0]
    assert row["p50"] is None
    with pytest.raises(ValueError):
        percentiles(xs_index, xs_df, "term0001", "chars", ())
    with pytest.raises(ValueError):
        percentiles(xs_index, xs_df, "term0001", "chars", (101.0,))


def test_percentiles_column_naming(xs_index, xs_df):
    df = percentiles(xs_index, xs_df, "term0001", "chars", (0.1, 50.0, 99.9))
    assert df.columns == ["p0_1", "p50", "p99_9"]


@pytest.mark.parametrize("q,m", _QUERIES)
@pytest.mark.parametrize("bucket", ["role", "tool"])
def test_stats_by_matches_oracle(xs_index, xs_df, xs_pdf, xs_oracle, q, m, bucket):
    rows = stats_by(xs_index, xs_df, q, bucket, "chars", m).collect()
    want = oracle_stats_by(xs_oracle, xs_pdf, q, m, bucket, "chars")
    got = [
        {
            "bucket": r["bucket"], "count": r["count"], "min": r["min"],
            "max": r["max"], "sum": r["sum"],
        }
        for r in rows
    ]
    slim = [{k: w[k] for k in ("bucket", "count", "min", "max", "sum")} for w in want]
    assert got == slim
    for r, w in zip(rows, want):
        assert r["avg"] == pytest.approx(w["avg"], abs=2e-5)


def test_stats_by_scoped(xs_index, xs_df, xs_pdf):
    """Scope composes: per-role stats over the assistant-scoped match
    set collapse to a single assistant bucket."""
    q, m = "term0001 term0002", "disjunctive"
    scope_df = xs_df.filter("role = 'assistant'")
    rows = stats_by(xs_index, xs_df, q, "role", "chars", m, scope=scope_df).collect()
    assert [r["bucket"] for r in rows] == ["assistant"]


def test_stats_by_counts_sum_to_match_count(xs_index, xs_df, xs_pdf, xs_oracle):
    q, m = "term0003 term0004", "disjunctive"
    rows = stats_by(xs_index, xs_df, q, "role", "chars", m).collect()
    total = oracle_match_stats(xs_oracle, xs_pdf, q, m, "chars")["count"]
    assert sum(r["count"] for r in rows) == total


# ---------------------------------------------------------------- histogram

from search_engine_spark.oracle import (  # noqa: E402
    oracle_composite_agg,
    oracle_range_agg,
    oracle_value_histogram,
)
from search_engine_spark.pipeline.aggs import (  # noqa: E402
    composite_agg,
    range_agg,
    value_histogram,
)


@pytest.mark.parametrize("q,m", _QUERIES)
@pytest.mark.parametrize("interval", [100, 150])
def test_value_histogram_matches_oracle(
    xs_index, xs_df, xs_pdf, xs_oracle, q, m, interval
):
    got = [
        r.asDict()
        for r in value_histogram(xs_index, xs_df, q, "chars", interval, m).collect()
    ]
    assert got == oracle_value_histogram(
        xs_oracle, xs_pdf, q, m, "chars", interval
    )


def test_value_histogram_gap_fill(xs_index, xs_df, xs_pdf, xs_oracle):
    """min_doc_count=0 (ES default) fills empty buckets between the
    extremes; min_doc_count=1 drops them — and the phrase query's char
    distribution actually has gaps at interval=200, so the two shapes
    differ."""
    q, m = '"phrase alpha beta"', "phrase"
    full = [
        r.asDict()
        for r in value_histogram(xs_index, xs_df, q, "chars", 200, m, 0).collect()
    ]
    sparse = [
        r.asDict()
        for r in value_histogram(xs_index, xs_df, q, "chars", 200, m, 1).collect()
    ]
    assert full == oracle_value_histogram(xs_oracle, xs_pdf, q, m, "chars", 200, 0)
    assert sparse == oracle_value_histogram(xs_oracle, xs_pdf, q, m, "chars", 200, 1)
    assert len(full) > len(sparse)  # the fixture genuinely has gaps
    assert all(b["n"] == 0 for b in full if b not in sparse)
    # contiguous grid: consecutive keys differ by exactly the interval
    keys = [b["bucket"] for b in full]
    assert all(b - a == 200 for a, b in zip(keys, keys[1:]))


def test_value_histogram_conserves_match_count(xs_index, xs_df, xs_pdf, xs_oracle):
    q, m = "term0001 term0002", "disjunctive"
    rows = value_histogram(xs_index, xs_df, q, "chars", 100, m).collect()
    total = oracle_match_stats(xs_oracle, xs_pdf, q, m, "chars")["count"]
    assert sum(r["n"] for r in rows) == total


def test_value_histogram_empty_and_validation(xs_index, xs_df):
    assert (
        value_histogram(xs_index, xs_df, "zzznope", "chars", 100).count() == 0
    )
    with pytest.raises(ValueError, match="interval"):
        value_histogram(xs_index, xs_df, "term0001", "chars", 0)
    with pytest.raises(ValueError, match="min_doc_count"):
        value_histogram(xs_index, xs_df, "term0001", "chars", 100, min_doc_count=2)


# -------------------------------------------------------------------- range

_R = [(None, 200.0), (200.0, 500.0), (300.0, None)]


@pytest.mark.parametrize("q,m", _QUERIES[:2])
def test_range_agg_matches_oracle(xs_index, xs_df, xs_pdf, xs_oracle, q, m):
    got = [r.asDict() for r in range_agg(xs_index, xs_df, q, _R, "chars", m).collect()]
    assert got == oracle_range_agg(xs_oracle, xs_pdf, q, _R, m)


def test_range_agg_overlaps_and_empty_buckets(xs_index, xs_df, xs_pdf, xs_oracle):
    """Overlapping ranges each count the value; an impossible range
    still comes back (n=0, ES keeps every requested bucket); request
    order is preserved."""
    q, m = "term0001 term0002", "disjunctive"
    ranges = [(None, 100000.0), (0.0, 100000.0), (99998.0, 99999.0)]
    got = [r.asDict() for r in range_agg(xs_index, xs_df, q, ranges, "chars", m).collect()]
    assert got == oracle_range_agg(xs_oracle, xs_pdf, q, ranges, m)
    assert got[0]["n"] == got[1]["n"] > 0  # same values counted twice
    assert got[2]["n"] == 0  # empty requested bucket survives
    assert [r["idx"] for r in got] == [0, 1, 2]


def test_range_agg_boundary_semantics(xs_index, xs_df, xs_pdf, xs_oracle):
    """from is inclusive, to is exclusive: splitting at an observed
    value keeps the total exactly conserved with no double count."""
    q, m = "term0001 term0002", "disjunctive"
    hit = oracle_match_stats(xs_oracle, xs_pdf, q, m, "chars")
    edge = float(hit["min"])  # an actually-observed value
    ranges = [(None, edge), (edge, None)]
    got = [r.asDict() for r in range_agg(xs_index, xs_df, q, ranges, "chars", m).collect()]
    assert got == oracle_range_agg(xs_oracle, xs_pdf, q, ranges, m)
    assert got[0]["n"] + got[1]["n"] == hit["count"]
    assert got[1]["n"] > 0  # the min itself lands in [edge, *)


def test_range_agg_validation(xs_index, xs_df):
    with pytest.raises(ValueError, match="non-empty"):
        range_agg(xs_index, xs_df, "term0001", [])
    with pytest.raises(ValueError, match="unbounded"):
        range_agg(xs_index, xs_df, "term0001", [(None, None)])
    with pytest.raises(ValueError, match="must be <"):
        range_agg(xs_index, xs_df, "term0001", [(5.0, 5.0)])


# ---------------------------------------------------------------- composite

def test_composite_matches_oracle_first_page(xs_index, xs_df, xs_pdf, xs_oracle):
    got = [
        r.asDict()
        for r in composite_agg(
            xs_index, xs_df, "term0001", ("role", "tool"), 10
        ).collect()
    ]
    assert got == oracle_composite_agg(
        xs_oracle, xs_pdf, "term0001", ("role", "tool"), 10
    )
    # missing_bucket=false: only role='tool' rows carry a tool value
    assert all(r["role"] == "tool" for r in got)


def test_composite_page_chain_equals_full_walk(xs_index, xs_df, xs_pdf, xs_oracle):
    """Walking size-1 pages through the after cursor reproduces the
    full bucket list exactly — the ES composite pagination contract."""
    q, sources = "term0001 term0002", ("role",)
    full = oracle_composite_agg(xs_oracle, xs_pdf, q, sources, 100)
    walked, after = [], None
    for _ in range(len(full) + 1):
        page = [
            r.asDict()
            for r in composite_agg(xs_index, xs_df, q, sources, 1, after).collect()
        ]
        if not page:
            break
        walked.extend(page)
        after = tuple(page[-1][c] for c in sources)
    assert walked == full
    assert len(full) > 1  # the chain actually paginated


def test_composite_after_and_validation(xs_index, xs_df, xs_pdf, xs_oracle):
    q = "term0001"
    got = [
        r.asDict()
        for r in composite_agg(
            xs_index, xs_df, q, ("role", "tool"), 2, ("tool", "bash")
        ).collect()
    ]
    assert got == oracle_composite_agg(
        xs_oracle, xs_pdf, q, ("role", "tool"), 2, ("tool", "bash")
    )
    with pytest.raises(ValueError, match="sources"):
        composite_agg(xs_index, xs_df, q, ())
    with pytest.raises(ValueError, match="size"):
        composite_agg(xs_index, xs_df, q, ("role",), 0)
    with pytest.raises(ValueError, match="arity"):
        composite_agg(xs_index, xs_df, q, ("role",), 5, ("a", "b"))


def test_composite_scoped(xs_index, xs_df, xs_pdf):
    """Scope composes: user-scoped match set yields only user buckets."""
    scope_df = xs_df.filter("role = 'user'")
    got = composite_agg(
        xs_index, xs_df, "term0001 term0002", ("role",), 10, scope=scope_df
    ).collect()
    assert [r["role"] for r in got] == ["user"]


# -- percentile_ranks (ES inverse percentiles) ------------------------

from search_engine_spark.oracle import oracle_percentile_ranks  # noqa: E402
from search_engine_spark.pipeline.aggs import percentile_ranks  # noqa: E402


@pytest.mark.parametrize(
    "q,m",
    [
        ("term0001 term0002", "disjunctive"),
        ("term0003 term0004", "conjunctive"),
        ('"phrase alpha beta"', "phrase"),
    ],
)
def test_percentile_ranks_match_oracle(xs_index, xs_df, xs_pdf, xs_oracle, q, m):
    vals = (50.0, 120.5, 300.0)
    row = percentile_ranks(xs_index, xs_df, q, vals, mode=m).collect()[0]
    want = oracle_percentile_ranks(xs_oracle, xs_pdf, q, vals, m)
    assert row.asDict() == want


def test_percentile_ranks_monotone_and_bounded(xs_index, xs_df):
    vals = (10.0, 50.0, 100.0, 200.0, 400.0, 10000.0)
    row = percentile_ranks(xs_index, xs_df, "term0001", vals).collect()[0]
    ranks = [row[f"r{f'{v:g}'.replace('.', '_')}"] for v in vals]
    assert ranks == sorted(ranks)
    assert all(0.0 <= r <= 100.0 + 1e-9 for r in ranks)
    assert ranks[-1] == pytest.approx(100.0, abs=1e-6)  # beyond max value


def test_percentile_ranks_inverse_of_percentiles(xs_index, xs_df, xs_pdf, xs_oracle):
    """rank(quantile(p)) >= p: the empirical CDF at the interpolated
    p-quantile covers at least p percent of the values."""
    from search_engine_spark.oracle import oracle_percentiles

    q50 = oracle_percentiles(
        xs_oracle, xs_pdf, "term0001", "disjunctive", percents=(50.0,)
    )["p50"]
    row = percentile_ranks(xs_index, xs_df, "term0001", (q50,)).collect()[0]
    assert row[0] >= 50.0 - 1e-6


def test_percentile_ranks_empty_and_validation(xs_index, xs_df):
    with pytest.raises(ValueError, match="non-empty"):
        percentile_ranks(xs_index, xs_df, "term0001", ())
    row = percentile_ranks(xs_index, xs_df, "zzznomatchterm", (50.0,)).collect()[0]
    assert row[0] is None
