"""Deterministic dataset sharding for training pipelines: hash-based
train/val/test splits and per-source quota caps.

Both operators are pure JVM column math keyed on the engine-portable
md5-derived :func:`~search_engine_spark.pipeline.dedup.h60` hash, so
the assignment is (a) reproducible across runs and engines — the DuckDB
oracle computes the identical buckets — and (b) stable under
repartitioning, unlike ``rand()``/``randomSplit`` which depend on
partition layout.  At 100 TB both are narrow transforms except the
quota's per-source window (one shuffle on the source key; a skewed
source is bounded by reading cap rows per partition after the
rank-filter, and the window never moves data to one task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import H60_SQL, h60

#: bucket granularity for split weights (1e-4 resolution)
SPLIT_BUCKETS = 10_000

DEFAULT_WEIGHTS = {"train": 0.9, "val": 0.05, "test": 0.05}


def _bucket(id_col: str, salt: str):
    return h60(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))) % F.lit(
        SPLIT_BUCKETS
    )


def _bucket_sql(id_col: str, salt: str) -> str:
    h = H60_SQL.format(x=f"({id_col}::VARCHAR || ':{salt}')")
    return f"({h} % {SPLIT_BUCKETS})"


def split_boundaries(weights: dict[str, float]) -> list[tuple[str, int, int]]:
    """[(name, lo, hi)) bucket ranges in insertion order; hi exclusive."""
    total = sum(weights.values())
    out, lo = [], 0
    names = list(weights)
    for i, name in enumerate(names):
        hi = SPLIT_BUCKETS if i == len(names) - 1 else lo + round(
            weights[name] / total * SPLIT_BUCKETS
        )
        out.append((name, lo, hi))
        lo = hi
    return out


def hash_split(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named split by
    hash bucket — deterministic, engine-portable, layout-independent."""
    weights = weights or DEFAULT_WEIGHTS
    b = _bucket(id_col, salt)
    expr = None
    for name, lo, hi in split_boundaries(weights):
        cond = (b >= lo) & (b < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return docs.withColumn("split", expr)


def hash_split_sql(
    weights: dict[str, float] | None = None, id_col: str = "doc_id", salt: str = "split"
) -> str:
    """CASE expression computing the identical split in DuckDB."""
    weights = weights or DEFAULT_WEIGHTS
    b = _bucket_sql(id_col, salt)
    arms = "\n".join(
        f"WHEN {b} >= {lo} AND {b} < {hi} THEN '{name}'"
        for name, lo, hi in split_boundaries(weights)
    )
    return f"CASE {arms} END"


def source_quota(
    docs: DataFrame,
    cap: int,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` rows per source, chosen deterministically by
    hash order (the per-domain cap step of a crawl/training pipeline).

    The window partitions by source — many concurrent partitions, never
    a global single-task window; ties in the hash break on the id.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(source_col).orderBy(
        h60(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def source_quota_sql(cap: int, source_col: str = "source", id_col: str = "doc_id") -> str:
    """DuckDB row_number twin of :func:`source_quota` (as a WHERE-able
    CTE body over ``documents``)."""
    h = H60_SQL.format(x=f"{id_col}::VARCHAR")
    return (
        f"SELECT *, row_number() OVER (PARTITION BY {source_col} "
        f"ORDER BY {h}, {id_col}) AS _rn FROM documents"
    )
