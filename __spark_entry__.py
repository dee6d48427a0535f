"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25 query on sf0.001.
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the training-data-pipeline operators; pairs are
defined side by side in ``search_engine_spark.contract`` so Spark and
DuckDB semantics stay pinned together.  Entries without an oracle are
the genuinely non-SQL paths (Porter-stemmed compressed-index engine,
MinHash/SimHash/LSH sketches, sha256 feature stubs) — their correctness
gate is the pytest oracle suite (`python -m pytest -x -q`).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from search_engine_spark import contract  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return contract.flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # priority-ordered: entries lacking a prior CORRECTNESS row and
    # entries new this round come first (the driver samples a prefix)
    return contract.ordered_queries()


def oracle_sql() -> dict[str, str]:
    return contract.ordered_oracles()
