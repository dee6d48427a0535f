"""Parity of the driver-side XXH64 with Spark's xxhash64 (seed 42)."""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from search_engine_spark.index.build import NUM_BUCKETS
from search_engine_spark.index.xxhash import spark_xxhash64, term_bucket


def test_xxh64_matches_spark(spark):
    random.seed(7)
    terms = (
        ["", "a", "ab", "abc", "the", "term0000", "ünïcode-Ω", "x" * 100, "\x00\x01"]
        + ["".join(random.choices(string.printable, k=random.randint(1, 64))) for _ in range(400)]
    )
    rows = (
        spark.createDataFrame([(t,) for t in terms], "t string")
        .select("t", F.xxhash64("t").alias("h"), F.pmod(F.xxhash64("t"), F.lit(NUM_BUCKETS)).cast("int").alias("b"))
        .collect()
    )
    for r in rows:
        assert spark_xxhash64(r["t"]) == r["h"], r["t"]
        assert term_bucket(r["t"], NUM_BUCKETS) == r["b"], r["t"]
