"""Transcript-source loader tests: catalog-table path, parquet path,
schema contract validation, and column pruning of wider tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def transcripts_pq(spark, tmp_path_factory):
    from search_engine_spark.corpus import write_transcripts_parquet

    p = str(tmp_path_factory.mktemp("src") / "t.parquet")
    write_transcripts_parquet(p, "xs")
    return p


def test_parquet_path_loads_and_validates(spark, transcripts_pq):
    from search_engine_spark.sources import load_transcripts

    df = load_transcripts(spark, transcripts_pq)
    assert [f.name for f in df.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    ]
    assert df.count() == 100


def test_catalog_table_path(spark, transcripts_pq):
    """table:<name> goes through spark.table — the same API an Iceberg
    catalog serves; exercised here via a registered view (the container
    has no Iceberg runtime jars)."""
    from search_engine_spark.sources import load_transcripts

    spark.read.parquet(transcripts_pq).createOrReplaceTempView("transcripts_src")
    df = load_transcripts(spark, "table:transcripts_src")
    assert df.count() == 100


def test_wider_table_is_pruned_not_rejected(spark, transcripts_pq):
    from search_engine_spark.sources import load_transcripts, validate_transcripts

    wide = spark.read.parquet(transcripts_pq).withColumn("extra", F.lit(1))
    out = validate_transcripts(wide)
    assert "extra" not in out.columns


def test_missing_column_fails_loud(spark, transcripts_pq):
    from search_engine_spark.sources import validate_transcripts

    broken = spark.read.parquet(transcripts_pq).drop("tool")
    with pytest.raises(ValueError, match="missing column tool"):
        validate_transcripts(broken, "broken")


def test_mistyped_column_fails_loud(spark, transcripts_pq):
    from search_engine_spark.sources import validate_transcripts

    broken = spark.read.parquet(transcripts_pq).withColumn(
        "turn_idx", F.col("turn_idx").cast("long")
    )
    with pytest.raises(ValueError, match="turn_idx: expected int"):
        validate_transcripts(broken)


def test_build_through_source_loader(spark, transcripts_pq, tmp_path):
    """cli build consumes the loader output: index built from
    table:<view> equals one built from the parquet path."""
    from search_engine_spark.config import BuildConfig
    from search_engine_spark.index.build import build_index
    from search_engine_spark.index.reader import CompressedIndex
    from search_engine_spark.sources import load_transcripts

    spark.read.parquet(transcripts_pq).createOrReplaceTempView("transcripts_b")
    idx = str(tmp_path / "idx")
    build_index(
        spark, load_transcripts(spark, "table:transcripts_b"), idx,
        BuildConfig(num_groups=2),
    )
    top = CompressedIndex(spark, idx).topk("term0001 term0002", "disjunctive", 5)
    assert top.count() == 5
