"""Dataset sharding + cluster-resolution tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"text {i}", f"src{i % 7}") for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_split_boundaries_cover_all_buckets():
    from search_engine_spark.pipeline.sharding import SPLIT_BUCKETS, split_boundaries

    bounds = split_boundaries({"train": 0.9, "val": 0.05, "test": 0.05})
    assert bounds[0][1] == 0 and bounds[-1][2] == SPLIT_BUCKETS
    for (_, _, hi), (_, lo, _) in zip(bounds, bounds[1:]):
        assert hi == lo  # contiguous, no gaps or overlaps


def test_hash_split_deterministic_and_proportional(docs):
    from search_engine_spark.pipeline.sharding import hash_split

    a = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    # repartitioning must not change any assignment (unlike randomSplit)
    b = {r["doc_id"]: r["split"] for r in hash_split(docs.repartition(13)).collect()}
    assert a == b
    assert set(a.values()) <= {"train", "val", "test"}
    n = len(a)
    train_frac = sum(1 for s in a.values() if s == "train") / n
    assert 0.8 < train_frac < 0.97  # 90% ± sampling noise on 400 docs


def test_hash_split_salt_changes_assignment(docs):
    from search_engine_spark.pipeline.sharding import hash_split

    a = {r["doc_id"]: r["split"] for r in hash_split(docs, salt="s1").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs, salt="s2").collect()}
    assert a != b  # different salts shuffle membership


def test_source_quota_caps_and_is_deterministic(docs):
    from search_engine_spark.pipeline.sharding import source_quota

    capped = source_quota(docs, 5)
    per_src = {
        r["source"]: r["n"]
        for r in capped.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert all(n <= 5 for n in per_src.values())
    assert sum(per_src.values()) == 5 * 7  # every source has >5 docs here
    ids_a = {r["doc_id"] for r in capped.collect()}
    ids_b = {r["doc_id"] for r in source_quota(docs.repartition(11), 5).collect()}
    assert ids_a == ids_b


def test_connected_components_chain_and_singletons(spark):
    from search_engine_spark.pipeline.graph import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(8)], "node long")
    # chain 0-1-2-3-4 (diameter 4), pair 5-6, singleton 7
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (5, 6)], "src long, dst long"
    )
    got = {r["node"]: r["comp"] for r in connected_components(nodes, edges).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 5, 6: 5, 7: 7}
