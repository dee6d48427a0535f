"""Training-data pipeline tests: dedup sketches vs exact, ANN recall,
multimodal stub determinism, text-analysis invariants."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


# ---------------------------------------------------------------- dedup


def test_exact_dedup_counts(docs):
    from search_engine_spark.pipeline.dedup import exact_duplicates

    rows = exact_duplicates(docs).collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()
    assert all(r["n_docs"] >= 1 for r in rows)


def test_minhash_lsh_recall_vs_exact(docs):
    """LSH candidates must recover ≥90% of truly-similar pairs, and every
    reported pair must carry the exact (verified) jaccard."""
    from search_engine_spark.pipeline.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    # threshold chosen in LSH's operating regime: with 16 bands × 2 rows
    # the band-collision probability at j=0.5 is 1−(1−0.25)^16 ≈ 0.99
    thresh = 0.5
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, 3, thresh).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, num_hashes=32, bands=16, threshold=thresh).collect()
    }
    assert exact, "corpus should contain near-dup pairs at this threshold"
    # verified pairs are a subset of exact pairs with identical scores
    for pair, j in lsh.items():
        assert pair in exact
        assert j == pytest.approx(exact[pair], abs=1e-9)
    recall = len(lsh) / len(exact)
    assert recall >= 0.9, f"LSH recall too low: {recall:.2f}"


def test_simhash_pairs_verified(docs, spark):
    from search_engine_spark.pipeline.dedup import (
        simhash_fingerprints,
        simhash_near_dup_pairs,
    )

    fps = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs).collect()}
    pairs = simhash_near_dup_pairs(docs, max_hamming=3).collect()
    assert pairs, "Zipf corpus should contain simhash near-dups"
    for r in pairs:
        ham = bin((fps[r["doc_a"]] ^ fps[r["doc_b"]]) & ((1 << 64) - 1)).count("1")
        assert ham == r["hamming"] and ham <= 3


def test_shingles_semantics(spark):
    from search_engine_spark.pipeline.dedup import shingles

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "x y"), (3, "a b c d a b c d")], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["shingle"]) for r in shingles(df, 3).collect()
    }
    assert got == {
        (1, "a b c"), (1, "b c d"),
        (3, "a b c"), (3, "b c d"), (3, "c d a"), (3, "d a b"),
    }


def test_jaccard_for_pairs_matches_exact(docs):
    """Candidate-only verification returns the same jaccard as the exact
    all-pairs self-join for the pairs it is asked about."""
    from search_engine_spark.pipeline.dedup import jaccard_for_pairs, ngram_jaccard_pairs

    exact = ngram_jaccard_pairs(docs, 3, threshold=0.3).limit(8).collect()
    assert exact
    pairs = docs.sparkSession.createDataFrame(
        [(r["doc_a"], r["doc_b"]) for r in exact], "doc_a long, doc_b long"
    )
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in jaccard_for_pairs(pairs, docs, 3).collect()}
    for r in exact:
        assert got[(r["doc_a"], r["doc_b"])] == pytest.approx(r["jaccard"], abs=1e-9)


def test_hot_shingle_cap_bounds_join(spark):
    """A shingle shared by every doc must not force a quadratic join when
    the df cap is set: pairs that only overlapped on the hot shingle
    vanish, genuinely-similar pairs survive with their full jaccard."""
    from search_engine_spark.pipeline.dedup import ngram_jaccard_pairs

    # 40 docs all containing one hot trigram; docs 0/1 are near-identical
    rows = [(i, f"common hot shingle unique{i} tail{i} end{i}") for i in range(40)]
    rows[1] = (1, "common hot shingle unique0 tail0 end99")
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = {(r["doc_a"], r["doc_b"]): r["jaccard"]
                for r in ngram_jaccard_pairs(df, 3, threshold=0.0).collect()}
    capped = {(r["doc_a"], r["doc_b"]): r["jaccard"]
              for r in ngram_jaccard_pairs(df, 3, threshold=0.0, max_shingle_df=5).collect()}
    # every cross-pair shares the hot shingle → quadratic without the cap
    assert len(uncapped) == 40 * 39 // 2
    # capped: only pairs sharing a sub-cap shingle remain (the near-dup)
    assert set(capped) == {(0, 1)}
    # the near-dup pair keeps intersections from its non-hot shingles
    assert capped[(0, 1)] > 0.3


# ---------------------------------------------------------------- similarity


def test_lsh_ann_recall(emb):
    from search_engine_spark.pipeline.similarity import cosine_topk, lsh_cosine_topk

    qv = [
        r["x"]
        for r in emb.filter(F.col("vec_id") == 0)
        .select(F.explode("embedding").alias("x"))
        .collect()
    ]
    brute = [r["vec_id"] for r in cosine_topk(emb, qv, 10).collect()]
    ann = [r["vec_id"] for r in lsh_cosine_topk(emb, qv, 10, bits=4, tables=16).collect()]
    assert ann, "query vector must at least find its own bucket"
    assert 0 in ann  # self-match survives bucketing
    recall = len(set(ann) & set(brute)) / 10
    assert recall >= 0.6, f"ANN recall@10 too low: {recall:.2f}"


def test_ann_persisted_index_matches_scan_and_prunes(emb, spark, tmp_path):
    """Probing the persisted (table, bucket)-partitioned index returns the
    same top-k as the on-the-fly signature scan, and the probe's plan is
    partition-pruned (PartitionFilters on table/bucket)."""
    from search_engine_spark.pipeline.similarity import (
        ann_index_topk,
        lsh_cosine_topk,
        write_ann_index,
    )

    qv = [
        r["x"]
        for r in emb.filter(F.col("vec_id") == 0)
        .select(F.explode("embedding").alias("x"))
        .collect()
    ]
    path = str(tmp_path / "ann")
    write_ann_index(emb, path, dim=64, bits=4, tables=16)
    probe = ann_index_topk(spark, path, emb, qv, 10)
    scan = lsh_cosine_topk(emb, qv, 10, bits=4, tables=16)
    assert [tuple(r) for r in probe.collect()] == [tuple(r) for r in scan.collect()]
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the INDEX scan (not the embeddings scan, which has no partition
    # columns) must carry the (table, bucket) partition filters
    assert any(
        "table#" in seg[:400] for seg in plan.split("PartitionFilters")[1:]
    ), plan


def test_ann_index_is_ids_only_and_small(emb, spark, tmp_path):
    """The persisted index stores (vec_id, table, bucket) — never the
    embedding — so its bytes stay far below the embedding table's even
    though each vector appears in `tables` cells."""
    import os

    from search_engine_spark.pipeline.similarity import read_ann_index, write_ann_index

    path = str(tmp_path / "ann")
    write_ann_index(emb, path, dim=64, bits=4, tables=8)
    sigs, meta = read_ann_index(spark, path)
    assert set(sigs.columns) == {"vec_id", "table", "bucket"}
    assert meta == {"dim": 64, "bits": 4, "tables": 8, "seed": 42}

    def _du(d):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(d)
            for f in fs
        )

    emb_path = str(tmp_path / "embref")
    emb.write.parquet(emb_path)
    # ids-only at tables=8 must be well under the raw embedding bytes
    # (the old index repeated the full vector 8×, i.e. ~8× this corpus)
    assert _du(path) < _du(emb_path)


def test_ann_index_param_mismatch_fails_loud(emb, spark, tmp_path):
    """Probing an index with mismatched LSH params is a silent recall
    loss — read_ann_index must raise instead."""
    from search_engine_spark.pipeline.similarity import read_ann_index, write_ann_index

    path = str(tmp_path / "ann")
    write_ann_index(emb, path, dim=64, bits=4, tables=8, seed=42)
    with pytest.raises(ValueError, match="tables=8"):
        read_ann_index(spark, path, tables=16)
    with pytest.raises(ValueError, match="seed=42"):
        read_ann_index(spark, path, seed=7)


def test_knn_join_lsh_recall_vs_exact(emb):
    """Bucketed kNN must recover most exact nearest neighbors; every
    reported neighbor must carry its exact cosine."""
    from search_engine_spark.pipeline.similarity import knn_join, knn_join_lsh

    left = emb.filter(F.col("vec_id") < 20)
    exact = {(r["lid"], r["rid"]): r["cos"] for r in knn_join(left, emb, k=3).collect()}
    approx = {
        (r["lid"], r["rid"]): r["cos"]
        for r in knn_join_lsh(left, emb, dim=64, k=3, bits=4, tables=8).collect()
    }
    for pair, c in approx.items():
        if pair in exact:
            assert c == pytest.approx(exact[pair], abs=1e-9)
    recall = len(set(approx) & set(exact)) / len(exact)
    assert recall >= 0.6, f"bucketed kNN recall too low: {recall:.2f}"


def test_cosine_near_dup_lsh_vs_exact(emb):
    """LSH-bucketed near-dup pairs ⊆ exact all-pairs with identical cos;
    recall at the 0.9 threshold must be high (high-cosine pairs collide)."""
    from search_engine_spark.pipeline.similarity import cosine_near_dup_pairs, cosine_pairs

    # 0.4 is the near-dup tail of the synthetic corpus (max pair ≈ 0.51)
    thresh = 0.4
    exact = {(r["vec_a"], r["vec_b"]): r["cos"] for r in cosine_pairs(emb, thresh).collect()}
    approx = {
        (r["vec_a"], r["vec_b"]): r["cos"]
        for r in cosine_near_dup_pairs(emb, dim=64, threshold=thresh, tables=16).collect()
    }
    assert exact, "corpus should contain high-cosine pairs"
    for pair, c in approx.items():
        assert pair in exact and c == pytest.approx(exact[pair], abs=1e-9)
    recall = len(approx) / len(exact)
    assert recall >= 0.75, f"cosine near-dup recall too low: {recall:.2f}"


def test_ivf_topk_recall_and_exhaustive_probe(emb):
    from pyspark.sql import functions as F  # noqa: F811

    from search_engine_spark.pipeline.similarity import cosine_topk, ivf_cosine_topk

    qv = [
        r["x"]
        for r in emb.filter(F.col("vec_id") == 0)
        .select(F.explode("embedding").alias("x"))
        .collect()
    ]
    brute = [tuple(r) for r in cosine_topk(emb, qv, 10).collect()]
    n_cells = emb.select("label").distinct().count()
    # probing every cell must equal brute force exactly
    full = [tuple(r) for r in ivf_cosine_topk(emb, qv, 10, nprobe=n_cells).collect()]
    assert full == brute
    # probing 4 of 10 cells: decent recall, exact cosines
    part = [tuple(r) for r in ivf_cosine_topk(emb, qv, 10, nprobe=4).collect()]
    recall = len({v for v, _ in part} & {v for v, _ in brute}) / 10
    assert recall >= 0.5, f"IVF recall@10 too low: {recall:.2f}"


def test_knn_join_self_excluded_and_ranked(emb):
    from search_engine_spark.pipeline.similarity import knn_join

    left = emb.filter(F.col("vec_id") < 5)
    rows = knn_join(left, emb, k=3).collect()
    assert len(rows) == 15
    by_l = {}
    for r in rows:
        assert r["lid"] != r["rid"]
        by_l.setdefault(r["lid"], []).append((r["rank"], r["cos"]))
    for lid, rs in by_l.items():
        rs.sort()
        assert [x[0] for x in rs] == [1, 2, 3]
        assert rs[0][1] >= rs[1][1] >= rs[2][1]


# ---------------------------------------------------------------- textstats


def test_fingerprint_order_sensitive(spark):
    from search_engine_spark.pipeline.textstats import fingerprints

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["fingerprint"] for r in fingerprints(df).collect()}
    assert got[1] == got[3]
    assert got[1] != got[2]


def test_lang_id_marker_behavior(spark):
    from search_engine_spark.pipeline.textstats import lang_id

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of a house"),
            (2, "der hund und die katze ist das"),
            (3, "xyzzy qwerty plugh"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "und", 4: "und"}


def test_quality_monotone_in_length(spark):
    from search_engine_spark.pipeline.textstats import quality_scores

    df = spark.createDataFrame(
        [(1, "word " * 5), (2, "word " * 200)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["quality"] for r in quality_scores(df).collect()}
    assert got[2] > got[1]


# ---------------------------------------------------------------- multimodal


def test_multimodal_features_deterministic(docs):
    from search_engine_spark.pipeline.multimodal import extract_features, to_blob_table

    blobs = to_blob_table(docs.limit(20))
    a = {r["doc_id"]: (r["header"], tuple(r["features"])) for r in extract_features(blobs).collect()}
    b = {r["doc_id"]: (r["header"], tuple(r["features"])) for r in extract_features(blobs).collect()}
    assert a == b
    assert all(len(f) == 8 and all(0.0 <= x <= 1.0 for x in f) for _h, f in a.values())


def test_decode_image_library_formats_raise():
    # netpbm/BMP/WAV decode for real (test_media_codecs.py); formats that
    # need an external codec library still fail loud at the boundary
    from search_engine_spark.pipeline.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_frame_sample_plan(spark):
    from search_engine_spark.pipeline.multimodal import frame_sample_plan, to_blob_table

    df = spark.createDataFrame([(1, "x" * 640)], "doc_id long, text string")
    rows = frame_sample_plan(to_blob_table(df), every_n=3).collect()
    assert [r["frame_idx"] for r in rows] == [0, 3, 6, 9]
    assert all(r["n_frames"] == 10 for r in rows)
