"""ANN index LSM freshness: delta segments, vector tombstones, compaction.

Invariants (mirroring the text index's extend/multi/compact suite):
probing base+delta segments == probing a full rebuild; deletions are
excluded at probe time and removed physically at compaction; a
re-embedded vector's fresh signature wins (keep-latest fold) and its
stale signature is at worst a spurious candidate absorbed by the exact
rerank.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from search_engine_spark.pipeline.similarity import (
    ann_index_topk,
    ann_multi_topk,
    compact_ann_index,
    extend_ann_index,
    write_ann_index,
)

DIM, BITS, TABLES, SEED = 16, 4, 8, 7


def _emb_pdf(n: int, seed: int = 0) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [
                rng.standard_normal(DIM).astype(np.float32).tolist() for _ in range(n)
            ],
        }
    )


def _rows(df) -> list[tuple]:
    return [(r.vec_id, r.cos) for r in df.collect()]


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    pdf = _emb_pdf(400)
    emb = spark.createDataFrame(pdf).cache()
    base_pdf, delta_pdf = pdf[pdf.vec_id < 300], pdf[pdf.vec_id >= 300]
    d = tmp_path_factory.mktemp("ann")
    base, delta, full = str(d / "base"), str(d / "delta"), str(d / "full")
    write_ann_index(spark.createDataFrame(base_pdf), base, DIM, BITS, TABLES, SEED)
    extend_ann_index(spark, base, spark.createDataFrame(delta_pdf), delta)
    write_ann_index(emb, full, DIM, BITS, TABLES, SEED)
    queries = [pdf.embedding.iloc[i] for i in (0, 120, 350)]
    return emb, pdf, base, delta, full, queries


def test_segmented_probe_equals_rebuild(spark, setup):
    emb, _, base, delta, full, queries = setup
    for qv in queries:
        got = _rows(ann_multi_topk(spark, [base, delta], emb, qv, k=10))
        want = _rows(ann_index_topk(spark, full, emb, qv, k=10))
        assert got == want


def test_tombstones_excluded_at_probe(spark, setup):
    emb, pdf, base, delta, full, queries = setup
    qv = queries[0]
    top = _rows(ann_multi_topk(spark, [base, delta], emb, qv, k=3))
    dead = [vid for vid, _ in top]
    after = _rows(
        ann_multi_topk(spark, [base, delta], emb, qv, k=10, tombstones=dead)
    )
    assert not set(dead) & {v for v, _ in after}
    # equals a rebuild over the remaining corpus
    live = emb.filter(~F.col("vec_id").isin(dead))
    import tempfile

    rebuilt = tempfile.mkdtemp(prefix="ann_rb_")
    write_ann_index(live, rebuilt, DIM, BITS, TABLES, SEED)
    assert after == _rows(ann_index_topk(spark, rebuilt, live, qv, k=10))


def test_compaction_folds_physically(spark, setup, tmp_path):
    emb, pdf, base, delta, full, queries = setup
    dead = [5, 17, 350]
    out = str(tmp_path / "cmp")
    compact_ann_index(spark, [base, delta], out, tombstones=dead)
    sigs = spark.read.parquet(out)
    assert sigs.filter(F.col("vec_id").isin(dead)).count() == 0
    assert sigs.count() == (400 - len(dead)) * TABLES
    live = emb.filter(~F.col("vec_id").isin(dead))
    for qv in queries:
        got = _rows(ann_index_topk(spark, out, live, qv, k=10))
        want = _rows(
            ann_multi_topk(spark, [base, delta], live, qv, k=10, tombstones=dead)
        )
        assert got == want


def test_reembedded_vector_fresh_signature_wins(spark, setup, tmp_path):
    """Re-embed vec 42 far away from its old position: the delta
    segment's signature must make it findable near its NEW location,
    and compaction must drop the stale buckets (keep-latest)."""
    emb, pdf, base, delta, full, queries = setup
    rng = np.random.default_rng(99)
    new_vec = (rng.standard_normal(DIM) * 3).astype(np.float32).tolist()
    upd_pdf = pdf.copy()
    upd_pdf.loc[upd_pdf.vec_id == 42, "embedding"] = pd.Series(
        [new_vec], index=upd_pdf.index[upd_pdf.vec_id == 42]
    )
    upd = spark.createDataFrame(upd_pdf)
    reseg = str(tmp_path / "reemb")
    extend_ann_index(
        spark, base, spark.createDataFrame(upd_pdf[upd_pdf.vec_id == 42]), reseg
    )
    # probing exactly at the new vector must return it at rank 1
    got = _rows(ann_multi_topk(spark, [base, delta, reseg], upd, new_vec, k=5))
    assert got[0][0] == 42
    # compaction keeps only the latest signatures for vec 42
    out = str(tmp_path / "cmp2")
    compact_ann_index(spark, [base, delta, reseg], out)
    rows = spark.read.parquet(out).filter(F.col("vec_id") == 42)
    assert rows.count() == TABLES
    fresh = str(tmp_path / "fresh2")
    write_ann_index(upd, fresh, DIM, BITS, TABLES, SEED)
    want = {
        (r.table, r.bucket)
        for r in spark.read.parquet(fresh).filter(F.col("vec_id") == 42).collect()
    }
    assert {(r.table, r.bucket) for r in rows.collect()} == want


def test_mixed_parameters_fail_loud(spark, setup, tmp_path):
    emb, pdf, base, *_ = setup
    other = str(tmp_path / "other")
    write_ann_index(emb, other, DIM, BITS, TABLES, SEED + 1)
    with pytest.raises(ValueError, match="must share"):
        ann_multi_topk(spark, [base, other], emb, pdf.embedding.iloc[0], k=5)
