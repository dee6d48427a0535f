"""IVF index LSM freshness: delta segments, tombstones, compaction.

Mirrors test_ann_freshness.py for the trained-quantizer IVF index:
probing base+delta == probing one index assigned under the SAME
centroids over the full corpus; deletions are excluded at probe time
and removed physically at compaction; a re-embedded vector's latest
assignment wins the compaction fold; segments assigned under different
quantizers fail loud.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from search_engine_spark.pipeline.kmeans import (
    compact_ivf_index,
    extend_ivf_index,
    ivf_index_topk,
    ivf_multi_topk,
    read_ivf_centroids,
    write_ivf_assignments,
    write_ivf_index,
)

DIM, K, NPROBE = 16, 6, 3


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
    d = tmp_path_factory.mktemp("ivf")
    base, delta, full = str(d / "base"), str(d / "delta"), str(d / "full")
    # quantizer TRAINED (2 Lloyd rounds) on the base corpus; the delta
    # and the parity index are assigned under those same centroids
    cent = write_ivf_index(
        spark, spark.createDataFrame(base_pdf), base, DIM, K, iterations=2
    )
    extend_ivf_index(spark, base, spark.createDataFrame(delta_pdf), delta)
    write_ivf_assignments(emb, full, cent)
    queries = [pdf.embedding.iloc[i] for i in (0, 120, 350)]
    return emb, pdf, base, delta, full, queries


def test_segmented_probe_equals_single_index(spark, setup):
    emb, _, base, delta, full, queries = setup
    for qv in queries:
        got = _rows(ivf_multi_topk(spark, [base, delta], emb, qv, k=10, nprobe=NPROBE))
        want = _rows(ivf_index_topk(spark, full, emb, qv, k=10, nprobe=NPROBE))
        assert got == want


def test_delta_shares_base_quantizer(spark, setup):
    _, _, base, delta, *_ = setup
    np.testing.assert_array_equal(
        read_ivf_centroids(spark, base), read_ivf_centroids(spark, delta)
    )


def test_tombstones_excluded_at_probe(spark, setup, tmp_path):
    emb, pdf, base, delta, full, queries = setup
    qv = queries[0]
    top = _rows(ivf_multi_topk(spark, [base, delta], emb, qv, k=3, nprobe=NPROBE))
    dead = [vid for vid, _ in top]
    after = _rows(
        ivf_multi_topk(
            spark, [base, delta], emb, qv, k=10, nprobe=NPROBE, tombstones=dead
        )
    )
    assert not set(dead) & {v for v, _ in after}
    # equals assignments over the remaining corpus under the same quantizer
    live = emb.filter(~F.col("vec_id").isin(dead))
    rebuilt = str(tmp_path / "rb")
    write_ivf_assignments(live, rebuilt, read_ivf_centroids(spark, base))
    assert after == _rows(ivf_index_topk(spark, rebuilt, live, qv, k=10, nprobe=NPROBE))


def test_compaction_folds_physically(spark, setup, tmp_path):
    emb, pdf, base, delta, full, queries = setup
    dead = [5, 17, 350]
    out = str(tmp_path / "cmp")
    compact_ivf_index(spark, [base, delta], out, tombstones=dead)
    rows = spark.read.parquet(out)
    assert rows.filter(F.col("vec_id").isin(dead)).count() == 0
    assert rows.count() == 400 - len(dead)
    live = emb.filter(~F.col("vec_id").isin(dead))
    for qv in queries:
        got = _rows(ivf_index_topk(spark, out, live, qv, k=10, nprobe=NPROBE))
        want = _rows(
            ivf_multi_topk(
                spark, [base, delta], live, qv, k=10, nprobe=NPROBE, tombstones=dead
            )
        )
        assert got == want


def test_reembedded_vector_latest_assignment_wins(spark, setup, tmp_path):
    emb, pdf, base, delta, full, queries = setup
    rng = np.random.default_rng(99)
    new_vec = (rng.standard_normal(DIM) * 3).astype(np.float32).tolist()
    upd_pdf = pdf.copy()
    upd_pdf.loc[upd_pdf.vec_id == 42, "embedding"] = pd.Series(
        [new_vec], index=upd_pdf.index[upd_pdf.vec_id == 42]
    )
    upd = spark.createDataFrame(upd_pdf)
    reseg = str(tmp_path / "reemb")
    extend_ivf_index(
        spark, base, spark.createDataFrame(upd_pdf[upd_pdf.vec_id == 42]), reseg
    )
    # probing exactly at the new vector must return it at rank 1
    got = _rows(
        ivf_multi_topk(spark, [base, delta, reseg], upd, new_vec, k=5, nprobe=NPROBE)
    )
    assert got[0][0] == 42
    # compaction keeps only the latest assignment for vec 42
    out = str(tmp_path / "cmp2")
    compact_ivf_index(spark, [base, delta, reseg], out)
    rows = spark.read.parquet(out).filter(F.col("vec_id") == 42).collect()
    assert len(rows) == 1
    fresh = str(tmp_path / "fresh")
    write_ivf_assignments(
        spark.createDataFrame(upd_pdf[upd_pdf.vec_id == 42]),
        fresh,
        read_ivf_centroids(spark, base),
    )
    want = spark.read.parquet(fresh).collect()[0]
    assert int(rows[0].cell) == int(want.cell)


def test_drift_stats_flag_shifted_arrivals(spark, setup, tmp_path):
    """Arrivals the quantizer cannot represent must show a lower mean
    cosine-to-assigned-centroid than the base segment — the documented
    retrain signal.  Cosine drift means DIRECTIONAL novelty (low max-cos
    against every centroid), so the test drifts into the centroid null
    space: k=6 centroids span at most 6 of the 16 dims, and SVD gives a
    direction exactly orthogonal to all of them."""
    from search_engine_spark.pipeline.kmeans import ivf_drift_stats

    emb, pdf, base, delta, *_ = setup
    cent = read_ivf_centroids(spark, base)
    null_dir = np.linalg.svd(cent)[2][-1]  # ⊥ to every centroid row
    assert np.max(np.abs(cent @ null_dir)) < 1e-8
    rng = np.random.default_rng(7)
    drift_pdf = pd.DataFrame(
        {
            "vec_id": np.arange(1000, 1080, dtype=np.int64),
            "embedding": [
                (null_dir + rng.standard_normal(DIM) * 0.02)
                .astype(np.float32)
                .tolist()
                for _ in range(80)
            ],
        }
    )
    drifted = spark.createDataFrame(drift_pdf)
    seg2 = str(tmp_path / "drift")
    extend_ivf_index(spark, base, drifted, seg2)
    both = emb.unionByName(drifted)
    stats = {
        r.seg: r for r in ivf_drift_stats(spark, [base, delta, seg2], both).collect()
    }
    assert stats[0].n == 300 and stats[1].n == 100 and stats[2].n == 80
    # in-distribution delta tracks the base; null-space arrivals crater
    assert abs(stats[1].mean_cos - stats[0].mean_cos) < 0.1
    assert stats[2].mean_cos < 0.15 < stats[0].mean_cos


def test_mixed_quantizers_fail_loud(spark, setup, tmp_path):
    emb, pdf, base, *_ = setup
    other = str(tmp_path / "other")
    write_ivf_index(spark, emb, other, DIM, K, iterations=1)
    with pytest.raises(ValueError, match="share the quantizer"):
        ivf_multi_topk(spark, [base, other], emb, pdf.embedding.iloc[0], k=5)
