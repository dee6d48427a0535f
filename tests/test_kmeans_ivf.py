"""Distributed k-means coarse quantizer + IVF probe.

Gates: training is deterministic and reduces inertia; the persisted
index's assignment matches the driver-side rule exactly; the IVF probe
equals a transparent re-derivation; and recall@10 vs brute force clears
a floor on a clustered corpus (the honest ANN gate — IVF trades recall
for pruning, so the gate is statistical, not row-identity).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from search_engine_spark.pipeline.kmeans import (
    _normalize,
    assign_cells,
    ivf_index_topk,
    kmeans_train,
    probe_cells,
    read_ivf_centroids,
    write_ivf_index,
)
from search_engine_spark.pipeline.similarity import cosine_topk

DIM, K = 12, 8


def _clustered_pdf(n: int, seed: int = 3) -> pd.DataFrame:
    """n vectors around K well-separated direction prototypes."""
    rng = np.random.default_rng(seed)
    protos = _normalize(rng.standard_normal((K, DIM)) * 4)
    labels = rng.integers(0, K, size=n)
    vecs = protos[labels] * 5 + rng.standard_normal((n, DIM)) * 0.6
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [v.astype(np.float32).tolist() for v in vecs],
        }
    )


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(_clustered_pdf(600)).cache()


@pytest.fixture(scope="module")
def trained(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "idx")
    cent = write_ivf_index(spark, emb, path, DIM, K, iterations=4)
    return path, cent


def _inertia(pdf: pd.DataFrame, cent: np.ndarray) -> float:
    mat = np.stack([np.asarray(v, float) for v in pdf.embedding])
    sims = _normalize(mat) @ _normalize(cent).T
    return float((1.0 - sims.max(axis=1)).sum())


def test_training_deterministic_and_converging(spark, emb):
    c1 = kmeans_train(emb, DIM, K, iterations=1)
    c4 = kmeans_train(emb, DIM, K, iterations=4)
    c4b = kmeans_train(emb, DIM, K, iterations=4)
    assert np.array_equal(c4, c4b)
    pdf = _clustered_pdf(600)
    assert _inertia(pdf, c4) <= _inertia(pdf, c1) + 1e-12


def test_persisted_assignment_matches_rule(spark, emb, trained):
    path, cent = trained
    disk = {
        (r.vec_id, r.cell) for r in spark.read.parquet(path).collect()
    }
    rule = {(r.vec_id, r.cell) for r in assign_cells(emb, cent).collect()}
    assert disk == rule
    assert len(disk) == 600
    # sidecar round-trips
    assert np.allclose(read_ivf_centroids(spark, path), cent)


def test_probe_equals_rederivation(spark, emb, trained):
    path, cent = trained
    pdf = _clustered_pdf(600)
    qv = pdf.embedding.iloc[7]
    got = [(r.vec_id, r.cos) for r in ivf_index_topk(spark, path, emb, qv, 10, nprobe=2).collect()]
    cells = probe_cells(cent, qv, 2)
    members = assign_cells(emb, cent).filter(F.col("cell").isin(cells)).select("vec_id")
    want = [
        (r.vec_id, r.cos)
        for r in cosine_topk(emb.join(members, "vec_id", "left_semi"), qv, 10).collect()
    ]
    assert got == want


def test_recall_gate_vs_brute_force(spark, emb, trained):
    """recall@10 over 12 queries with nprobe=2 of 8 cells ≥ 0.9 on the
    clustered corpus — the scale contract: prune 75% of cells, keep the
    neighbors."""
    path, _ = trained
    pdf = _clustered_pdf(600)
    hits = total = 0
    for i in range(0, 600, 50):
        qv = pdf.embedding.iloc[i]
        ivf = {r.vec_id for r in ivf_index_topk(spark, path, emb, qv, 10, nprobe=2).collect()}
        ex = {r.vec_id for r in cosine_topk(emb, qv, 10).collect()}
        hits += len(ivf & ex)
        total += len(ex)
    assert hits / total >= 0.9, f"recall {hits}/{total}"
