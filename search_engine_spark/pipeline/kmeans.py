"""Distributed k-means coarse quantizer for IVF ANN.

``similarity.ivf_cosine_topk`` documents its cell assignment as a
stand-in (the corpus ``label`` column).  This module supplies the real
thing: Lloyd's algorithm as a handful of Spark rounds, each ONE Arrow
assignment kernel emitting per-cell partial sums plus ONE tiny
(cells × dim)-row aggregation — the classic distributed k-means shape
(the same map-side-combine pattern as the index build's fragment
kernel; MLlib's KMeans is the library precedent, re-derived here so the
assignment rule stays oracle-replayable in SQL).

Scale notes (100 TB):
* each round shuffles only k·dim partial-sum cells per input batch —
  never vectors; the corpus is scanned once per round, map-side only;
* centroids live on the driver between rounds (k ≤ a few thousand ×
  dim doubles — kilobytes to MB) and broadcast into the kernel;
* init is deterministic: the k vectors with the smallest
  ``md5(vec_id)`` — a seeded pseudo-random sample that is replayable
  (and SQL-expressible) without a corpus shuffle, unlike k-means++
  whose sequential dependence costs k passes;
* assignment rule = argmax of ROUND(cos + 1e-9, 5), ties to the lowest
  cell — the epsilon-nudged rounding (the contract convention) pins the
  float boundary so numpy and DuckDB replay the same assignment.

Reference parity: the reference has no vector search; this extends the
engine the way SURVEY.md §2's training-data-pipeline section requires.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .similarity import cosine_topk, read_json_sidecar, write_json_sidecar

_ASSIGN_ROUND = 5


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return mat / n


def _seed_centroids(embeddings: DataFrame, k: int) -> np.ndarray:
    """Deterministic init: vectors of the k smallest md5(vec_id)."""
    rows = (
        embeddings.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), F.asc("vec_id"))
        .limit(k)
        .collect()
    )
    return np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])


def _partials_kernel(cent_norm: np.ndarray, dim: int):
    """embeddings batch → (cell, j, s, n) partial sums for the update
    step.  Assignment = argmax cosine (unrounded inside training; the
    exported :func:`assign_cells` applies the rounded contract rule)."""

    def kern(batches):
        k = cent_norm.shape[0]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            cells = np.argmax(_normalize(mat) @ cent_norm.T, axis=1)
            sums = np.zeros((k, dim))
            np.add.at(sums, cells, mat)
            counts = np.bincount(cells, minlength=k)
            live = np.flatnonzero(counts)
            yield pd.DataFrame(
                {
                    "cell": np.repeat(live, dim).astype(np.int32),
                    "j": np.tile(np.arange(dim, dtype=np.int32), live.size),
                    "s": sums[live].reshape(-1),
                    "n": np.repeat(counts[live], dim).astype(np.int64),
                }
            )

    return kern


def kmeans_train(
    embeddings: DataFrame, dim: int, k: int, iterations: int = 5
) -> np.ndarray:
    """Lloyd's k-means over (vec_id, embedding) → (k, dim) centroids.

    Each round: one corpus scan through the Arrow partials kernel, one
    (cell, j) aggregation of k·dim rows, centroids collected to the
    driver.  Empty cells keep their previous centroid (standard Lloyd
    fallback, deterministic)."""
    cent = _seed_centroids(embeddings, k)
    for _ in range(iterations):
        # ONE corpus scan: sum(s) per (cell, j) is the coordinate sum;
        # sum(n) over the j==0 rows is the member count (each batch
        # repeats its batch-local count once per coordinate)
        rows = (
            embeddings.select("embedding")
            .mapInPandas(
                _partials_kernel(_normalize(cent), dim),
                schema="cell int, j int, s double, n long",
            )
            .groupBy("cell", "j")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        sums = np.zeros((k, dim))
        counts = np.zeros(k, dtype=np.int64)
        for r in rows:
            sums[r.cell, r.j] += r.s
            if r.j == 0:
                counts[r.cell] = r.n
        live = counts > 0
        cent[live] = sums[live] / counts[live, None]
    return cent


def assign_cells(embeddings: DataFrame, centroids: np.ndarray) -> DataFrame:
    """(vec_id, cell) under the contract rule: argmax of ROUND(cos, 5),
    ties to the lowest cell — replayable in SQL with literal centroids."""
    cent_norm = _normalize(centroids)

    def kern(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            sims = np.round(_normalize(mat) @ cent_norm.T + 1e-9, _ASSIGN_ROUND)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cell": np.argmax(sims, axis=1).astype(np.int32),
                }
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        kern, schema="vec_id long, cell int"
    )


def _write_cells(rows: DataFrame, path: str, centroids: np.ndarray) -> None:
    """ONE source of truth for the index layout: (vec_id, cell) rows
    repartitioned on the partition column (one file per cell, not
    tasks×cells small files), written cell-partitioned, plus the
    ``_centroids`` sidecar."""
    rows.repartition("cell").write.mode("overwrite").partitionBy("cell").parquet(
        path
    )
    write_json_sidecar(
        path + "/_centroids",
        [
            {"cell": int(c), "centroid": [float(v) for v in centroids[c]]}
            for c in range(centroids.shape[0])
        ],
    )


def write_ivf_assignments(
    embeddings: DataFrame, path: str, centroids: np.ndarray
) -> None:
    """Persist cell assignments under a FIXED quantizer: ids-only
    (vec_id) rows partitioned by cell + the ``_centroids`` sidecar.

    The layout half of :func:`write_ivf_index`, exposed so delta
    segments (:func:`extend_ivf_index`) can reuse the base's trained
    centroids — the quantizer must be shared across segments for probes
    to mean the same thing."""
    _write_cells(assign_cells(embeddings, centroids), path, centroids)


def write_ivf_index(
    spark,
    embeddings: DataFrame,
    path: str,
    dim: int,
    k: int,
    iterations: int = 5,
) -> np.ndarray:
    """Train the coarse quantizer and persist the IVF index: ids-only
    (vec_id) rows partitioned by cell, plus a ``_centroids`` sidecar
    (cell, centroid) — same layout discipline as ``write_ann_index``
    (probe = partition-pruned read of nprobe cells; vectors join back
    by id).  Returns the trained centroids."""
    cent = kmeans_train(embeddings, dim, k, iterations)
    write_ivf_assignments(embeddings, path, cent)
    return cent


def read_ivf_centroids(spark, path: str) -> np.ndarray:
    rows = read_json_sidecar(path + "/_centroids")
    k = max(int(r["cell"]) for r in rows) + 1
    cent = np.zeros((k, len(rows[0]["centroid"])))
    for r in rows:
        cent[int(r["cell"])] = np.asarray(r["centroid"], dtype=np.float64)
    return cent


def probe_cells(centroids: np.ndarray, query_vec: list[float], nprobe: int) -> list[int]:
    """The nprobe cells whose centroids are nearest the query — driver
    side scalars (k is small), same rounded rule as assignment, ties to
    the lowest cell."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    sims = np.round(_normalize(centroids) @ qn + 1e-9, _ASSIGN_ROUND)
    order = np.lexsort((np.arange(len(sims)), -sims))
    return [int(c) for c in order[:nprobe]]


def _cell_candidates(
    rows: DataFrame, centroids: np.ndarray, query_vec: list[float], nprobe: int
) -> DataFrame:
    """Probe core shared by the single- and multi-segment paths: rank
    cells driver-side (:func:`probe_cells` — the rounding/tie rules live
    in exactly one place), keep the nprobe cells' vec_ids.  Over a
    cell-partitioned parquet scan the ``isin`` lands as
    PartitionFilters (PLANS.md)."""
    cells = probe_cells(centroids, query_vec, nprobe)
    return rows.filter(F.col("cell").isin(cells)).select("vec_id")


def ivf_index_topk(
    spark,
    index_path: str,
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF ANN probe against the persisted index: rank cells on the
    driver from the ``_centroids`` sidecar, partition-pruned read of the
    nprobe cells' ids, vectors equi-joined back, exact cosine rerank of
    the members only."""
    cent = read_ivf_centroids(spark, index_path)
    cand_ids = _cell_candidates(
        spark.read.parquet(index_path), cent, query_vec, nprobe
    )
    members = embeddings.join(F.broadcast(cand_ids), "vec_id", "left_semi")
    return cosine_topk(members, query_vec, k)


# ------------------------------------------------------- IVF freshness
#
# The same LSM triad the text index (index/extend.py, index/multi.py)
# and the LSH ANN index (similarity.extend_ann_index / ann_multi_topk /
# compact_ann_index) already have, for the IVF index: daily arrivals
# are assigned under the BASE segment's trained quantizer and written
# as O(delta) segments; probes union the nprobe cell partitions of
# every segment; compaction folds keep-latest and removes tombstones
# physically.  The correctness argument matches the LSH index's: every
# probe exact-reranks candidates against the CURRENT embedding table,
# so a re-embedded vector's stale cell membership is at worst a
# spurious candidate, while its delta-segment assignment restores
# recall near the new location.  Quantizer drift is the one genuinely
# new concern — deltas assigned under old centroids lose recall as the
# distribution shifts — so compaction is the retrain point: rebuild
# with ``write_ivf_index`` (fresh Lloyd rounds) instead of folding once
# the corpus has drifted; `_read_ivf_segments` fails loud if segments
# ever disagree on centroids.


def _read_ivf_segments(spark, paths: list[str]):
    """Union of per-segment (vec_id, cell) rows tagged with segment
    index, plus the shared centroids — fails loud if any segment was
    assigned under a different quantizer (mixed-quantizer probes are a
    silent-recall-loss bug)."""
    if not paths:
        raise ValueError("need at least one IVF index segment")
    cents = [read_ivf_centroids(spark, p) for p in paths]
    for p, c in zip(paths, cents):
        if c.shape != cents[0].shape or not np.array_equal(c, cents[0]):
            raise ValueError(
                f"IVF segment {p} was assigned under different centroids — "
                "segments must share the quantizer (retrain = rebuild via "
                "write_ivf_index, not extend)"
            )
    out = None
    for i, p in enumerate(paths):
        s = spark.read.parquet(p).withColumn("seg", F.lit(i))
        out = s if out is None else out.unionByName(s)
    return out, cents[0]


def extend_ivf_index(
    spark, base_path: str, new_embeddings: DataFrame, out_path: str
) -> None:
    """Delta IVF segment: assign ONLY the new (or re-embedded) vectors
    under the base's trained centroids (read from its ``_centroids``
    sidecar) and write them in the base's layout.  O(delta) work — the
    base is never rescanned, the quantizer is never retrained here."""
    cent = read_ivf_centroids(spark, base_path)
    write_ivf_assignments(new_embeddings, out_path, cent)


def ivf_multi_topk(
    spark,
    index_paths: list[str],
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    tombstones: list[int] | None = None,
) -> DataFrame:
    """IVF ANN probe across base + delta segments as ONE index.

    Cells are ranked once from the shared centroids; each segment
    contributes its partition-pruned nprobe cell reads; candidate ids
    union (stale assignments of re-embedded vectors are harmless — the
    rerank scores the CURRENT vector), ``tombstones`` are excluded at
    candidate time, and the exact cosine rerank joins vectors from the
    current embedding table.  Equals a probe against a single index
    assigned under the same centroids (pinned by tests)."""
    segs, cent = _read_ivf_segments(spark, index_paths)
    cand_ids = _cell_candidates(segs, cent, query_vec, nprobe).dropDuplicates(
        ["vec_id"]
    )
    if tombstones:
        cand_ids = cand_ids.filter(
            ~F.col("vec_id").isin([int(t) for t in tombstones])
        )
    members = embeddings.join(F.broadcast(cand_ids), "vec_id", "left_semi")
    return cosine_topk(members, query_vec, k)


def ivf_drift_stats(
    spark, index_paths: list[str], embeddings: DataFrame
) -> DataFrame:
    """Per-segment quantizer fit — the "when to retrain" observable.

    Returns (seg, n, mean_cos, min_cos): the rounded cosine of every
    vector to its ASSIGNED centroid, aggregated per segment.  Deltas are
    assigned under the base's quantizer (``extend_ivf_index``), so as
    the arrival distribution drifts away from the training corpus the
    new segments' mean_cos sinks below the base segment's — the signal
    that compaction should be a ``write_ivf_index`` retrain instead of
    a fold.  One ids→vectors join + one Arrow kernel + one tiny (seg)
    aggregate; index bytes drive the shuffle, embedding bytes are
    scanned once and never shuffled wider than the join."""
    segs, cent = _read_ivf_segments(spark, index_paths)
    cent_norm = _normalize(cent)

    def kern(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            cells = pdf["cell"].to_numpy(dtype=np.int64)
            sims = np.round(
                (_normalize(mat) * cent_norm[cells]).sum(axis=1) + 1e-9,
                _ASSIGN_ROUND,
            )
            yield pd.DataFrame({"seg": pdf["seg"], "cos": sims})

    rows = (
        segs.join(embeddings, "vec_id")
        .select("seg", "cell", "embedding")
        .mapInPandas(kern, schema="seg int, cos double")
    )
    nudge = F.lit(1e-9)
    return rows.groupBy("seg").agg(
        F.count("*").alias("n"),
        F.round(F.avg("cos") + nudge, _ASSIGN_ROUND).alias("mean_cos"),
        F.round(F.min("cos") + nudge, _ASSIGN_ROUND).alias("min_cos"),
    )


def compact_ivf_index(
    spark,
    index_paths: list[str],
    out_path: str,
    tombstones: list[int] | None = None,
) -> None:
    """Fold IVF segments into one index root: per vec_id only the LATEST
    segment's cell survives (a re-embedded vector's stale assignment
    drops out), ``tombstones`` are removed PHYSICALLY, and the result is
    rewritten cell-partitioned with the shared ``_centroids`` sidecar.
    One shuffle on vec_id over ids-only rows — index bytes, never
    embedding bytes."""
    segs, cent = _read_ivf_segments(spark, index_paths)
    if tombstones:
        segs = segs.filter(~F.col("vec_id").isin([int(t) for t in tombstones]))
    latest = segs.groupBy("vec_id").agg(F.max("seg").alias("seg"))
    kept = segs.join(latest, ["vec_id", "seg"]).select("vec_id", "cell")
    _write_cells(kept, out_path, cent)
