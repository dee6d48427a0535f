"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline — a single narrow
map + TakeOrderedAndProject, no shuffle of the vectors.  The scale path
is random-hyperplane LSH: b sign-bits per vector (fixed seed), candidates
restricted to bucket collisions (multi-probe = exact-bucket here), then
exact cosine rerank of candidates only.  All arithmetic is built-in
higher-order functions (``zip_with`` + ``aggregate``) — JVM, no Python.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..functions import rnd

ROUND = 5


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _cos_arrow(va, vb):
    """Vectorized pairwise cosine: one Arrow batch in, one numpy einsum.

    The per-pair JVM higher-order aggregate (``_dot``/``_norm``) is
    interpreted per array element; for millions of candidate pairs the
    Arrow kernel is the fast path (same pattern as the LSH signature
    matmul).  Last-ulp float divergence vs the JVM/DuckDB paths is
    absorbed by the contract's +1e-9 round-to-5 quantization.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a, b):
        import numpy as np  # executor-side
        import pandas as pd

        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack(a.to_numpy()).astype(np.float64)
        B = np.stack(b.to_numpy()).astype(np.float64)
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pd.Series(num / den)

    return _cos(va, vb)


def cosine_scores(embeddings: DataFrame, query_vec: list[float]) -> DataFrame:
    """(vec_id, cos) for every vector vs the query — exact, unrounded."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return embeddings.select(
        "vec_id",
        (_dot(F.col("embedding"), q) / (_norm(F.col("embedding")) * _norm(q))).alias("cos"),
    )


def cosine_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10) -> DataFrame:
    """Exact brute-force cosine top-k: (vec_id, cos rounded)."""
    return (
        cosine_scores(embeddings, query_vec)
        .select("vec_id", rnd(F.col("cos"), ROUND).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def cosine_pairs(embeddings: DataFrame, threshold: float = 0.9) -> DataFrame:
    """All-pairs cosine ≥ threshold (exact; the LSH verifier).

    Deliberately O(n²) — the small-scale recall gate, never the 100 TB
    path — but the per-pair math still runs in the Arrow kernel."""
    e = embeddings.select("vec_id", F.col("embedding").alias("v"))
    return (
        e.alias("x")
        .join(e.alias("y"), F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("vec_a"),
            F.col("y.vec_id").alias("vec_b"),
            rnd(_cos_arrow(F.col("x.v"), F.col("y.v")), ROUND).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def write_json_sidecar(path: str, rows: list[dict]) -> None:
    """Tiny metadata sidecar as newline-delimited JSON, written DRIVER-
    side.  Round 3 wrote these through ``spark.write.json`` — measured
    3.7-7.3 s of job overhead for ONE row (the whole ann_index_build
    5.3→9.3 s bench regression, see BASELINE.md "ann_index_build
    attribution").  The layout matches what Spark would have written
    (one JSON object per line in a ``part-*.json`` file), so existing
    indexes keep reading.  On an object store, route this single small
    PUT through its client; never a Spark job."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, "part-00000.json.tmp")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.replace(tmp, os.path.join(path, "part-00000.json"))


def read_json_sidecar(path: str) -> list[dict]:
    """Driver-side read of a sidecar dir (this module's writes and the
    round-3 Spark-written ``part-*.json`` files alike)."""
    import glob
    import json
    import os

    rows = []
    for fn in sorted(glob.glob(os.path.join(path, "*.json"))):
        with open(fn) as f:
            rows.extend(json.loads(line) for line in f if line.strip())
    if not rows:
        raise FileNotFoundError(f"no JSON sidecar rows under {path}")
    return rows


def hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim))


def lsh_signatures(
    embeddings: DataFrame, dim: int, bits: int = 4, tables: int = 8, seed: int = 42
) -> DataFrame:
    """(vec_id, table, bucket) — one row per hash table, IDS ONLY.

    Multi-table random-hyperplane LSH: a vector lands in ``tables``
    independent buckets; a query probes its bucket in every table and
    candidates are the union (classic L-table LSH — recall
    1−(1−p^bits)^tables for collision prob p per plane).

    Signature rows never carry the embedding: repeating each vector
    ``tables`` (=8) times would make every signature exchange — and the
    persisted index — 8× the corpus' embedding bytes.  Consumers join
    vectors back by vec_id (equi-join) only for the rows they actually
    score.

    Signatures come from ONE Arrow kernel doing a single numpy matmul of
    the batch against all tables' hyperplanes — a (rows × dim) @
    (dim × tables·bits) product — instead of tables·bits per-plane SQL
    expressions (whose codegen/compile cost dominated at small scale).
    """
    import pandas as pd

    all_planes = np.concatenate(
        [hyperplanes(dim, bits, seed + t) for t in range(tables)]
    ).T  # (dim, tables*bits)
    weights = (2 ** np.arange(bits, dtype=np.int64)).reshape(1, bits)

    def kernel(batches):
        for pdf in batches:
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            signs = (mat @ all_planes) >= 0  # (rows, tables*bits)
            buckets = (
                signs.reshape(len(pdf), tables, bits).astype(np.int64) * weights
            ).sum(axis=2)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy().repeat(tables),
                    "table": np.tile(np.arange(tables, dtype=np.int32), len(pdf)),
                    "bucket": buckets.reshape(-1),
                }
            )

    # vec_id passes through untouched — inherit its type so both long
    # ids (the embeddings tables) and composite string keys (the hybrid
    # turn index, pipeline/hybrid.write_turn_ann_index) work
    vid_type = embeddings.schema["vec_id"].dataType.simpleString()
    return embeddings.select("vec_id", "embedding").mapInPandas(
        kernel, schema=f"vec_id {vid_type}, table int, bucket long"
    )


def query_buckets(
    query_vec: list[float], bits: int = 4, tables: int = 8, seed: int = 42
) -> list[tuple[int, int]]:
    """The (table, bucket) cells a query probes — driver-side scalars."""
    dim = len(query_vec)
    out = []
    for t in range(tables):
        planes = hyperplanes(dim, bits, seed + t)
        out.append(
            (t, int(sum(2**i for i, row in enumerate(planes) if float(np.dot(row, query_vec)) >= 0)))
        )
    return out


def _probe_predicate(qbuckets: list[tuple[int, int]]):
    probe = F.lit(False)
    for t, bkt in qbuckets:
        probe = probe | ((F.col("table") == t) & (F.col("bucket") == bkt))
    return probe


def write_ann_index(
    embeddings: DataFrame,
    path: str,
    dim: int,
    bits: int = 4,
    tables: int = 8,
    seed: int = 42,
) -> None:
    """Build-time: persist IDS-ONLY LSH signatures partitioned by
    (table, bucket), plus the LSH parameters as a ``_meta`` sidecar.

    One signature pass over the corpus, written once; every query then
    reads only its ``tables`` probe cells via parquet partition pruning
    (PartitionFilters) — the 100 TB path never rescans the table.  The
    index stores (vec_id) per cell — never the vector, which would be
    ``tables``× the corpus' embedding bytes; probes join vectors back
    from the embedding table for the candidate ids only.

    The ``_meta`` sidecar (underscore prefix → invisible to parquet
    discovery; written through Spark so it works on any filesystem)
    pins (dim, bits, tables, seed): a probe with mismatched parameters
    would silently lose recall, so :func:`read_ann_index` validates.
    """
    sigs = lsh_signatures(embeddings, dim, bits, tables, seed)
    # repartition on the partition columns first: otherwise EVERY writer
    # task emits one file per (table, bucket) dir it sees — tasks×cells
    # small files (measured 47 s for 50k rows at 2048 cells); after the
    # shuffle each cell is one task → one file
    sigs.repartition("table", "bucket").write.mode("overwrite").partitionBy(
        "table", "bucket"
    ).parquet(path)
    write_json_sidecar(
        path + "/_meta",
        [{"dim": int(dim), "bits": int(bits), "tables": int(tables), "seed": int(seed)}],
    )


def read_ann_index(
    spark,
    path: str,
    dim: int | None = None,
    bits: int | None = None,
    tables: int | None = None,
    seed: int | None = None,
):
    """(signatures DataFrame, meta dict) for a persisted ANN index.

    Any expected parameter passed is validated against the ``_meta``
    sidecar — probing an index built with different LSH parameters is a
    silent-recall-loss bug, so it fails loud here."""
    row = read_json_sidecar(path + "/_meta")[0]
    meta = {k: int(row[k]) for k in ("dim", "bits", "tables", "seed")}
    for name, expected in (("dim", dim), ("bits", bits), ("tables", tables), ("seed", seed)):
        if expected is not None and meta[name] != expected:
            raise ValueError(
                f"ANN index at {path} was built with {name}={meta[name]}, "
                f"caller expects {name}={expected}"
            )
    return spark.read.parquet(path), meta


def ann_index_topk(
    spark,
    index_path: str,
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """ANN probe against a persisted ids-only index: partition-pruned
    read of the query's buckets, vectors equi-joined back from the
    embedding table for the candidate ids, exact cosine rerank of the
    candidates only.

    LSH parameters come from the index's ``_meta`` sidecar (the query
    dim is validated against it).  The candidate-id side is broadcast:
    it is bounded by the query's ``tables`` probe cells, never the
    corpus — the embedding table is scanned but never shuffled.
    """
    sigs, meta = read_ann_index(spark, index_path, dim=len(query_vec))
    cand_ids = (
        sigs.filter(
            _probe_predicate(
                query_buckets(query_vec, meta["bits"], meta["tables"], meta["seed"])
            )
        )
        .select("vec_id")
        .dropDuplicates(["vec_id"])
    )
    cand = embeddings.join(F.broadcast(cand_ids), "vec_id", "left_semi")
    return cosine_topk(cand, query_vec, k)


def lsh_cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    bits: int = 4,
    tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """ANN without a persisted index: one signature pass, bucket filter,
    vectors joined back for the candidate ids, exact rerank.  For
    repeated queries build the index once with :func:`write_ann_index`
    and probe via :func:`ann_index_topk` — that path replaces the
    signature scan with a partition-pruned read.
    """
    dim = len(query_vec)
    sigs = lsh_signatures(embeddings, dim, bits, tables, seed)
    cand_ids = (
        sigs.filter(_probe_predicate(query_buckets(query_vec, bits, tables, seed)))
        .select("vec_id")
        .dropDuplicates(["vec_id"])
    )
    cand = embeddings.join(F.broadcast(cand_ids), "vec_id", "left_semi")
    return cosine_topk(cand, query_vec, k)


# ------------------------------------------------------- ANN freshness
#
# The text index's LSM triad (build / extend / MultiIndex / compact,
# index/extend.py + index/multi.py) mirrored for the ANN index: a 100 TB
# embedding corpus has daily arrivals and re-embeddings just like the
# text corpus, and a rebuild-only index cannot absorb them.
#
# An ids-only LSH index makes the update story simpler than text:
# signatures carry no statistics, and every probe ends in an EXACT
# cosine rerank against the CURRENT embedding table.  So a re-embedded
# vector's stale signature in an old segment is harmless — at worst it
# adds a spurious candidate that the rerank scores with the fresh
# vector — while the delta segment's fresh signature restores recall
# for the new bucket.  Deletions DO need exclusion (a deleted id would
# otherwise resurface), handled like text tombstones: filtered from
# candidates at probe time, removed physically at compaction.


def _read_ann_segments(spark, paths: list[str]):
    """Union of per-segment signatures tagged with their segment index,
    plus the shared meta — fails loud if segments disagree on any LSH
    parameter (mixed-parameter probes silently lose recall)."""
    if not paths:
        raise ValueError("need at least one ANN index segment")
    segs, metas = zip(*[read_ann_index(spark, p) for p in paths])
    for p, m in zip(paths, metas):
        if m != metas[0]:
            raise ValueError(
                f"ANN segment {p} was built with {m}, expected {metas[0]} "
                "— segments must share (dim, bits, tables, seed)"
            )
    out = None
    for i, s in enumerate(segs):
        s = s.withColumn("seg", F.lit(i))
        out = s if out is None else out.unionByName(s)
    return out, metas[0]


def extend_ann_index(spark, base_path: str, new_embeddings: DataFrame, out_path: str) -> None:
    """Delta ANN segment: signatures of ONLY the new (or re-embedded)
    vectors, written in the base's layout with the base's LSH
    parameters (read from its ``_meta``, so a drifting caller cannot
    produce a mixed-parameter index).  O(delta) work — the base is
    never rescanned."""
    _, meta = read_ann_index(spark, base_path)
    write_ann_index(
        new_embeddings, out_path, meta["dim"], meta["bits"], meta["tables"], meta["seed"]
    )


def ann_multi_topk(
    spark,
    index_paths: list[str],
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    tombstones: list[int] | None = None,
) -> DataFrame:
    """ANN probe across base + delta segments as ONE index.

    Each segment contributes its partition-pruned probe cells; candidate
    ids union (stale signatures of re-embedded vectors are harmless —
    see module note), ``tombstones`` (deleted vec_ids) are excluded at
    candidate time, and the exact cosine rerank joins vectors from the
    CURRENT embedding table.  Equals a probe against a rebuilt
    single-segment index (pinned by tests)."""
    sigs, meta = _read_ann_segments(spark, index_paths)
    if meta["dim"] != len(query_vec):
        raise ValueError(
            f"query dim {len(query_vec)} != index dim {meta['dim']}"
        )
    cand_ids = (
        sigs.filter(
            _probe_predicate(
                query_buckets(query_vec, meta["bits"], meta["tables"], meta["seed"])
            )
        )
        .select("vec_id")
        .dropDuplicates(["vec_id"])
    )
    if tombstones:
        cand_ids = cand_ids.filter(~F.col("vec_id").isin([int(t) for t in tombstones]))
    cand = embeddings.join(F.broadcast(cand_ids), "vec_id", "left_semi")
    return cosine_topk(cand, query_vec, k)


def compact_ann_index(
    spark,
    index_paths: list[str],
    out_path: str,
    tombstones: list[int] | None = None,
) -> None:
    """Fold ANN segments into one index root: per vec_id only the LATEST
    segment's signatures survive (a re-embedded vector's stale buckets
    drop out), ``tombstones`` are removed PHYSICALLY, and the result is
    rewritten (table, bucket)-partitioned with the shared ``_meta``.
    One shuffle on vec_id over ids-only rows — index bytes, never
    embedding bytes."""
    sigs, meta = _read_ann_segments(spark, index_paths)
    if tombstones:
        sigs = sigs.filter(~F.col("vec_id").isin([int(t) for t in tombstones]))
    latest = sigs.groupBy("vec_id").agg(F.max("seg").alias("seg"))
    kept = sigs.join(latest, ["vec_id", "seg"]).select("vec_id", "table", "bucket")
    kept.repartition("table", "bucket").write.mode("overwrite").partitionBy(
        "table", "bucket"
    ).parquet(out_path)
    write_json_sidecar(out_path + "/_meta", [meta])


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.9,
    bits: int = 4,
    tables: int = 8,
    seed: int = 42,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the LSH-bucketed scale path.

    Candidate pairs come from (table, bucket) signature collisions (the
    same multi-table hyperplane LSH as ANN — high-cosine pairs collide
    in ≥1 table w.h.p.), then ONLY candidates get the exact cosine and
    the ≥ threshold filter.  Never an all-pairs product; the exact
    verifier :func:`cosine_pairs` remains the small-scale/recall-gate
    twin.  Returns (vec_a, vec_b, cos) with vec_a < vec_b.

    Pass ``signatures`` (the :func:`write_ann_index` table, read back
    via :func:`read_ann_index` with the expected parameters — that read
    validates bits/tables/seed against the index's ``_meta`` sidecar)
    to sign the corpus ONCE: without it, both collision-join sides
    re-run the signature kernel — fine locally, wasteful at 100 TB
    where the persisted index is the intended source.  When
    ``signatures`` is supplied, the ``bits``/``tables``/``seed``
    arguments are IGNORED (the signatures already encode them); use
    :func:`read_ann_index` so a parameter mismatch fails loud instead
    of silently losing recall.
    """
    sigs = (
        signatures
        if signatures is not None
        else lsh_signatures(embeddings, dim, bits, tables, seed)
    ).select("vec_id", "table", "bucket")
    a = sigs.select(F.col("vec_id").alias("vec_a"), "table", "bucket")
    b = sigs.select(F.col("vec_id").alias("vec_b"), "table", "bucket")
    # dedup the ID pairs first — the multi-table collision exchange
    # carries only (long, long), never the vectors — then join the
    # embeddings back (equi-joins on vec_id) and score each UNIQUE pair
    # once with the vectorized Arrow cosine kernel.  Interpreted
    # higher-order aggregates over millions of collision rows are the
    # slow path this avoids (measured 50s → ~5s at 2k vectors).
    ids = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .dropDuplicates(["vec_a", "vec_b"])
    )
    va = embeddings.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("_va"))
    vb = embeddings.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("_vb"))
    return (
        ids.join(va, "vec_a")
        .join(vb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            rnd(_cos_arrow(F.col("_va"), F.col("_vb")), ROUND).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def label_centroids(
    embeddings: DataFrame, dim: int, label_col: str = "label"
) -> DataFrame:
    """(label, centroid array<double>) — per-label mean vector, the IVF
    coarse quantizer (labels stand in for k-means cells: deterministic,
    oracle-replicable, and exactly what a trained quantizer provides).

    One groupBy with ``dim`` avg() aggregates (same shape as the MinHash
    signature aggregate): map-side partials, a |labels|-row shuffle, no
    explode — the exchange never carries per-vector rows."""
    aggs = [
        F.avg(F.col("embedding")[i].cast("double")).alias(f"c{i}") for i in range(dim)
    ]
    return (
        embeddings.groupBy(label_col)
        .agg(*aggs)
        .select(label_col, F.array(*[F.col(f"c{i}") for i in range(dim)]).alias("centroid"))
    )


def ivf_cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    label_col: str = "label",
) -> DataFrame:
    """IVF ANN: probe the ``nprobe`` coarse cells nearest the query,
    exact-rerank only their members.

    This variant groups by an EXISTING cell column (``label``) — IVF
    over externally supplied cells.  The trained coarse quantizer lives
    in ``pipeline/kmeans.py`` (distributed Lloyd rounds, persisted
    partition-by-cell index via ``write_ivf_index``, probe via
    ``ivf_index_topk``); use that for the real ANN path.  Centroids
    here are one aggregate, the centroid ranking happens on the
    |cells|-row side, and the member filter is a broadcast semi-join.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    cent = label_centroids(embeddings, len(query_vec), label_col)
    probe_cells = (
        cent.select(
            label_col,
            (
                _dot(F.col("centroid"), q) / (_norm(F.col("centroid")) * _norm(q))
            ).alias("ccos"),
        )
        .orderBy(F.desc("ccos"), F.asc(label_col))
        .limit(nprobe)
        .select(label_col)
    )
    members = embeddings.join(F.broadcast(probe_cells), label_col, "left_semi")
    return cosine_topk(members, query_vec, k)


def knn_join(
    left: DataFrame, right: DataFrame, k: int = 3, exclude_self: bool = True
) -> DataFrame:
    """For each left vector, its k nearest right vectors by cosine.

    Exact block nested-loop via crossJoin + per-left window top-k; the
    broadcast of the smaller side keeps it a map-side operation — valid
    only while the right side is broadcast-size.  At scale use
    :func:`knn_join_lsh`, which bounds candidates via bucket collisions.
    """
    from pyspark.sql.window import Window

    l = left.select(F.col("vec_id").alias("lid"), F.col("embedding").alias("lv"),
                    _norm(F.col("embedding")).alias("ln"))
    r = right.select(F.col("vec_id").alias("rid"), F.col("embedding").alias("rv"),
                     _norm(F.col("embedding")).alias("rn"))
    scored = l.crossJoin(F.broadcast(r))
    if exclude_self:
        scored = scored.filter(F.col("lid") != F.col("rid"))
    scored = scored.select(
        "lid",
        "rid",
        rnd(_dot(F.col("lv"), F.col("rv")) / (F.col("ln") * F.col("rn")), ROUND).alias("cos"),
    )
    w = Window.partitionBy("lid").orderBy(F.desc("cos"), F.asc("rid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("lid", "rid", "cos", "rank")
    )


def knn_join_lsh(
    left: DataFrame,
    right: DataFrame,
    dim: int,
    k: int = 3,
    bits: int = 4,
    tables: int = 8,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate kNN join: candidates restricted to LSH bucket collisions.

    Both sides get multi-table hyperplane signatures; the pair space is
    the equi-join on (table, bucket) — never a cross product — then each
    surviving pair is scored exactly and ranked per left vector.  At
    100 TB × 100 TB this bounds the join at Σ_buckets |L_b|·|R_b|
    instead of |L|·|R|; recall vs the exact join is gated in tests.
    """
    from pyspark.sql.window import Window

    ls = lsh_signatures(left, dim, bits, tables, seed).select(
        F.col("vec_id").alias("lid"), "table", "bucket"
    )
    rs = lsh_signatures(right, dim, bits, tables, seed).select(
        F.col("vec_id").alias("rid"), "table", "bucket"
    )
    # same shape as cosine_near_dup_pairs: the collision exchange
    # carries only (long, long) into the pair dedup, vectors join back
    # by id, and each unique pair is scored once by the Arrow kernel
    ids = (
        ls.join(rs, ["table", "bucket"])
        .select("lid", "rid")
        .dropDuplicates(["lid", "rid"])
    )
    if exclude_self:
        ids = ids.filter(F.col("lid") != F.col("rid"))
    lv = left.select(F.col("vec_id").alias("lid"), F.col("embedding").alias("lv"))
    rv = right.select(F.col("vec_id").alias("rid"), F.col("embedding").alias("rv"))
    scored = (
        ids.join(lv, "lid")
        .join(rv, "rid")
        .select(
            "lid",
            "rid",
            rnd(_cos_arrow(F.col("lv"), F.col("rv")), ROUND).alias("cos"),
        )
    )
    w = Window.partitionBy("lid").orderBy(F.desc("cos"), F.asc("rid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("lid", "rid", "cos", "rank")
    )
