"""1M-vector scale probe for the near-dup / cluster-resolution path.

Evidence (VERDICT r2 item 7) that the LSH bucket bounds and the
pointer-doubled label-propagation round count hold off the toy scale:
generates a DETERMINISTIC 1M×64 embedding corpus with planted near-dup
chains, then measures

  * the persisted ids-only ANN index build (ANN-probe configuration:
    coarse bits=8 buckets → 2048 parquet partitions, the partition-
    pruned-probe layout) and its bucket-size distribution — the per-
    query probe cost bound is ``tables × max_bucket`` candidates;
  * ``cosine_near_dup_pairs`` under the near-dup configuration
    (bits=20: fine buckets bound the collision-join candidate count;
    near-dup reads EVERY cell, so partition pruning is irrelevant and
    the signatures stay in-flight) — wall time, candidate bucket
    stats, verified-pair count, planted-pair recall;
  * ``connected_components`` over the verified pair graph — wall time
    and the observed round count (O(log diameter) claim).

Writes SCALE_PROBE.json; the numbers land in BASELINE.md.

The synthetic corpus: counter-based gaussians (Philox keyed by vec_id —
order- and partitioning-independent), L2-normalized; rows with
vec_id % 50 ∈ {1, 2} copy the vector of the chain base (vec_id - mod)
plus 1% noise → rows//50 planted clusters of size 3 (triangles at
cosine ≈ 0.9999), the rest singletons.  Random-pair cosine ≈ 0 at
dim 64, so the planted pairs dominate collisions at bits=20.

Usage: python scripts/scale_probe.py [--rows 1000000] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
ANN_BITS = 8  # probe-index configuration (coarse cells, pruned reads)
NEARDUP_BITS = 20  # near-dup configuration (fine cells bound the join)
TABLES = 8
SEED = 42
THRESHOLD = 0.9


def gen_embeddings(spark, rows: int, parts: int):
    """Deterministic (vec_id, embedding) — counter-based RNG, so the
    result is independent of partitioning and task order."""

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = np.empty((len(ids), DIM), dtype=np.float64)
            for j, i in enumerate(ids):
                base = int(i) - int(i) % 50 if int(i) % 50 in (1, 2) else int(i)
                rng = np.random.Generator(np.random.Philox(key=SEED, counter=base))
                v = rng.standard_normal(DIM)
                if base != int(i):
                    nrng = np.random.Generator(
                        np.random.Philox(key=SEED + 1, counter=int(i))
                    )
                    v = v + 0.01 * nrng.standard_normal(DIM)
                out[j] = v / np.linalg.norm(v)
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(out.astype(np.float32))}
            )

    return (
        spark.range(0, rows, numPartitions=parts)
        .mapInPandas(kernel, schema="vec_id long, embedding array<float>")
    )


def bucket_stats(sigs):
    from pyspark.sql import functions as F

    row = (
        sigs.groupBy("table", "bucket").count()
        .agg(
            F.max("count").alias("mx"),
            F.expr("percentile_approx(count, 0.99)").alias("p99"),
            F.count("*").alias("n"),
        )
        .collect()[0]
    )
    return int(row["mx"]), int(row["p99"]), int(row["n"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from search_engine_spark.pipeline import similarity
    from search_engine_spark.pipeline.graph import connected_components
    from search_engine_spark.session import get_spark

    spark = get_spark(app_name="scale_probe", cores=args.cores,
                      shuffle_partitions=args.cores * 4)
    base = tempfile.mkdtemp(prefix="sgs_probe_")
    out: dict = {"rows": args.rows, "dim": DIM, "tables": TABLES,
                 "threshold": THRESHOLD, "cores": args.cores}

    t0 = time.time()
    emb_path = os.path.join(base, "emb")
    gen_embeddings(spark, args.rows, args.cores * 4).write.parquet(emb_path)
    emb = spark.read.parquet(emb_path)
    out["gen_seconds"] = round(time.time() - t0, 1)

    # ---- persisted ids-only ANN index (probe layout) -----------------
    t0 = time.time()
    idx_path = os.path.join(base, "ann")
    similarity.write_ann_index(emb, idx_path, DIM, ANN_BITS, TABLES, SEED)
    out["ann_index_build_seconds"] = round(time.time() - t0, 1)
    sigs_ann, _ = similarity.read_ann_index(spark, idx_path, dim=DIM,
                                            bits=ANN_BITS, tables=TABLES)
    mx, p99, n = bucket_stats(sigs_ann)
    out["ann_bits"] = ANN_BITS
    out["ann_max_bucket"] = mx
    out["ann_p99_bucket"] = p99
    out["ann_nonempty_buckets"] = n
    # per-query exact-rerank bound under this layout
    out["ann_probe_candidate_bound"] = TABLES * mx

    # ---- near-dup pairs (fine-bucket collision join) -----------------
    t0 = time.time()
    sigs_nd = similarity.lsh_signatures(emb, DIM, NEARDUP_BITS, TABLES, SEED)
    sigs_nd_path = os.path.join(base, "sigs_nd")
    sigs_nd.write.parquet(sigs_nd_path)  # sign the corpus ONCE
    sigs_nd = spark.read.parquet(sigs_nd_path)
    out["neardup_sign_seconds"] = round(time.time() - t0, 1)
    mx, p99, n = bucket_stats(sigs_nd)
    out["neardup_bits"] = NEARDUP_BITS
    out["neardup_max_bucket"] = mx
    out["neardup_p99_bucket"] = p99
    out["neardup_nonempty_buckets"] = n

    t0 = time.time()
    pairs_path = os.path.join(base, "pairs")
    similarity.cosine_near_dup_pairs(
        emb, dim=DIM, threshold=THRESHOLD, signatures=sigs_nd,
    ).write.parquet(pairs_path)
    pairs = spark.read.parquet(pairs_path)
    n_pairs = pairs.count()
    out["near_dup_seconds"] = round(time.time() - t0, 1)
    out["near_dup_pairs"] = int(n_pairs)
    # planted truth: each chain base b pairs (b,b+1), (b,b+2), (b+1,b+2)
    out["planted_pairs"] = 3 * (args.rows // 50)
    found_planted = pairs.filter(
        (F.col("vec_b") - F.col("vec_a") <= 2)
        & (F.col("vec_a") % 50).isin(0, 1)
    ).count()
    out["pair_recall"] = round(found_planted / out["planted_pairs"], 4)

    # ---- cluster resolution ------------------------------------------
    t0 = time.time()
    stats: dict = {}
    cc = connected_components(
        emb.select(F.col("vec_id").alias("node")),
        pairs.select(F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")),
        stats=stats,
    )
    sizes = cc.groupBy("comp").count()
    agg = sizes.agg(
        F.count("*").alias("n_components"),
        F.max("count").alias("max_component"),
        F.sum((F.col("count") > 1).cast("long")).alias("nontrivial"),
    ).collect()[0]
    out["cc_seconds"] = round(time.time() - t0, 1)
    out["cc_rounds"] = stats.get("rounds")
    out["n_components"] = int(agg["n_components"])
    out["max_component"] = int(agg["max_component"])
    out["nontrivial_components"] = int(agg["nontrivial"])

    spark.stop()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "SCALE_PROBE.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
