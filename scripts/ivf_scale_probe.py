"""1M-vector scale probe for the trained-quantizer IVF path (round 4).

Evidence that the distributed k-means + IVF index design holds off the
toy scale, mirroring scale_probe.py's near-dup probe:

  * ``kmeans_train`` (k=256, 3 Lloyd rounds) over 1M×64 deterministic
    vectors — per-round cost is one corpus scan emitting k·dim partial
    sums, so train wall should be ~rounds × scan, never corpus-shuffle;
  * assignment + cell-partitioned ids-only index write, with the cell
    population distribution (max / p99) — the probe cost bound is
    ``nprobe × max_cell`` candidates;
  * ``ivf_index_topk`` probe latency at nprobe ∈ {8, 16, 32} and recall@10
    vs the exact brute-force scan for sampled queries;
  * LSM freshness off-toy: ``extend_ivf_index`` of a 10k delta (must be
    O(delta)), ``ivf_multi_topk`` over base+delta, ``ivf_drift_stats``.

Writes IVF_SCALE_PROBE.json; numbers land in BASELINE.md.

Usage: python scripts/ivf_scale_probe.py [--rows 1000000] [--cores 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DIM = 64
K = 256
ITERS = 3
NPROBES = (8, 16, 32)
N_QUERIES = 5


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--cores", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from scale_probe import gen_embeddings
    from search_engine_spark.pipeline import kmeans, similarity
    from search_engine_spark.session import get_spark

    spark = get_spark(
        app_name="ivf_probe", cores=args.cores, shuffle_partitions=args.cores * 4
    )
    base = tempfile.mkdtemp(prefix="sgs_ivf_probe_")
    out: dict = {
        "rows": args.rows, "dim": DIM, "k": K, "iterations": ITERS,
        "cores": args.cores,
        "load1_start": round(os.getloadavg()[0], 2),
    }

    t0 = time.time()
    emb_path = os.path.join(base, "emb")
    gen_embeddings(spark, args.rows, args.cores * 4).write.parquet(emb_path)
    emb = spark.read.parquet(emb_path).cache()
    emb.count()
    out["gen_seconds"] = round(time.time() - t0, 1)

    # -- train -----------------------------------------------------------
    t0 = time.time()
    cent = kmeans.kmeans_train(emb, DIM, K, iterations=ITERS)
    out["train_seconds"] = round(time.time() - t0, 1)
    out["train_seconds_per_round"] = round(out["train_seconds"] / ITERS, 1)

    # -- assign + write the cell-partitioned index ------------------------
    idx = os.path.join(base, "ivf")
    t0 = time.time()
    kmeans.write_ivf_assignments(emb, idx, cent)
    out["index_write_seconds"] = round(time.time() - t0, 1)
    sizes = (
        spark.read.parquet(idx).groupBy("cell").count()
        .agg(
            F.max("count").alias("mx"),
            F.expr("percentile_approx(count, 0.99)").alias("p99"),
            F.count("*").alias("cells"),
        )
        .collect()[0]
    )
    out["cell_max"] = int(sizes["mx"])
    out["cell_p99"] = int(sizes["p99"])
    out["cells_nonempty"] = int(sizes["cells"])

    # -- probe latency + recall vs brute force ----------------------------
    qids = sorted(
        {int(args.rows * f) or 7 for f in (0.000007, 0.123457, 0.4, 0.65, 0.999)}
    )[:N_QUERIES]
    qvecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    }
    brute = {}
    t0 = time.time()
    for qid in qids:
        brute[qid] = [
            r["vec_id"] for r in similarity.cosine_topk(emb, qvecs[qid], 10).collect()
        ]
    out["brute_force_seconds_per_query"] = round((time.time() - t0) / len(qids), 2)
    for nprobe in NPROBES:
        lat, hits = [], 0
        for qid in qids:
            t1 = time.time()
            got = [
                r["vec_id"]
                for r in kmeans.ivf_index_topk(
                    spark, idx, emb, qvecs[qid], k=10, nprobe=nprobe
                ).collect()
            ]
            lat.append(time.time() - t1)
            hits += len(set(got) & set(brute[qid]))
        out[f"probe_nprobe{nprobe}_seconds_per_query"] = round(
            sum(lat) / len(lat), 2
        )
        out[f"recall_at_10_nprobe{nprobe}"] = round(hits / (10 * len(qids)), 3)

    # -- LSM freshness off-toy --------------------------------------------
    # materialize the delta FIRST: gen_embeddings is lazy and the filter
    # sits above the generator, so timing the un-materialized plan would
    # charge a full O(rows) regeneration to every "O(delta)" number below
    delta_path = os.path.join(base, "delta")
    gen_embeddings(spark, args.rows + 10_000, args.cores).filter(
        F.col("vec_id") >= args.rows
    ).coalesce(4).write.parquet(delta_path)
    delta = spark.read.parquet(delta_path)
    seg = os.path.join(base, "seg")
    t0 = time.time()
    kmeans.extend_ivf_index(spark, idx, delta, seg)
    out["extend_10k_seconds"] = round(time.time() - t0, 1)
    both = emb.unionByName(delta)
    t0 = time.time()
    kmeans.ivf_multi_topk(spark, [idx, seg], both, qvecs[qids[0]], k=10, nprobe=8).collect()
    out["multi_probe_seconds"] = round(time.time() - t0, 2)
    t0 = time.time()
    drift = {
        r["seg"]: (r["n"], r["mean_cos"])
        for r in kmeans.ivf_drift_stats(spark, [idx, seg], both).collect()
    }
    out["drift_stats_seconds"] = round(time.time() - t0, 1)
    out["drift_mean_cos"] = {str(s): v[1] for s, v in drift.items()}
    out["load1_end"] = round(os.getloadavg()[0], 2)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "IVF_SCALE_PROBE.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
