"""Attribute the round-3 ann_index_build bench delta (5.30 -> 9.32 s).

Round 3 changed write_ann_index three ways at once: (a) a
repartition("table","bucket") before the partitioned write (the
small-files fix), (b) ids-only rows (the vectors left the index), and
(c) a _meta sidecar job.  This script times the four shapes at the
bench's sf and prints one JSON line so BASELINE.md can carry the
attribution.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/bench_ann_build.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from search_engine_spark.pipeline import similarity
from search_engine_spark.session import get_spark

DIM, BITS, TABLES, SEED = 64, 4, 16, 42


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench_ann_build", cores=cores)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).cache()
    n = emb.count()  # materialize the cache so every shape reads warm input

    root = "/tmp/sgs_annbuild"
    shutil.rmtree(root, ignore_errors=True)

    def timed(name, fn, reps=3):
        best = float("inf")
        for i in range(reps):
            path = os.path.join(root, f"{name}_{i}")
            t0 = time.time()
            fn(path)
            best = min(best, time.time() - t0)
        files = sum(len(fs) for _, _, fs in os.walk(os.path.join(root, f"{name}_0")))
        return round(best, 2), files

    def r2_shape(path):  # vectors in the index, no repartition, no meta
        sigs = similarity.lsh_signatures(emb, DIM, BITS, TABLES, SEED)
        sigs.join(emb, "vec_id").write.mode("overwrite").partitionBy(
            "table", "bucket"
        ).parquet(path)

    def ids_no_repart(path):
        sigs = similarity.lsh_signatures(emb, DIM, BITS, TABLES, SEED)
        sigs.write.mode("overwrite").partitionBy("table", "bucket").parquet(path)

    def ids_repart_no_meta(path):
        sigs = similarity.lsh_signatures(emb, DIM, BITS, TABLES, SEED)
        sigs.repartition("table", "bucket").write.mode("overwrite").partitionBy(
            "table", "bucket"
        ).parquet(path)

    def r3_full(path):
        similarity.write_ann_index(emb, path, DIM, BITS, TABLES, SEED)

    out = {"sf_dir": sf_dir, "cores": cores, "rows": n}
    for name, fn in (
        ("r2_vectors_no_repart", r2_shape),
        ("ids_no_repart", ids_no_repart),
        ("ids_repart", ids_repart_no_meta),
        ("r3_full_with_meta", r3_full),
    ):
        sec, files = timed(name, fn)
        out[name] = {"sec": sec, "files": files}
        print(f"{name:24s} {sec:6.2f}s  {files} files", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
