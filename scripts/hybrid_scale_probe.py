"""Hybrid-retrieval cost at a 1M-turn corpus: the three legs off the toy scale.

Evidences the module docstring's scale claims (pipeline/hybrid.py):

1. ``hash_embed`` is one shuffle-free mapInPandas pass — embedding
   throughput (turns/s) should be the same order as build tokenization,
   since the added work per token is a memoized dict lookup.
2. ``semantic_topk`` (brute-force cosine, the exact baseline) is a
   narrow scan + TakeOrderedAndProject over the persisted embedding
   table — seconds at 1M×64, and the LSH/IVF indexes are the documented
   drop-in when that scan is too big.
3. Fusion overhead ≈ 0: ``hybrid_topk`` wall ≈ lexical ``topk`` wall +
   semantic leg wall, because RRF touches only the two top-`depth`
   lists.

Run:  SPARK_GRAFT_CPUS=32 python scripts/hybrid_scale_probe.py [scale]
Emits one JSON line; results recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from search_engine_spark.config import BuildConfig
from search_engine_spark.corpus import generate_transcripts
from search_engine_spark.index.build import build_index
from search_engine_spark.index.reader import CompressedIndex
from search_engine_spark.pipeline.hybrid import (
    embed_query,
    hash_embed,
    hybrid_topk,
    quantize_embeddings,
    quantized_semantic_topk,
    semantic_topk,
)
from search_engine_spark.session import get_spark

QUERY = "term0000 term0001"  # Zipf head pair — worst-case lexical leg
DIM = 64


def main() -> None:
    scale = sys.argv[1] if len(sys.argv) > 1 else "lg"
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="hybrid-probe", cores=cores)
    d = tempfile.mkdtemp(prefix="sgs_hybrid_probe_")
    pdf = generate_transcripts(scale)
    df = spark.createDataFrame(pdf[["conv_id", "turn_idx", "text"]])
    df.write.parquet(os.path.join(d, "tr.parquet"))
    tr = spark.read.parquet(os.path.join(d, "tr.parquet"))

    t0 = time.time()
    build_index(spark, tr, os.path.join(d, "idx"), BuildConfig())
    build_s = time.time() - t0
    idx = CompressedIndex(spark, os.path.join(d, "idx"))
    idx.warm()

    # leg 1: embed the whole corpus once (the build-time artifact)
    t0 = time.time()
    hash_embed(tr, DIM).write.parquet(os.path.join(d, "emb.parquet"))
    embed_s = time.time() - t0
    emb = spark.read.parquet(os.path.join(d, "emb.parquet"))

    out = {
        "scale": scale,
        "n_turns": len(pdf),
        "cores": cores,
        "dim": DIM,
        "build_s": round(build_s, 1),
        "embed_s": round(embed_s, 1),
        "embed_turns_per_s": round(len(pdf) / embed_s, 1),
        "query": QUERY,
    }
    # storage tier: the int8 quantized table (8× smaller per dim)
    t0 = time.time()
    quantize_embeddings(emb).write.parquet(os.path.join(d, "qemb.parquet"))
    out["quantize_s"] = round(time.time() - t0, 1)
    qemb = spark.read.parquet(os.path.join(d, "qemb.parquet"))

    def du(p):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _dirs, fs in os.walk(p) for f in fs
        )

    out["emb_bytes"] = du(os.path.join(d, "emb.parquet"))
    out["qemb_bytes"] = du(os.path.join(d, "qemb.parquet"))

    # legs 2+3, three runs each (run 1 cold):
    qv = embed_query(QUERY, DIM)
    for name, fn in [
        ("lexical_topk", lambda: idx.topk(QUERY, "disjunctive", 10).collect()),
        ("semantic_topk", lambda: semantic_topk(emb, qv, 50).collect()),
        (
            "semantic_quantized",
            lambda: quantized_semantic_topk(qemb, qv, 50, rerank_with=emb).collect(),
        ),
        (
            "hybrid_rrf",
            lambda: hybrid_topk(idx, emb, QUERY, k=10, depth=50, dim=DIM).collect(),
        ),
    ]:
        times = []
        for _ in range(3):
            t0 = time.time()
            fn()
            times.append(round(time.time() - t0, 3))
        out[name] = times
    # fusion overhead: hybrid steady-state minus the two legs' steady-state
    out["fusion_overhead_s"] = round(
        min(out["hybrid_rrf"]) - min(out["lexical_topk"]) - min(out["semantic_topk"]), 3
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
