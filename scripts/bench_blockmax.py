"""Block-max vs exact disjunctive kernel at a 1M-turn index.

Measures the round-4 change: ``algo="auto"`` now runs
``kernels.blockmax_topk`` (vectorized block-level pruning) instead of
``exact_topk`` (score every decoded posting).  Both are lossless — the
bench asserts row-identical results per query — so the ONLY question is
speed, on the same axis BASELINE.md's "WAND vs vectorized exact" table
used: the 30 reference queries plus a head-term subset where skipping
matters most (head terms have ~110k postings per group at 1M turns).

    SPARK_GRAFT_CPUS=32 python scripts/bench_blockmax.py [--scale lg]

Reuses the built index across runs via a scale-keyed /tmp dir.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="lg")
    ap.add_argument("--keep", action="store_true", default=True)
    args = ap.parse_args()

    from search_engine_spark.corpus import (
        REFERENCE_QUERIES,
        SCALES,
        write_transcripts_parquet,
    )
    from search_engine_spark.index.build import build_index
    from search_engine_spark.index.reader import CompressedIndex
    from search_engine_spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench_blockmax", cores=cores)

    root = f"/tmp/sgs_blockmax_{args.scale}"
    idx_dir = os.path.join(root, "idx")
    if not os.path.exists(os.path.join(idx_dir, "meta.json")):
        os.makedirs(root, exist_ok=True)
        pq = write_transcripts_parquet(os.path.join(root, "corpus.parquet"), args.scale)
        t0 = time.time()
        build_index(spark, spark.read.parquet(pq), idx_dir)
        print(f"build[{args.scale}]: {time.time() - t0:.1f}s", file=sys.stderr)
    idx = CompressedIndex(spark, idx_dir)
    idx.warm()

    disj = [q for q in REFERENCE_QUERIES if q["mode"] == "disjunctive"]
    # head-term subset: top-of-Zipf synth terms — the block-skipping case
    head = [
        {"query_text": "term0000", "mode": "disjunctive", "k": 10},
        {"query_text": "term0000 term0001", "mode": "disjunctive", "k": 10},
        {"query_text": "term0000 term0001 term0002 term0003", "mode": "disjunctive", "k": 10},
        {"query_text": "term0004 term4498", "mode": "disjunctive", "k": 10},  # head+rare
        {"query_text": "water government people", "mode": "disjunctive", "k": 10},
    ]

    def run(queries: list[dict], algo: str) -> tuple[float, dict[str, float], dict]:
        per: dict[str, float] = {}
        rows: dict[str, list] = {}
        for q in queries:
            t0 = time.time()
            out = idx.topk(q["query_text"], q["mode"], q.get("k", 10), algo=algo).collect()
            per[q["query_text"]] = round(time.time() - t0, 3)
            rows[q["query_text"]] = [(r.conv_id, r.turn_idx, round(r.score, 9)) for r in out]
        return round(sum(per.values()), 2), per, rows

    # warm both code paths once (Arrow serialization, scan cache)
    run(head[:2], "exact")
    run(head[:2], "auto")

    result: dict = {"scale": args.scale, "cores": cores}
    baseline_rows: dict[str, dict] = {}
    for algo in ("exact", "auto"):
        tot_all, per_all, rows_all = run(disj, algo)
        tot_head, per_head, rows_head = run(head, algo)
        result[algo] = {
            "all_disjunctive_sec": tot_all,
            "head_sec": tot_head,
            "per_query_head": per_head,
        }
        baseline_rows[algo] = {**rows_all, **rows_head}
        print(f"{algo}: 26 disjunctive={tot_all}s head-subset={tot_head}s", file=sys.stderr)

    # losslessness on the measured runs themselves
    mismatch = [
        q for q in baseline_rows["exact"]
        if baseline_rows["exact"][q] != baseline_rows["auto"][q]
    ]
    result["row_identical"] = not mismatch
    if mismatch:
        print(f"MISMATCH on: {mismatch}", file=sys.stderr)
    result["head_speedup"] = round(
        result["exact"]["head_sec"] / max(result["auto"]["head_sec"], 1e-9), 2
    )
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
