"""Sloppy-phrase cost at a 1M-turn index: slop vs exact, off the toy scale.

The slop path (`kernels._sloppy_phrase_candidates`) replaces the exact
path's sorted-key intersections with one `searchsorted` per term over
the SAME gathered position arrays, so its cost class is identical —
bounded by the candidate docs' position counts, independent of the slop
value.  This probe evidences that on the lg corpus (1M turns, Zipf head
terms ≈ 110k postings/group): the head-term pair phrase at slop
0/1/2/4/16 should cost within noise of each other and of the exact
(slop-0 fast-path) query, while matching progressively more docs.

Run:  SPARK_GRAFT_CPUS=32 python scripts/slop_probe.py [scale]
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
from search_engine_spark.session import get_spark

PAIR = "term0000 term0001"  # the two heaviest head terms
SLOPS = (0, 1, 2, 4, 16)


def main() -> None:
    scale = sys.argv[1] if len(sys.argv) > 1 else "lg"
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="slop-probe", cores=cores)
    d = tempfile.mkdtemp(prefix="sgs_slop_probe_")
    pdf = generate_transcripts(scale)
    df = spark.createDataFrame(pdf[["conv_id", "turn_idx", "text"]])
    t0 = time.time()
    build_index(spark, df, os.path.join(d, "idx"), BuildConfig())
    build_s = time.time() - t0
    idx = CompressedIndex(spark, os.path.join(d, "idx"))

    out = {"scale": scale, "n_turns": len(pdf), "cores": cores,
           "build_s": round(build_s, 1), "pair": PAIR, "runs": {}}
    for slop in SLOPS:
        q = f'"{PAIR}"' + (f"~{slop}" if slop else "")
        # run 1 = scan-cache cold for this term set, runs 2-3 steady state
        times, matches = [], None
        for _ in range(3):
            t0 = time.time()
            matches = idx.match_count(q, "phrase")
            times.append(round(time.time() - t0, 3))
        out["runs"][f"slop{slop}"] = {"matches": matches, "seconds": times}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
