"""Aggregation cost at a 1M-turn index: does it track the match set?

The three match-set aggregations (significant_terms, date_histogram,
top_hits_by) all claim the same scale shape: cost bounded by the MATCH
SET (its kernels + tokenize/join over matched turns only), never the
corpus.  This probe runs each on the lg corpus (1M turns) for a
SELECTIVE query (~3.7k matches: two-term conjunctive) and a HEAD query
(~480k matches: the heaviest term), twice each (run 1 scan-cache cold).
Expected: the selective query costs a small constant (job overhead +
tiny match set); the head query grows with its match set, not with the
corpus; and date_histogram (no tokenize) < significant_terms (one Arrow
tokenize pass over matched text).

Run:  SPARK_GRAFT_CPUS=32 python scripts/agg_probe.py [scale]
Emits one JSON line; results recorded in BASELINE.md (AGG_PROBE.json).
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
from search_engine_spark.pipeline.histogram import date_histogram
from search_engine_spark.pipeline.significant import significant_terms
from search_engine_spark.pipeline.tophits import top_hits_by
from search_engine_spark.session import get_spark

QUERIES = {
    "selective": ("term0040 term0041", "conjunctive"),
    "head": ("term0000", "disjunctive"),
}


def main() -> None:
    scale = sys.argv[1] if len(sys.argv) > 1 else "lg"
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="agg-probe", cores=cores)
    d = tempfile.mkdtemp(prefix="sgs_agg_probe_")
    pdf = generate_transcripts(scale)
    df = spark.createDataFrame(
        pdf[["conv_id", "turn_idx", "role", "text", "ts"]]
    ).cache()
    df.count()
    t0 = time.time()
    build_index(spark, df, os.path.join(d, "idx"), BuildConfig())
    build_s = time.time() - t0
    idx = CompressedIndex(spark, os.path.join(d, "idx"))

    aggs = {
        "significant_terms": lambda q, m: significant_terms(idx, df, q, m, n=10).collect(),
        "date_histogram": lambda q, m: date_histogram(idx, df, q, m, "hour").count(),
        "top_hits_by_role": lambda q, m: top_hits_by(idx, df, q, "role", m, 3).collect(),
    }
    out = {"scale": scale, "n_turns": len(pdf), "cores": cores,
           "build_s": round(build_s, 1), "queries": {}}
    for label, (q, m) in QUERIES.items():
        entry = {"query": q, "mode": m, "matches": idx.match_count(q, m)}
        for name, fn in aggs.items():
            times = []
            for _ in range(2):
                t0 = time.time()
                fn(q, m)
                times.append(round(time.time() - t0, 3))
            entry[name] = times
        out["queries"][label] = entry
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
