"""Cost evidence for the unified query-string (bool) path at a 1M-turn
index — where its cost sits relative to the modes it composes.

The bool kernel (kernels.bool_candidates) runs candidates+exact: it
decodes the doc-id lists of EVERY clause term (must_not included), does
vectorized set algebra, then scores only the surviving candidates.  So
its cost class is the conjunctive/phrase family — decode-bound in the
clause terms' posting sizes, with SCORING bounded by the rarest must
clause — and it cannot use block-max skipping (pruning has no hook for
cross-clause exclusion).  The probe quantifies, at the lg (1M-turn)
index, with the two heaviest head terms:

* the pure-should head pair vs the SAME pair on the default disjunctive
  path (block-max) — the price of composing instead of skipping;
* a rare must clause over the head pair vs its conjunctive-mode twin —
  the bound must-intersection scoring gives;
* must_not and must-phrase composition over head terms;
* a prefix-expansion clause, with the compile (vocabulary-scan) time
  reported separately from the execution time.

Run:  SPARK_GRAFT_CPUS=32 python scripts/qs_scale_probe.py [scale]
Emits one JSON line; results recorded in BASELINE.md and QS_PROBE.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from search_engine_spark.config import BuildConfig
from search_engine_spark.corpus import generate_transcripts
from search_engine_spark.index.build import build_index
from search_engine_spark.index.reader import CompressedIndex
from search_engine_spark.operators.querystring import (
    compile_query_string,
    search_query_string,
)
from search_engine_spark.session import get_spark


def timed(fn, n: int = 2) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    scale = sys.argv[1] if len(sys.argv) > 1 else "lg"
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="qs-probe", cores=cores)
    d = tempfile.mkdtemp(prefix="sgs_qs_probe_")
    out: dict = {"scale": scale, "cores": cores}
    try:
        pdf = generate_transcripts(scale)
        df = spark.createDataFrame(pdf[["conv_id", "turn_idx", "text"]])
        t0 = time.time()
        build_index(spark, df, os.path.join(d, "idx"), BuildConfig())
        out["build_s"] = round(time.time() - t0, 1)
        out["n_turns"] = len(pdf)
        idx = CompressedIndex(spark, os.path.join(d, "idx"))
        idx.warm()

        QS = {
            # pure-should head pair: bool candidates+exact vs block-max
            "qs_should_pair": "term0000 term0001",
            # rare must bounds the scoring set (conjunctive cost twin)
            "qs_must_rare": "+term4000 term0000 term0001",
            "qs_must_not": "term0000 -term0001",
            "qs_phrase_must": '+"term0000 term0001" term0002',
            "qs_expansion": "term400* term0000",
        }
        # warm the per-query caches once (idf lookups, scan metadata)
        idx.topk("term0000 term0001", "disjunctive", 10).collect()
        out["disjunctive_pair_blockmax_s"] = timed(
            lambda: idx.topk("term0000 term0001", "disjunctive", 10).collect()
        )
        out["conjunctive_rare_s"] = timed(
            lambda: idx.topk(
                "term4000 term0000 term0001", "conjunctive", 10
            ).collect()
        )
        for name, qs in QS.items():
            out[f"{name}_s"] = timed(
                lambda q=qs: search_query_string(idx, q, 10).collect()
            )
        # compile (parse + vocabulary expansion) vs execute, separately
        t0 = time.time()
        spec, _f = compile_query_string(idx, QS["qs_expansion"])
        out["qs_expansion_compile_s"] = round(time.time() - t0, 3)
        out["qs_expansion_n_terms"] = len(spec.score_terms)
        print(json.dumps(out))
        with open(
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "QS_PROBE.json",
            ),
            "w",
        ) as f:
            f.write(json.dumps(out) + "\n")
    finally:
        shutil.rmtree(d, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
