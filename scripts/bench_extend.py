"""Incremental-extend efficiency: extend(base, delta) vs full rebuild.

Builds a base corpus, appends a smaller delta of NEW conversations, and
times three jobs on the same (warmed) session:

  base build  |  full rebuild (base ∪ delta)  |  extend (base index + delta)

Scales come from SPARK_GRAFT_EXTEND_BASE / _DELTA (corpus scale names,
default md/sm).

The claim under measurement: extend cost is O(delta tokenize + index
bytes), so as corpus/delta grows the ratio extend/full tends to the
index-merge fraction of a build, not 1.0.  Run:

    SPARK_GRAFT_CPUS=32 python scripts/bench_extend.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from search_engine_spark.corpus import generate_transcripts
from search_engine_spark.index.build import build_index, load_meta
from search_engine_spark.index.extend import extend_index
from search_engine_spark.session import get_spark


def main() -> None:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    base_scale = os.environ.get("SPARK_GRAFT_EXTEND_BASE", "md")
    delta_scale = os.environ.get("SPARK_GRAFT_EXTEND_DELTA", "sm")
    spark = get_spark(app_name="bench_extend", cores=cores)
    d = tempfile.mkdtemp(prefix="sgs_bext_")
    try:
        # warm-up: JVM/codegen/Arrow paths, so the three timed jobs
        # compare build strategies rather than first-job warm-up cost
        warm = spark.createDataFrame(
            generate_transcripts("xs")[["conv_id", "turn_idx", "text"]]
        )
        build_index(spark, warm, f"{d}/warm")

        base_pdf = generate_transcripts(base_scale)[["conv_id", "turn_idx", "text"]]
        delta_pdf = generate_transcripts(delta_scale, seed=7)[
            ["conv_id", "turn_idx", "text"]
        ]
        # delta = NEW conversations sorting after every md conv id
        delta_pdf = delta_pdf.assign(
            conv_id="conv-" + (delta_pdf.conv_id.str.slice(5).astype(int) + 900000)
            .astype(str).str.zfill(6)
        )
        base = spark.createDataFrame(base_pdf)
        delta = spark.createDataFrame(delta_pdf)
        full = spark.createDataFrame(
            __import__("pandas").concat([base_pdf, delta_pdf], ignore_index=True)
        )

        t0 = time.time()
        build_index(spark, base, f"{d}/base")
        t_base = time.time() - t0

        t0 = time.time()
        build_index(spark, full, f"{d}/full")
        t_full = time.time() - t0

        t0 = time.time()
        extend_index(spark, f"{d}/base", delta, f"{d}/ext")
        t_extend = time.time() - t0

        meta = load_meta(f"{d}/ext")
        assert meta["n_docs"] == load_meta(f"{d}/full")["n_docs"]
        print(
            json.dumps(
                {
                    "metric": "extend_vs_rebuild",
                    "cores": cores,
                    "base_turns": len(base_pdf),
                    "delta_turns": len(delta_pdf),
                    "base_build_s": round(t_base, 2),
                    "full_rebuild_s": round(t_full, 2),
                    "extend_s": round(t_extend, 2),
                    "extend_over_rebuild": round(t_extend / t_full, 3),
                    "order_isomorphic": meta["docid_order_isomorphic"],
                }
            )
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
