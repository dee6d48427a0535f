"""Scoped-search cost vs filter selectivity at the 1M-turn index.

The claim under measurement: a scoped query costs the unscoped query
plus the allow side — one column-pruned metadata scan with the
predicate pushed, a thin convs join, and a shuffle of ONLY the doc ids
that pass the predicate.  So scoped cost should track selectivity:
a ~25% filter (one of four roles) pays a visible allow-shuffle, a ~1%
ts window pays almost nothing over unscoped, and facet counting is
bounded by the match set, not the corpus.

    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SCOPED_SCALE=lg python scripts/bench_scoped.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from search_engine_spark.corpus import generate_transcripts, write_transcripts_parquet
from search_engine_spark.index.build import build_index
from search_engine_spark.index.reader import CompressedIndex
from search_engine_spark.session import get_spark

QUERY = "term0001 term0002"


def main() -> None:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scale = os.environ.get("SPARK_GRAFT_SCOPED_SCALE", "lg")
    spark = get_spark(app_name="bench_scoped", cores=cores)
    d = tempfile.mkdtemp(prefix="sgs_bscope_")
    out: dict = {"scale": scale, "cores": cores, "query": QUERY}
    try:
        pdf = generate_transcripts(scale)
        n = len(pdf)
        out["n_turns"] = n
        pq = os.path.join(d, "t.parquet")
        write_transcripts_parquet(pq, scale)
        tr = spark.read.parquet(pq)

        t0 = time.time()
        build_index(spark, tr, os.path.join(d, "idx"))
        out["build_s"] = round(time.time() - t0, 2)
        idx = CompressedIndex(spark, os.path.join(d, "idx"))
        idx.warm()
        # warm the query path itself so scoped-vs-unscoped deltas are not
        # first-job warm-up noise
        idx.topk(QUERY, "disjunctive", 10).collect()

        def timed(tag: str, scope, sel: float | None) -> None:
            t0 = time.time()
            rows = idx.topk(QUERY, "disjunctive", 10, scope=scope).collect()
            out[tag] = {
                "seconds": round(time.time() - t0, 3),
                "rows": len(rows),
                **({"selectivity": sel} if sel is not None else {}),
            }

        timed("unscoped", None, None)

        role = tr.filter("role = 'user'")
        timed("scoped_role_25pct", role, round(role.count() / n, 4))

        lo, hi = pdf.ts.quantile(0.50), pdf.ts.quantile(0.51)
        window = tr.filter(
            (tr.ts >= str(lo)) & (tr.ts < str(hi))
        )
        timed("scoped_ts_1pct", window, round(window.count() / n, 4))

        one_conv = tr.filter(tr.conv_id == pdf.conv_id.iloc[0])
        timed("scoped_one_conv", one_conv, round(one_conv.count() / n, 6))

        t0 = time.time()
        fc = idx.facet_counts(QUERY, tr, "role").collect()
        out["facet_counts"] = {
            "seconds": round(time.time() - t0, 3),
            "n_matches": int(sum(r["n"] for r in fc)),
        }

        t0 = time.time()
        exp = idx.expand_prefixes("term000*")
        out["prefix_expand"] = {
            "seconds": round(time.time() - t0, 3),
            "n_terms": len(exp.split()),
        }

        out["load_1_5_15"] = [round(x, 2) for x in os.getloadavg()]
        print(json.dumps(out))
    finally:
        shutil.rmtree(d, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
