"""Cost evidence for the round-5 operators at a 1M-turn index.

Each new operator's scale story, quantified at lg (1M turns, 20k convs):

* function_score — matches_scored (the recency cost class: one grouped
  kernel pass over the query terms' postings) + a referenced-fields-only
  metadata join + scalar JVM expressions; probe vs the plain topk and
  the recency twin on the same head-term query.
* rare_terms — the significant_terms foreground class (tokenize ONLY
  the matched turns); probe vs significant_terms on the same query.
* multi_terms / top_metrics_by — one hash aggregation over the match-set
  semi-join (the facet_counts cost class).
* date_histogram_buckets — the date_histogram_pipeline class (one
  distributed histogram + O(buckets) local stages).
* html_clean — the char filter at scan speed: full-corpus cleaned-text
  aggregation (length sum) vs the same aggregation on raw text — the
  delta is the regexp chain's cost per 1M turns.

Run:  SPARK_GRAFT_CPUS=32 python scripts/r5_ops_probe.py [scale]
Emits one JSON line; recorded in R5_OPS_PROBE.json and BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from search_engine_spark.config import BuildConfig
from search_engine_spark.corpus import generate_transcripts
from search_engine_spark.index.build import build_index
from search_engine_spark.index.reader import CompressedIndex
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
    spark = get_spark(app_name="r5-ops-probe", cores=cores)
    d = tempfile.mkdtemp(prefix="sgs_r5_probe_")
    out: dict = {"scale": scale, "cores": cores}
    try:
        pdf = generate_transcripts(scale)
        df = spark.createDataFrame(pdf).cache()
        df.count()
        t0 = time.time()
        build_index(spark, df, os.path.join(d, "idx"), BuildConfig())
        out["build_s"] = round(time.time() - t0, 1)
        out["n_turns"] = len(pdf)
        idx = CompressedIndex(spark, os.path.join(d, "idx"))
        idx.warm()

        q = "term0000 term0001"  # the two heaviest head terms

        from search_engine_spark.operators.function_score import (
            function_score_topk,
        )
        from search_engine_spark.operators.recency import recency_topk
        from search_engine_spark.pipeline.aggs import multi_terms, top_metrics_by
        from search_engine_spark.pipeline.histogram import (
            date_histogram_buckets,
            date_histogram_pipeline,
        )
        from search_engine_spark.pipeline.significant import (
            rare_terms,
            significant_terms,
        )
        from search_engine_spark.textproc.htmlclean import clean_html_col

        out["topk_baseline_s"] = timed(
            lambda: idx.topk(q, "disjunctive", 10).collect()
        )
        fns = [
            {"kind": "field_value_factor", "field": "turn_idx",
             "factor": 0.5, "modifier": "log1p"},
            {"kind": "random_score", "seed": "probe"},
        ]
        out["function_score_s"] = timed(
            lambda: function_score_topk(idx, df, q, fns, k=10).collect()
        )
        out["recency_twin_s"] = timed(
            lambda: recency_topk(
                idx, df, q, "2026-01-01 00:00:00", 86400.0, k=10
            ).collect()
        )
        out["significant_terms_s"] = timed(
            lambda: significant_terms(idx, df, q, n=10).collect()
        )
        out["rare_terms_s"] = timed(
            lambda: rare_terms(idx, df, q, max_doc_count=2, limit=20).collect()
        )
        out["multi_terms_s"] = timed(
            lambda: multi_terms(idx, df, q, ("role", "tool"), 10).collect()
        )
        out["top_metrics_s"] = timed(
            lambda: top_metrics_by(idx, df, q, "role", "ts", "turn_idx").collect()
        )
        out["histogram_pipeline_twin_s"] = timed(
            lambda: date_histogram_pipeline(
                idx, df, q, interval="hour", min_doc_count=0
            ).collect()
        )
        out["histogram_buckets_s"] = timed(
            lambda: date_histogram_buckets(
                idx, df, q, interval="hour", lag=2, min_n=1,
                sort="n", descending=True, limit=24, min_doc_count=0,
            ).collect()
        )

        # html_clean at scan speed: corpus-wide length aggregation with
        # and without the regexp chain — the delta is the filter's cost.
        wrapped = df.withColumn(
            "html",
            F.concat(
                F.lit("<html><body><p>"), F.col("text"),
                F.lit("</p><script>x()</script></body></html>"),
            ),
        ).cache()
        wrapped.count()
        out["raw_len_agg_s"] = timed(
            lambda: wrapped.agg(F.sum(F.length("html"))).collect()
        )
        out["html_clean_len_agg_s"] = timed(
            lambda: wrapped.agg(
                F.sum(F.length(clean_html_col("html")))
            ).collect()
        )
        wrapped.unpersist()
        out["load1"] = os.getloadavg()[0]
        print(json.dumps(out))
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "R5_OPS_PROBE.json"), "w") as f:
            json.dump(out, f, indent=2)
    finally:
        shutil.rmtree(d, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
