#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line on stdout.

Workload:
  1. index build over the deterministic ``md`` transcript corpus
     (100k turns) → build seconds + turns/sec
  2. BM25 query latency: the 30-query reference set against the built
     compressed index (WAND auto) → p50/p95/total
  3. docs-engine + pipeline workload at $SPARK_GRAFT_SF_DIR (default
     /root/testdata/sf0.1): BM25, dedup, similarity, text analysis,
     relational queries from the driver contract

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_SCALE.
"""

from __future__ import annotations

import json
import atexit
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALE = os.environ.get("SPARK_GRAFT_BENCH_SCALE", "md")

# contract entries benched at sf_dir (a representative, fast subset)
CONTRACT_QUERIES = [
    "bm25_topk",
    "bm25_conjunctive",
    "phrase_contains",
    "term_totals",
    "match_count_rank",
    "events_sessionize",
    "events_hourly_agg",
    "pricing_summary",
    "top_customers_by_revenue",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "cosine_topk",
    "knn_join",
    "knn_join_lsh",
    "ann_lsh_topk",
    "token_counts",
    "quality_scores",
    "lang_id",
    "fingerprints",
    "rank_blend",
    "boost_ladder",
    "importance_weighted_topk",
    "dedup_embedding_cosine",
    "ivf_ann_topk",
    "events_sessionize_stateful",
    "events_hourly_agg_stream",
    "transcripts_bm25_batch",
    "dataset_split",
    "source_quota_sample",
    "dedup_clusters",
    "mmr_rerank",
    "phrase_doc_score",
    "pagerank_terms",
    # round 4
    "ann_lsh_topk_segmented",
    "ivf_assign_cells",
    "transcripts_bm25_updated",
    "ivf_ann_topk_segmented",
    "media_decode_stats",
    "ivf_drift_stats",
    "transcripts_bm25_scoped",
    "transcripts_facets",
    "transcripts_prefix",
    "transcripts_fuzzy",
    "transcripts_conversations",
    "transcripts_recency",
    "transcripts_synonyms",
    "transcripts_phrase_slop",
    "transcripts_more_like_this",
    "transcripts_did_you_mean",
    "transcripts_significant_terms",
    "transcripts_date_histogram",
    "transcripts_top_hits_by_role",
    "transcripts_weighted",
    "transcripts_min_should_match",
    "transcripts_search_after",
    "highlight_terms",
    "transcripts_cardinality",
    "transcripts_match_stats",
    "transcripts_extended_stats",
    "transcripts_percentiles",
    "transcripts_stats_by_role",
    "transcripts_histogram",
    "transcripts_range",
    "transcripts_composite",
    "transcripts_explain",
    "transcripts_histogram_pipeline",
    "transcripts_percentile_ranks",
    "transcripts_sort_by_ts",
    "transcripts_percolate",
    "transcripts_rank_eval",
    "transcripts_hybrid_rrf",
    "transcripts_hybrid_linear",
    "transcripts_term_vectors",
    "transcripts_hybrid_scoped",
    "transcripts_hybrid_ann",
    "transcripts_semantic_quantized",
    "transcripts_hybrid_conversations",
    "decontaminate_overlap",
    "repetition_stats",
    "pii_scrub_stats",
    "mixture_sample",
    "pack_sequences",
    "sft_pack_spans",
    "chunk_windows",
    "transcripts_query_string",
    "transcripts_query_string_filtered",
    "transcripts_query_string_batch",
    "transcripts_percolate_qs",
    # round 5
    "html_clean",
    "transcripts_function_score",
    "transcripts_serial_diff",
    "transcripts_rare_terms",
    "transcripts_multi_terms",
    "transcripts_top_metrics",
    "transcripts_bucket_script",
]

# the round-1 workload (BENCH_r01 keys) — its subtotal is reported every
# round as r1_subset_seconds so cross-round regressions are ONE number
R1_SUBSET = [
    "build_index",
    "bm25_query_set",
    "bm25_topk",
    "bm25_conjunctive",
    "phrase_contains",
    "term_totals",
    "match_count_rank",
    "events_sessionize",
    "events_hourly_agg",
    "pricing_summary",
    "top_customers_by_revenue",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "cosine_topk",
    "knn_join",
    "ann_lsh_topk",
    "token_counts",
    "quality_scores",
    "lang_id",
    "fingerprints",
]


def corpus_parquet(scale: str) -> tuple[str, int]:
    from search_engine_spark.corpus import SCALES, write_transcripts_parquet

    spec = SCALES[scale]
    n_turns = spec["n_convs"] * spec["turns_per_conv"]
    path = os.path.join(tempfile.gettempdir(), f"sgs_bench_{scale}.parquet")
    if not os.path.exists(path):
        write_transcripts_parquet(path, scale)
    return path, n_turns


def main() -> None:
    from search_engine_spark import contract
    from search_engine_spark.config import BuildConfig
    from search_engine_spark.corpus import REFERENCE_QUERIES
    from search_engine_spark.index.build import build_index
    from search_engine_spark.index.reader import CompressedIndex
    from search_engine_spark.session import get_spark

    results: dict[str, float] = {}
    t_all = time.time()
    # the shared host's external load swings 2-13 within minutes and moves
    # every number in this file by up to ~1.5x (BASELINE.md "End-to-end
    # bench"); record the weather so cross-round comparisons can see it
    load_start = [round(x, 2) for x in os.getloadavg()]

    spark = get_spark(app_name="bench", cores=CPUS, shuffle_partitions=CPUS)

    # -- 1. index build ------------------------------------------------
    pq, n_turns = corpus_parquet(SCALE)
    _idx_tmp = tempfile.mkdtemp(prefix="sgs_bench_idx_")
    atexit.register(shutil.rmtree, _idx_tmp, ignore_errors=True)
    idx_dir = os.path.join(_idx_tmp, "idx")
    t0 = time.time()
    build_index(spark, spark.read.parquet(pq), idx_dir, BuildConfig(num_groups=8))
    build_s = time.time() - t0
    results["build_index"] = round(build_s, 3)

    # -- 2. BM25 query latency over the reference set ------------------
    index = CompressedIndex(spark, idx_dir)
    index.warm()  # materialize doclen/conv caches (one-time per open)
    lat: list[float] = []
    t0 = time.time()
    for q in REFERENCE_QUERIES:
        t1 = time.time()
        index.topk(q["query_text"], q["mode"], q["k"]).collect()
        lat.append(time.time() - t1)
    results["bm25_query_set"] = round(time.time() - t0, 3)
    # the same 30 queries as ONE batched job (union-pruned postings scan,
    # per-group decode shared across queries, per-query windowed top-k)
    t0 = time.time()
    index.topk_batch(
        [(q["query_text"], q["mode"], q["k"]) for q in REFERENCE_QUERIES]
    ).collect()
    results["bm25_query_set_batch"] = round(time.time() - t0, 3)
    # scoped query + facets at the bench corpus scale: the metadata
    # predicate is pushed to the corpus scan (keys+role only, no text)
    # and cogrouped with the pruned postings (reader.scope_docs)
    tr_meta = spark.read.parquet(pq)
    q0 = REFERENCE_QUERIES[0]
    t0 = time.time()
    index.topk(
        q0["query_text"], q0["mode"], q0["k"],
        scope=tr_meta.filter("role = 'user'"),
    ).collect()
    results["bm25_scoped_query"] = round(time.time() - t0, 3)
    t0 = time.time()
    index.facet_counts(q0["query_text"], tr_meta, "role", q0["mode"]).collect()
    results["bm25_facets"] = round(time.time() - t0, 3)
    # offset-free deep page (search_after): page 2 from page 1's last
    # row — one candidate-scoring pass, never an N·k overfetch
    p1 = index.topk(q0["query_text"], q0["mode"], q0["k"]).collect()
    if p1:
        last = p1[-1]
        t0 = time.time()
        index.topk(
            q0["query_text"], q0["mode"], q0["k"],
            search_after=(last["score"], last["conv_id"], last["turn_idx"]),
        ).collect()
        results["bm25_search_after"] = round(time.time() - t0, 3)
    lat.sort()
    p50 = statistics.median(lat)
    p95 = lat[max(0, int(len(lat) * 0.95) - 1)]

    # -- 3. contract workload at sf_dir --------------------------------
    # the ANN signature index is a BUILD-time artifact (written once,
    # probed per query); build it outside the per-query timings and
    # report its cost separately, like build_index
    t0 = time.time()
    contract._ann_index(spark, SF_DIR)
    results["ann_index_build"] = round(time.time() - t0, 3)
    # the PageRank table is likewise a build artifact (write_pagerank):
    # rank_blend and pagerank_terms read it, they do not recompute it
    t0 = time.time()
    contract._pagerank_table(spark, SF_DIR)
    results["pagerank_build"] = round(time.time() - t0, 3)
    # round-4 build artifacts, reported like ann_index_build: the ANN
    # delta segment (LSM freshness), the IVF quantizer index, and the
    # update ingest (base xs build + shadow-sidecar delta segment)
    t0 = time.time()
    contract._ann_segments(spark, SF_DIR)
    results["ann_segments_build"] = round(time.time() - t0, 3)
    t0 = time.time()
    contract._ivf_index(spark, SF_DIR)
    results["ivf_index_build"] = round(time.time() - t0, 3)
    t0 = time.time()
    contract._ivf_segments(spark, SF_DIR)
    results["ivf_segments_build"] = round(time.time() - t0, 3)
    t0 = time.time()
    contract._xs_updated_multi(spark)
    results["update_ingest_build"] = round(time.time() - t0, 3)

    qs = contract.QUERIES
    for name in CONTRACT_QUERIES:
        t0 = time.time()
        qs[name](spark, SF_DIR).collect()
        results[name] = round(time.time() - t0, 3)

    r1_subset = round(sum(results[n] for n in R1_SUBSET if n in results), 3)

    total = time.time() - t_all
    out = {
        "metric": "e2e_bench_wall",
        "value": round(total, 3),
        "unit": "sec",
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "r1_subset_seconds": r1_subset,
        "queries": results,
        "build": {
            "scale": SCALE,
            "n_turns": n_turns,
            "seconds": round(build_s, 3),
            "turns_per_sec": round(n_turns / build_s, 1),
            "cores": CPUS,
        },
        "query_latency": {
            "n_queries": len(lat),
            "p50_ms": round(p50 * 1000, 1),
            "p95_ms": round(p95 * 1000, 1),
        },
        "host_load_1_5_15": {
            "start": load_start,
            "end": [round(x, 2) for x in os.getloadavg()],
        },
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
