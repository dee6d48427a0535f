"""Cost evidence for the round's two new query paths, off the toy scale.

Part A — unordered near at a 1M-turn index: `kernels.near_candidates`
replaces the sloppy-phrase chain with one anchor `searchsorted` per
term over the SAME gathered position arrays, so its cost class is the
sloppy phrase's — bounded by the candidate docs' position counts,
independent of the slop value.  The probe runs the head-term pair as
exact phrase, ordered slop, and near at several slops, plus the
reversed-order pair (must match identically — order-free), and the
conjunctive query as the cost ceiling (same candidate set, no position
work).

Part B — wildcard/regexp vocabulary expansion at a 1M-term vocabulary:
the same filter + TakeOrdered the readers run (`_vocab_topdf` shape,
replicated inline here on a synthetic idf frame).  The claim: a
pattern with a literal prefix pushes a StartsWith into the parquet
scan and stays fast; a leading-wildcard pattern pays one full
vocabulary-column scan (the Lucene cost cliff — linear in V, bounded
output either way, and V is ~10^-5 of corpus tokens so even the cliff
is cheap relative to a postings scan).

Run:  SPARK_GRAFT_CPUS=32 python scripts/near_wildcard_probe.py [scale]
Emits one JSON line; results recorded in BASELINE.md.
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
from search_engine_spark.oracle import wildcard_literal_prefix, wildcard_to_like
from search_engine_spark.session import get_spark

PAIR = "term0000 term0001"  # the two heaviest head terms
N_TERMS = int(os.environ.get("SPARK_GRAFT_WC_TERMS", "1000000"))


def main() -> None:
    scale = sys.argv[1] if len(sys.argv) > 1 else "lg"
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="near-wildcard-probe", cores=cores)
    d = tempfile.mkdtemp(prefix="sgs_nw_probe_")
    out: dict = {"scale": scale, "cores": cores}
    try:
        # ---- part A: near vs phrase at the lg index -------------------
        pdf = generate_transcripts(scale)
        df = spark.createDataFrame(pdf[["conv_id", "turn_idx", "text"]])
        t0 = time.time()
        build_index(spark, df, os.path.join(d, "idx"), BuildConfig())
        out["n_turns"] = len(pdf)
        out["build_s"] = round(time.time() - t0, 1)
        idx = CompressedIndex(spark, os.path.join(d, "idx"))

        runs: dict = {}
        cases = [
            ("conjunctive", PAIR, "conjunctive"),
            ("phrase_exact", f'"{PAIR}"', "phrase"),
            ("phrase_slop4", f'"{PAIR}"~4', "phrase"),
            ("near_slop0", f'"{PAIR}"', "near"),
            ("near_slop4", f'"{PAIR}"~4', "near"),
            ("near_slop16", f'"{PAIR}"~16', "near"),
            ("near_slop64", f'"{PAIR}"~64', "near"),
            ("near_slop4_reversed", '"term0001 term0000"~4', "near"),
        ]
        for tag, q, mode in cases:
            times, matches = [], None
            for _ in range(3):  # run 1 cache-cold for the term set
                t0 = time.time()
                matches = idx.match_count(q, mode)
                times.append(round(time.time() - t0, 3))
            runs[tag] = {"matches": matches, "seconds": times}
        out["near_runs"] = runs
        out["order_free"] = (
            runs["near_slop4"]["matches"] == runs["near_slop4_reversed"]["matches"]
        )

        # ---- part B: wildcard/regexp expansion at a 1M-term vocab -----
        vocab = spark.range(N_TERMS).select(
            F.concat(F.lit("word"), F.lpad(F.col("id").cast("string"), 7, "0"))
            .alias("term"),
            (F.lit(1) + (F.lit(10_000_000) / (F.col("id") + 1)).cast("long"))
            .alias("df"),
        )
        idf_pq = os.path.join(d, "idf")
        vocab.write.parquet(idf_pq)
        idf = spark.read.parquet(idf_pq)
        idf.count()  # warm the scan once

        def vocab_topdf(cond) -> tuple[int, float]:
            t0 = time.time()
            rows = (
                idf.filter(cond)
                .orderBy(F.desc("df"), F.asc("term"))
                .limit(32)
                .collect()
            )
            return len(rows), time.time() - t0

        wc: dict = {}
        for tag, pat in (
            ("literal_prefix", "word00*9"),      # StartsWith("word00") pushed
            ("leading_star", "*0000123"),        # full vocabulary scan
            ("inner_only", "word???9999"),       # StartsWith("word") pushed
        ):
            cond = F.col("term").like(wildcard_to_like(pat))
            lit = wildcard_literal_prefix(pat)
            if lit:
                cond = F.col("term").startswith(lit) & cond
            hits, secs = vocab_topdf(cond)
            wc[tag] = {"pattern": pat, "hits": hits, "seconds": round(secs, 3)}
        hits, secs = vocab_topdf(F.col("term").rlike("^(?:word00000[0-9]{2})$"))
        wc["regexp"] = {
            "pattern": "word00000[0-9]{2}", "hits": hits, "seconds": round(secs, 3)
        }
        hits, secs = vocab_topdf(F.col("term").startswith("word00001"))
        wc["prefix_baseline"] = {
            "pattern": "word00001*", "hits": hits, "seconds": round(secs, 3)
        }
        out["vocab_terms"] = N_TERMS
        out["wildcard_runs"] = wc
        out["load_1_5_15"] = [round(x, 2) for x in os.getloadavg()]
        print(json.dumps(out))
    finally:
        shutil.rmtree(d, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
