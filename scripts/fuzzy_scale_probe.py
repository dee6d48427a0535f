"""Fuzzy-lookup cost at a 1M-term vocabulary: sidecar vs fallback.

The transcript fixtures top out at a few thousand distinct terms, so
this probe synthesizes a REALISTIC vocabulary shape directly — 1M
distinct terms with Zipf-ish df — and measures the two candidate paths
of ``expand_fuzzy``:

  * sidecar — delete-1 variants persisted, partitioned by
    ``pmod(xxhash64(variant), NB)``; a query scans only its own
    variants' buckets (the SymSpell scale path),
  * fallback — variants derived from the full idf table per query
    (the documented small-index path, O(V) per query).

The claim: sidecar lookup time is flat in vocabulary size (bucket
pruning bounds the scan at ~V/NB rows), while the fallback pays the
full vocabulary scan.  Run:

    SPARK_GRAFT_CPUS=32 python scripts/fuzzy_scale_probe.py
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

from search_engine_spark.index.fuzzy import VARIANTS_EXPR, variants_df
from search_engine_spark.index.xxhash import term_bucket
from search_engine_spark.oracle import deletions1, rank_fuzzy_candidates
from search_engine_spark.session import get_spark

N_TERMS = int(os.environ.get("SPARK_GRAFT_FUZZY_TERMS", "1000000"))
NB = 64
PROBES = ["wordx0000123", "wrd0999999", "wordz123456", "word0500000"]


def main() -> None:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="fuzzy_probe", cores=cores)
    d = tempfile.mkdtemp(prefix="sgs_fzprobe_")
    out: dict = {"n_terms": N_TERMS, "num_buckets": NB, "cores": cores}
    try:
        # synthetic vocabulary: 1M distinct terms 'wordNNNNNNN' (len 11),
        # df = a deterministic Zipf-ish function of the term id
        vocab = spark.range(N_TERMS).select(
            F.concat(F.lit("word"), F.lpad(F.col("id").cast("string"), 7, "0"))
            .alias("term"),
            (F.lit(1) + (F.lit(10_000_000) / (F.col("id") + 1)).cast("long"))
            .alias("df"),
        )
        idf_pq = os.path.join(d, "idf")
        vocab.write.parquet(idf_pq)
        idf = spark.read.parquet(idf_pq)

        t0 = time.time()
        sidecar = os.path.join(d, "fuzzy")
        (
            variants_df(idf, NB)
            .repartition("vbucket")
            .write.partitionBy("vbucket")
            .parquet(sidecar)
        )
        out["sidecar_build_s"] = round(time.time() - t0, 2)
        sc = spark.read.schema(
            "variant string, term string, df long, vbucket int"
        ).parquet(sidecar)
        out["sidecar_rows"] = sc.count()

        def lookup_sidecar(t: str) -> list[str]:
            tv = sorted(set(deletions1(t)) | {t})
            vb = sorted({term_bucket(v, NB) for v in tv})
            rows = (
                sc.filter(F.col("vbucket").isin(vb) & F.col("variant").isin(tv))
                .select("term", "df").collect()
            )
            cands = {r["term"]: int(r["df"]) for r in rows}
            return rank_fuzzy_candidates(t, list(cands.items()), 16)

        def lookup_fallback(t: str) -> list[str]:
            tv = sorted(set(deletions1(t)) | {t})
            rows = (
                idf.withColumn("variant", F.explode(F.expr(VARIANTS_EXPR)))
                .filter(F.col("variant").isin(tv))
                .select("term", "df").collect()
            )
            cands = {r["term"]: int(r["df"]) for r in rows}
            return rank_fuzzy_candidates(t, list(cands.items()), 16)

        lookup_sidecar(PROBES[0])  # warm
        for tag, fn in (("sidecar", lookup_sidecar), ("fallback", lookup_fallback)):
            times, hits = [], []
            for t in PROBES:
                t0 = time.time()
                exp = fn(t)
                times.append(time.time() - t0)
                hits.append(len(exp))
            out[f"{tag}_lookup_s"] = [round(x, 3) for x in times]
            out[f"{tag}_expansions"] = hits
        # both paths must agree
        out["paths_agree"] = all(
            lookup_sidecar(t) == lookup_fallback(t) for t in PROBES
        )
        out["load_1_5_15"] = [round(x, 2) for x in os.getloadavg()]
        print(json.dumps(out))
    finally:
        shutil.rmtree(d, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
