"""Curation-operator cost at a 1M-doc corpus.

The sf fixtures top out at 500-60k documents, so this probe synthesizes
a realistic corpus shape directly — 1M docs of ~60 Zipf-ish tokens over
a 50k-word vocabulary, 20 sources — and measures each curation
operator's wall clock and the scale-relevant shape facts:

  * decontamination — eval side stays a BROADCAST (the probe records
    its gram count); corpus cost is one shingle pass + bounded per-doc
    aggregation, so wall should track corpus tokens, not eval size;
  * repetition stats — (doc, gram) partial aggregation; wall tracks
    corpus tokens;
  * PII scrub — one exchange-free codegen projection (the floor: this
    is what a pure scan+map costs at this scale);
  * mixture sample — per-source window rank; wall tracks corpus rows;
  * span dedup stats — corpus-wide first-wins over ~53M 8-gram
    occurrences: one partial min(struct) aggregation + one join back;
    wall tracks total gram occurrences (corpus tokens), never pairs.

Run:  SPARK_GRAFT_CPUS=32 python scripts/curation_scale_probe.py
Writes CURATION_PROBE.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from search_engine_spark.pipeline import curation
from search_engine_spark.session import get_spark

N_DOCS = int(os.environ.get("SPARK_GRAFT_CURATION_DOCS", "1000000"))
TOKENS_PER_DOC = 60
VOCAB = 50_000
N_EVAL = 2_000  # a realistic benchmark-suite size


def main() -> None:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="curation_probe", cores=cores)
    out: dict = {
        "n_docs": N_DOCS,
        "tokens_per_doc": TOKENS_PER_DOC,
        "vocab": VOCAB,
        "n_eval_docs": N_EVAL,
        "cores": cores,
    }

    # deterministic synthetic corpus: token t of doc d hashes (d, t)
    # into a skewed vocab slice (the `* t` factor repeats low-t tokens
    # across docs and makes within-doc repetition non-trivial); no
    # files — the generator IS the scan
    docs = (
        spark.range(N_DOCS)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(TOKENS_PER_DOC - 1)),
                    lambda t: F.concat(
                        F.lit("w"),
                        F.lpad(
                            F.pmod(
                                F.xxhash64(F.col("id") * F.lit(7919) + t)
                                % F.lit(997)
                                * t,
                                # every 10th doc draws from a 5-word
                                # vocabulary → genuinely repetitive docs,
                                # so dup_gram_frac measures something real
                                F.when(
                                    F.pmod(F.col("id"), F.lit(10)) == 0, F.lit(5)
                                ).otherwise(F.lit(VOCAB)),
                            ).cast("string"),
                            5,
                            "0",
                        ),
                    ),
                ),
            ).alias("text"),
            F.concat(F.lit("src"), F.pmod(F.col("id"), F.lit(20)).cast("string")).alias(
                "source"
            ),
        )
        .persist()
    )
    n = docs.count()  # materialize once so operator timings exclude gen
    out["materialized_docs"] = n

    # eval set: every (N_DOCS // N_EVAL)-th doc's text plays the benchmark
    step = max(1, N_DOCS // N_EVAL)
    # % step == 1 keeps the eval rows off the synthetic repetitive docs
    # (doc_id % 10 == 0), so the eval set has a realistic gram diversity
    eval_df = docs.filter(F.col("doc_id") % step == 1).select("doc_id", "text")

    t0 = time.time()
    ev = curation.eval_shingles(eval_df, 3).persist()
    out["eval_grams"] = ev.count()
    out["eval_shingles_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    stats = curation.decontamination_stats(docs, ev, 3)
    agg = stats.agg(
        F.count("*").alias("n"),
        F.sum(F.col("contaminated").cast("long")).alias("flagged"),
    ).collect()[0]
    out["decontaminate_s"] = round(time.time() - t0, 2)
    out["decontaminate_docs_per_s"] = round(N_DOCS / (time.time() - t0), 1)
    out["flagged_docs"] = int(agg["flagged"])

    t0 = time.time()
    rep = curation.repetition_stats(docs, 2)
    ragg = rep.agg(
        F.count("*").alias("n"), F.round(F.avg("dup_gram_frac"), 4).alias("avg_dup")
    ).collect()[0]
    out["repetition_s"] = round(time.time() - t0, 2)
    out["repetition_docs_per_s"] = round(N_DOCS / out["repetition_s"], 1)
    out["avg_dup_gram_frac"] = float(ragg["avg_dup"])

    t0 = time.time()
    pii = curation.pii_scrub(docs)
    pagg = pii.agg(
        F.count("*").alias("n"), F.sum("n_longnum").alias("nums")
    ).collect()[0]
    out["pii_s"] = round(time.time() - t0, 2)
    out["pii_docs_per_s"] = round(N_DOCS / out["pii_s"], 1)

    t0 = time.time()
    parts = {f"src{i}": (3 if i == 0 else 1) for i in range(10)}
    mix = curation.mixture_sample(docs, parts)
    out["mixture_kept"] = mix.count()
    out["mixture_s"] = round(time.time() - t0, 2)
    out["mixture_docs_per_s"] = round(N_DOCS / out["mixture_s"], 1)

    t0 = time.time()
    sd = curation.span_dedup_stats(docs, 8)
    sagg = sd.agg(
        F.count("*").alias("n"),
        F.sum("n_dup_spans").alias("spans"),
        F.round(F.avg("dup_token_frac"), 4).alias("avg_frac"),
    ).collect()[0]
    out["span_dedup_s"] = round(time.time() - t0, 2)
    out["span_dedup_docs_per_s"] = round(N_DOCS / out["span_dedup_s"], 1)
    out["span_dedup_dup_spans"] = int(sagg["spans"])
    out["span_dedup_avg_frac"] = float(sagg["avg_frac"])

    t0 = time.time()
    pk = curation.pack_mapping(docs, 2048)
    kagg = pk.agg(
        F.count("*").alias("n"), F.max("seq_last").alias("last_seq")
    ).collect()[0]
    out["pack_s"] = round(time.time() - t0, 2)
    out["pack_docs_per_s"] = round(N_DOCS / out["pack_s"], 1)
    out["pack_sequences"] = int(kagg["last_seq"]) + 1

    out["note"] = (
        "decontamination wall is corpus-bounded: the eval side is "
        f"{out['eval_grams']} grams broadcast once; doubling the eval set "
        "re-costs only the broadcast. All four operators are shuffle-light "
        "(PII none; mixture one window; decontam/repetition/span-dedup "
        "partial-agg; span dedup adds one gram-hash join plus a bounded "
        "coverage explode — the costliest stats pass, still "
        "corpus-token-linear) — "
        "shapes that scale horizontally with executors."
    )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "CURATION_PROBE.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
