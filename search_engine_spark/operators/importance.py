"""Tag/source importance weighting as a scoring input — the reference's
``Ranker1`` metric path.

The reference assigns each HTML tag an importance (title 10, h1 8,
h2 6, h3 4, p 2, default 1 — ``IndexerService.java:262-267``), persists
the per-(word, doc) maximum into the postings upsert
(``importance = GREATEST(...)``, ``IndexerService.java:66-68``), and
folds it into relevance as ``tfIdf *= Math.log(1 + importance)``
(``Ranker1.java:333-336``) over normalized tf
(``tf = freq / totalWordCount``, ``IndexerService.java:316``) and the
smoothed idf ``ln((1+N)/(1+df)) + 1`` (``IndexerService.java:966``).

The transcript corpus has no HTML tags; its structural analog is the
``source`` column of the documents table.  Sources map onto the same
five-step ladder deterministically (``importance_for_source``), and —
because a document has exactly one source — the reference's per-(word,
doc) GREATEST degenerates to the document's own source weight, which is
documented rather than hidden.

Plan shape (one corpus scan, all JVM):

    tokens → per-(doc, term) freq  (map-side partial agg)
          ⋈ doc length             (same scan, co-keyed on doc_id)
          ⋈ broadcast(idf side)    (|query terms| rows)
          → Σ_t (freq/dl)·idf·ln(1+imp(source))  per doc
          → TakeOrderedAndProject top-k

At 100 TB this is the same shape as the BM25 path: the only shuffle is
the (doc, term) aggregate; the idf side stays broadcast-size because it
is bounded by the query's term count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import rnd
from .docs_bm25 import ROUND, doc_lengths, term_freqs

#: the reference tag ladder, reused as the source ladder
#: (IndexerService.java:262-267: title 10, h1 8, h2 6, h3 4, p 2)
IMPORTANCE_LADDER = (10, 8, 6, 4, 2)


def importance_for_source(source: F.Column) -> F.Column:
    """Deterministic source → importance: ladder value by numeric suffix
    mod 5 (srcN → LADDER[N % 5]); non-numeric sources get the default 1
    (``IndexerService.java:319``).

    try_cast + the outer coalesce cover a numeric suffix that overflows
    INT: a plain cast is NULL under non-ANSI and THROWS under ANSI
    (Spark 4 default), while the oracle's TRY_CAST+COALESCE falls back
    to 1 — without this the importance (and the doc's score) silently
    went NULL or the job failed on pathological source names.
    """
    num = F.regexp_extract(source, r"(\d+)$", 1)
    return F.coalesce(
        F.when(num == "", F.lit(1)).otherwise(
            # 10 - 2*(n % 5) enumerates the ladder (10, 8, 6, 4, 2)
            F.lit(10) - F.lit(2) * (num.try_cast("int") % F.lit(5))
        ),
        F.lit(1),
    ).cast("double")


def importance_weighted_scores(
    docs: DataFrame, query_terms: list[str], source_col: str = "source"
) -> DataFrame:
    """(doc_id, score) under Ranker1: Σ_t (tf_norm·idf·ln(1+importance)).

    ``tf_norm = freq/doc_len`` (IndexerService.java:316), idf is the
    smoothed contract formula, importance comes from the document's
    source via the tag ladder.
    """
    uniq = sorted(set(query_terms))
    tf = term_freqs(docs).filter(F.col("term").isin(uniq))
    dl = doc_lengths(docs)
    # N as a 1-row broadcast subplan (no eager driver-side count job)
    stats = docs.agg(F.count("*").cast("double").alias("n"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    imp = docs.select("doc_id", importance_for_source(F.col(source_col)).alias("imp"))
    return (
        tf.join(dl, "doc_id")
        .join(imp, "doc_id")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log((F.lit(1.0) + F.col("n")) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0),
        )
        .withColumn(
            "partial",
            (F.col("tf").cast("double") / F.col("dl").cast("double"))
            * F.col("idf")
            * F.log(F.lit(1.0) + F.col("imp")),
        )
        .groupBy("doc_id")
        .agg(F.sum("partial").alias("score"))
    )


def importance_weighted_topk(
    docs: DataFrame, query_terms: list[str], k: int = 10, source_col: str = "source"
) -> DataFrame:
    """Top-k (doc_id, score, importance) — rounded for oracle parity;
    ties break on ascending doc_id."""
    scores = importance_weighted_scores(docs, query_terms, source_col)
    imp = docs.select("doc_id", importance_for_source(F.col(source_col)).alias("importance"))
    return (
        scores.join(imp, "doc_id")
        .select(
            "doc_id",
            rnd(F.col("score"), ROUND).alias("score"),
            F.col("importance").cast("long").alias("importance"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
