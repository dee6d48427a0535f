"""BM25 engine over a generic (doc_id, text) corpus — pure JVM path.

Same scoring contract as the transcript engine (SURVEY.md §4.3:
idf = ln((1+N)/(1+df))+1, tf_bm25 with k1=1.2/b=0.75 from
``IndexerService.java:966, 1029-1030, 1069-1070``) but with the *simple
analyzer* (lowercase + whitespace split) instead of the reference
tokenizer, so the WHOLE plan is built-in Spark SQL expressions —
posexplode/groupBy/join/window, zero Python, whole-stage codegen
end-to-end.  This is the path whose semantics the DuckDB oracle SQL can
mirror exactly; the reference-parity analyzer (Porter + sub-token dedup)
lives in the Arrow-kernel engine and is pinned by the pytest oracle.

The per-query plan (broadcast the term list, aggregate partials,
TakeOrderedAndProject for top-k) is the Catalyst-native analog of the
reference's ``SELECT ... WHERE word_id = ?`` index seeks
(QueryService.java:445-452) + in-memory scoring loop (:921-1098).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import BM25_B, BM25_K1
from ..functions import rnd

ROUND = 5  # float quantization for oracle value-hash comparison


def simple_tokens(docs: DataFrame, with_pos: bool = False) -> DataFrame:
    """(doc_id, text) → one row per token: (doc_id, pos, token).

    Analyzer: lower → trim → split on whitespace → drop empties.
    """
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda x: x != F.lit("")
    )
    out = docs.select("doc_id", F.posexplode(toks).alias("pos", "token"))
    return out if with_pos else out.select("doc_id", "token")


def term_freqs(docs: DataFrame) -> DataFrame:
    """A1: per-(doc, term) frequency via hash aggregate (map-side partial)."""
    return (
        simple_tokens(docs)
        .groupBy("doc_id", F.col("token").alias("term"))
        .agg(F.count("*").alias("tf"))
    )


def doc_lengths(docs: DataFrame) -> DataFrame:
    """A3: token count per doc; docs with no tokens get dl=0."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda x: x != F.lit("")
    )
    return docs.select("doc_id", F.size(toks).alias("dl"))


def term_stats(docs: DataFrame, n_docs: int) -> DataFrame:
    """A4/A6: per-term document frequency + contract idf."""
    return (
        term_freqs(docs)
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .withColumn(
            "idf",
            F.log((F.lit(1.0) + F.lit(float(n_docs))) / (F.lit(1.0) + F.col("df")))
            + F.lit(1.0),
        )
    )


def bm25_scores(
    docs: DataFrame, query_terms: list[str], conjunctive: bool = False
) -> DataFrame:
    """Per-doc BM25 over ``query_terms`` → (doc_id, score) unrounded.

    Stats (N, avgdl) are computed as subplans — one corpus-wide aggregate
    each, reused by Catalyst; the tiny per-term idf side is broadcast.
    """
    uniq = sorted(set(query_terms))
    tf = term_freqs(docs)
    dl = doc_lengths(docs)
    stats = dl.agg(
        F.count("*").alias("n"), F.avg(F.col("dl").cast("double")).alias("avgdl")
    )
    matched = tf.filter(F.col("term").isin(uniq))
    dfreq = matched.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        matched.join(dl, "doc_id")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log((F.lit(1.0) + F.col("n")) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0),
        )
        .withColumn(
            "partial",
            F.col("idf")
            * (
                F.col("tf").cast("double")
                * F.lit(BM25_K1 + 1.0)
                / (
                    F.col("tf").cast("double")
                    + F.lit(BM25_K1)
                    * (
                        F.lit(1.0 - BM25_B)
                        + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("avgdl")
                    )
                )
            ),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("partial").alias("score"), F.count("*").alias("nt")
    )
    if conjunctive:
        agg = agg.filter(F.col("nt") == len(uniq))
    return agg.select("doc_id", "score")


def bm25_topk(
    docs: DataFrame, query_terms: list[str], k: int = 10, conjunctive: bool = False
) -> DataFrame:
    """Top-k (doc_id, score) — ties by ascending doc_id; score rounded."""
    return (
        bm25_scores(docs, query_terms, conjunctive)
        .select("doc_id", rnd(F.col("score"), ROUND).alias("score"))
        # order on the ROUNDED score: last-ulp float divergence between
        # engines must not change the top-k membership
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_topk_sql(table: str, query_terms: list[str], k: int = 10, conjunctive: bool = False) -> str:
    """The DuckDB oracle for :func:`bm25_topk` — same math, same rounding."""
    uniq = sorted(set(query_terms))
    in_list = ", ".join(f"''{t}''" if "'" in t else f"'{t}'" for t in uniq)
    conj = f"HAVING count(*) = {len(uniq)}" if conjunctive else ""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x <> '')) AS token
  FROM {table}
),
tf AS (SELECT doc_id, token AS term, count(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (
  SELECT doc_id, len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x <> '')) AS dl
  FROM {table}
),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl::DOUBLE) AS avgdl FROM dl),
dfreq AS (SELECT term, count(*) AS df FROM tf WHERE term IN ({in_list}) GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         (ln((1.0 + stats.n) / (1.0 + dfreq.df)) + 1.0)
         * (tf.tf::DOUBLE * {BM25_K1 + 1.0}
            / (tf.tf::DOUBLE + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * dl.dl::DOUBLE / stats.avgdl))) AS partial
  FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN stats
  WHERE tf.term IN ({in_list})
)
SELECT doc_id, round(sum(partial) + 1e-9, {ROUND}) AS score
FROM scored GROUP BY doc_id {conj}
ORDER BY round(sum(partial) + 1e-9, {ROUND}) DESC, doc_id ASC LIMIT {k}
"""
