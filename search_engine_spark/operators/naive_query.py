"""Naive (pure-DataFrame) BM25 scorer — the engine's internal cross-check.

Expresses the whole query as a declarative DataFrame plan (SURVEY.md M1):
tokenize → filter to query terms (broadcast semi-join) → per-(doc, term)
BM25 partial → per-doc deterministic sum → top-k.  Catalyst handles filter
pushdown, the tiny term list is broadcast, and the final top-k compiles to
``TakeOrderedAndProject`` — no global sort materialization.

Determinism: per-doc score sums ``collect_list(struct(term, partial))`` and
``array_sort``s it before folding, so summation order is
sorted-unique-term — identical to the oracle's (SURVEY.md §7.3 "score float
determinism").  IDF values are computed on the driver with the same
``math.log`` as the oracle and broadcast.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import BM25_B, BM25_K1
from ..functions.udfs import tokenize_turns
from ..oracle import OPERATOR_PATTERN, PHRASE_PATTERN
from ..textproc import analyze_query, analyze_text

DOC_KEY = ["conv_id", "turn_idx"]


@dataclass
class FlatIndex:
    """Uncompressed postings + stats; the M1 reference representation."""

    spark: SparkSession
    tokens: DataFrame  # conv_id, turn_idx, term, tf, positions, dl
    n_docs: int
    avgdl: float

    @classmethod
    def build(cls, spark: SparkSession, transcripts: DataFrame) -> "FlatIndex":
        tokens = tokenize_turns(transcripts).cache()
        n_docs = transcripts.count()
        total_tokens = tokens.agg(F.sum("tf").alias("t")).collect()[0]["t"] or 0
        avgdl = (int(total_tokens) / n_docs) if n_docs else 0.0
        return cls(spark=spark, tokens=tokens, n_docs=n_docs, avgdl=avgdl)

    def idf_map(self, terms: list[str]) -> dict[str, float]:
        """Driver-side IDF for a small term list (same math.log as oracle)."""
        uniq = sorted(set(terms))
        if not uniq:
            return {}
        rows = (
            self.tokens.filter(F.col("term").isin(uniq))
            .groupBy("term")
            .agg(F.count("*").alias("df"))
            .collect()
        )
        dfs = {r["term"]: r["df"] for r in rows}
        return {
            t: math.log((1.0 + self.n_docs) / (1.0 + dfs.get(t, 0))) + 1.0 for t in uniq
        }


def _bm25_partial(avgdl: float):
    """BM25 tf component with the oracle's exact operation association."""
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    denom = tf + F.lit(BM25_K1) * (F.lit(1.0 - BM25_B) + (F.lit(BM25_B) * dl) / F.lit(avgdl))
    return (tf * F.lit(BM25_K1 + 1.0)) / denom


def _score_and_topk(index: FlatIndex, matched: DataFrame, idf: dict[str, float], k: int) -> DataFrame:
    """matched: (conv_id, turn_idx, term, tf, dl) — unique per (doc, term)."""
    spark = index.spark
    idf_df = spark.createDataFrame(
        [(t, v) for t, v in idf.items()], "term string, idf double"
    )
    partial = (_bm25_partial(index.avgdl) * F.col("idf")).alias("partial")
    scored = (
        matched.join(F.broadcast(idf_df), "term")
        .select(*DOC_KEY, "term", partial)
        .groupBy(*DOC_KEY)
        .agg(F.array_sort(F.collect_list(F.struct("term", "partial"))).alias("parts"))
        .select(
            *DOC_KEY,
            F.expr(
                "aggregate(parts, cast(0.0 as double), (acc, x) -> acc + x.partial)"
            ).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), F.asc("conv_id"), F.asc("turn_idx")).limit(k)


def bm25_topk(
    index: FlatIndex, query_text: str, mode: str = "disjunctive", k: int = 10
) -> DataFrame:
    """Top-k (conv_id, turn_idx, score) matching the oracle contract."""
    if mode == "boolean":
        return _boolean_topk(index, query_text, k)
    if mode == "phrase":
        m = PHRASE_PATTERN.search(query_text)
        terms = analyze_text(m.group(1) if m else query_text)
        matched = _phrase_match(index, terms)
        return _score_and_topk(index, matched, index.idf_map(terms), k)

    terms = analyze_query(query_text)
    uniq = sorted(set(terms))
    empty = index.spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    if not uniq:
        return empty
    matched = index.tokens.filter(F.col("term").isin(uniq)).select(
        *DOC_KEY, "term", "tf", "dl"
    )
    if mode == "conjunctive":
        # docs containing ALL unique terms (QueryService.java:595-615)
        full = (
            matched.groupBy(*DOC_KEY)
            .agg(F.countDistinct("term").alias("nt"))
            .filter(F.col("nt") == len(uniq))
            .select(*DOC_KEY)
        )
        matched = matched.join(full, DOC_KEY, "left_semi")
    return _score_and_topk(index, matched, index.idf_map(uniq), k)


def _phrase_match(index: FlatIndex, terms: list[str]) -> DataFrame:
    """Docs where terms occur at consecutive positions in the token stream.

    Iterative position-list intersection expressed declaratively:
    survivors(i) = positions p of term0 with p+j ∈ positions(term_j) ∀ j<=i.
    Equivalent of the oracle's ``_phrase_match_docs`` / reference
    positional check (Ranker1.java:370-449) without per-position queries.
    """
    spark = index.spark
    if not terms:
        return spark.createDataFrame(
            [], "conv_id string, turn_idx int, term string, tf int, dl int"
        )
    t0 = (
        index.tokens.filter(F.col("term") == terms[0])
        .select(*DOC_KEY, F.col("positions").alias("cur"))
    )
    cur = t0
    for j, t in enumerate(terms[1:], start=1):
        tj = index.tokens.filter(F.col("term") == t).select(
            *DOC_KEY, F.col("positions").alias(f"p{j}")
        )
        cur = (
            cur.join(tj, DOC_KEY)
            .withColumn(
                "cur",
                F.expr(f"filter(cur, p -> array_contains(p{j}, p + {j}))"),
            )
            .filter(F.size("cur") > 0)
            .select(*DOC_KEY, "cur")
        )
    docs = cur.select(*DOC_KEY).distinct()
    matched = index.tokens.filter(F.col("term").isin(sorted(set(terms)))).select(
        *DOC_KEY, "term", "tf", "dl"
    )
    return matched.join(docs, DOC_KEY, "left_semi")


def _boolean_topk(index: FlatIndex, query_text: str, k: int) -> DataFrame:
    """Both operands quoted + exactly one AND/OR/NOT (QueryService.java:80-104)."""
    m = OPERATOR_PATTERN.search(query_text)
    phrases = PHRASE_PATTERN.findall(query_text)
    if not m or len(phrases) != 2:
        raise ValueError(f"invalid boolean query: {query_text!r}")
    op = m.group(1)
    lterms, rterms = analyze_text(phrases[0]), analyze_text(phrases[1])
    ldocs = _phrase_match(index, lterms).select(*DOC_KEY).distinct()
    rdocs = _phrase_match(index, rterms).select(*DOC_KEY).distinct()
    if op == "AND":
        docs, terms = ldocs.intersect(rdocs), lterms + rterms
    elif op == "OR":
        docs, terms = ldocs.union(rdocs).distinct(), lterms + rterms
    else:
        docs, terms = ldocs.exceptAll(rdocs).distinct(), lterms
    matched = index.tokens.filter(F.col("term").isin(sorted(set(terms)))).select(
        *DOC_KEY, "term", "tf", "dl"
    )
    matched = matched.join(docs, DOC_KEY, "left_semi")
    return _score_and_topk(index, matched, index.idf_map(terms), k)
