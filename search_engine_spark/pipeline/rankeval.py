"""Retrieval-quality evaluation — the Elasticsearch ``_rank_eval`` API
analog: given a set of queries and a table of relevance judgments,
score the engine's rankings with the standard IR metrics
(precision@k, recall@k, MRR, NDCG@k).

The reference repo evaluates ranking quality by eyeball (its README's
screenshot queries); a measurable harness is what a production search
deployment actually runs after every ranker change, so this operator is
first-class here: rankings come from the engine's own BATCHED execution
path (``topk_batch`` — one job for the whole query set), and every
metric is a JVM window/aggregate expression over
O(queries · k + judgments) rows — no Python in the loop, trivially
scale-independent (the expensive part is the retrieval itself).

Metric definitions (ES ``_rank_eval`` semantics):

- ``precision_at_k``  = relevant retrieved / retrieved            (0 if nothing retrieved)
- ``recall_at_k``     = relevant retrieved / total relevant       (0 if no judgment > 0)
- ``mrr``             = 1 / rank of the first relevant result     (0 if none retrieved)
- ``ndcg``            = DCG@k / IDCG@k with the exponential gain
  ``(2^rating - 1) / log2(rank + 1)``; IDCG ranks the judgment list by
  rating descending, truncated at k     (0 if the ideal DCG is 0)

Unjudged retrieved documents count as rating 0 (the ES default); ranks
are assigned by ``(score DESC, conv_id ASC, turn_idx ASC)`` — the same
deterministic tie-break the reader's own top-k uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: judgments schema: one row per judged (query, doc) pair
JUDGMENT_COLS = ("query_id", "conv_id", "turn_idx", "rating")


def _gain(rating, rank):
    return (F.pow(F.lit(2.0), rating) - 1.0) / F.log2(rank + F.lit(1.0))


def rank_eval(
    index,
    queries: list[tuple[str, str]],
    judgments: DataFrame,
    k: int = 10,
    hits: DataFrame | None = None,
) -> DataFrame:
    """Per-query metrics → DataFrame(query_id, precision_at_k,
    recall_at_k, mrr, ndcg, n_retrieved, n_relevant).

    ``queries`` is a list of (query_text, mode); ``query_id`` is the
    list position — the same contract as ``topk_batch``, which executes
    the whole set in one job.  ``judgments`` carries
    (query_id, conv_id, turn_idx, rating≥0); a query with no judgment
    rows still reports (its relevant counts are zero).

    ``hits`` overrides the retrieval: a (query_id, conv_id, turn_idx,
    score) DataFrame from ANY ranking source — the hybrid fusion, a
    rescorer, an external system under A/B comparison — is scored with
    the same metrics (rows beyond rank k per query are ignored), which
    is the point of an evaluation harness: hold the judgments fixed,
    swap the ranker.
    """
    j = judgments.select(*JUDGMENT_COLS)
    if hits is None:
        hits = index.topk_batch(queries, k)
    hits = hits.select("query_id", "conv_id", "turn_idx", "score").withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.desc("score"), F.asc("conv_id"), F.asc("turn_idx")
            )
        ),
    ).filter(F.col("rank") <= k)
    rated = hits.join(j, ["query_id", "conv_id", "turn_idx"], "left").withColumn(
        "rating", F.coalesce(F.col("rating"), F.lit(0))
    )
    per_hit = rated.groupBy("query_id").agg(
        F.count("*").alias("n_retrieved"),
        F.sum((F.col("rating") > 0).cast("int")).alias("rel_retrieved"),
        F.min(F.when(F.col("rating") > 0, F.col("rank"))).alias("first_rel"),
        F.sum(_gain(F.col("rating"), F.col("rank"))).alias("dcg"),
    )
    # ideal DCG: the judgment list ranked by rating desc, truncated at k
    ideal = (
        j.filter(F.col("rating") > 0)
        .withColumn(
            "irank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("rating"), F.asc("conv_id"), F.asc("turn_idx")
                )
            ),
        )
        .filter(F.col("irank") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(_gain(F.col("rating"), F.col("irank"))).alias("idcg"),
        )
    )
    totals = j.groupBy("query_id").agg(
        F.sum((F.col("rating") > 0).cast("int")).alias("n_relevant")
    )
    # every query of the batch reports, judged or retrieved or neither
    qids = index.spark.range(len(queries)).select(
        F.col("id").cast("int").alias("query_id")
    )
    out = (
        qids.join(per_hit, "query_id", "left")
        .join(totals, "query_id", "left")
        .join(ideal, "query_id", "left")
        .fillna(
            {"n_retrieved": 0, "rel_retrieved": 0, "dcg": 0.0, "n_relevant": 0,
             "idcg": 0.0}
        )
    )
    return out.select(
        "query_id",
        F.when(
            F.col("n_retrieved") > 0,
            F.col("rel_retrieved") / F.col("n_retrieved"),
        )
        .otherwise(0.0)
        .alias("precision_at_k"),
        F.when(
            F.col("n_relevant") > 0, F.col("rel_retrieved") / F.col("n_relevant")
        )
        .otherwise(0.0)
        .alias("recall_at_k"),
        F.coalesce(1.0 / F.col("first_rel"), F.lit(0.0)).alias("mrr"),
        F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg"))
        .otherwise(0.0)
        .alias("ndcg"),
        "n_retrieved",
        "n_relevant",
    )


def rank_eval_summary(per_query: DataFrame) -> DataFrame:
    """Mean of each metric over the query set (the ES combined
    ``metric_score``) — one row."""
    return per_query.agg(
        F.count("*").alias("n_queries"),
        F.avg("precision_at_k").alias("precision_at_k"),
        F.avg("recall_at_k").alias("recall_at_k"),
        F.avg("mrr").alias("mrr"),
        F.avg("ndcg").alias("ndcg"),
    )
