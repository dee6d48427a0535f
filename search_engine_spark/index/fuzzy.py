"""SymSpell-style fuzzy (edit-distance-1) term matching over the index
vocabulary.

Lucene's ``term~`` fuzzy queries expand a term to its close vocabulary
neighbors before scoring.  The scale-correct way to find ed≤1 neighbors
without an O(V) distance scan per query is the symmetric-delete scheme
(public SymSpell design): every vocabulary term w is indexed under its
delete-1 variant set ``{w} ∪ del1(w)``; a query term t looks up ITS
variant set — any ed≤1 pair is guaranteed to collide on at least one
variant (equal: trivially; deletion/insertion: t ∈ del1(w) or
w ∈ del1(t); substitution at i: both delete position i to the same
string).  Collisions admit a few distance-2 pairs, so an exact O(len)
verifier (oracle.within_edit1) filters them.

The variant table is a PERSISTED SIDECAR (``<index>/fuzzy``,
partitioned by ``vbucket = pmod(xxhash64(variant), NB)``) built once
per index from the one-row-per-term idf table with pure JVM expressions
(sequence/transform/substring — no UDF); lookups prune to the query
variants' buckets exactly like term lookups prune the postings.  Size
is Σ(len(term)+1) rows ≈ (avg_len+1)× the vocabulary — the classic
SymSpell space-for-speed trade, tiny next to the postings.  Without the
sidecar the reader falls back to deriving variants from the idf table
per query (a full vocabulary scan — fine for tests and small indexes,
wrong at 10^9-term scale; build the sidecar there).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .build import IndexPaths

#: delete-1 variant set of `term`, as a pure-SQL expression (1-based
#: substring; vocabulary terms are len ≥ 2 so sequence() never descends)
VARIANTS_EXPR = (
    "array_union(array(term), transform(sequence(1, length(term)), "
    "i -> concat(substring(term, 1, i - 1), substring(term, i + 1, length(term)))))"
)

FUZZY_SCHEMA = "variant string, term string, df long, vbucket int"


def variants_df(idf_df: DataFrame, num_buckets: int) -> DataFrame:
    """(term, df) → exploded (variant, term, df, vbucket)."""
    return (
        idf_df.select("term", "df")
        .withColumn("variant", F.explode(F.expr(VARIANTS_EXPR)))
        .withColumn(
            "vbucket", F.pmod(F.xxhash64("variant"), F.lit(num_buckets)).cast("int")
        )
        .select("variant", "term", "df", "vbucket")
    )


def build_fuzzy_sidecar(spark: SparkSession, index_root: str) -> str:
    """Materialize the delete-1 variant sidecar for an existing index.

    One job over the idf table; written partitioned by vbucket so query
    lookups partition-prune exactly like postings lookups.  Idempotent
    (overwrite) and additive — the core index files are untouched."""
    import json

    paths = IndexPaths(index_root)
    with open(paths.meta) as f:
        nb = int(json.load(f)["num_buckets"])
    idf = spark.read.schema("term string, df long, idf double, bucket int").parquet(
        paths.idf
    )
    out = os.path.join(index_root, "fuzzy")
    (
        variants_df(idf, nb)
        .repartition("vbucket")
        .write.mode("overwrite")
        .partitionBy("vbucket")
        .parquet(out)
    )
    return out
