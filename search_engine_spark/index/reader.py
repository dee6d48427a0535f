"""Query engine over the compressed index (SURVEY.md §4.4 step 2, M3).

Physical plan per query::

    idf parquet  --bucket-pruned scan--> driver (|terms| rows, broadcast)
    postings parquet --bucket-pruned, term-filtered scan-->
        groupBy(group) cogroup doclen.groupBy(group)
        applyInPandas(per-group WAND / exact kernel)   # ≤ G·k rows out
    join docmap (broadcast of the tiny candidate side)
    orderBy(score desc, conv_id, turn_idx) limit k     # TakeOrderedAndProject

Bucket pruning is the Spark analog of the reference's B-tree index seek
``SELECT ... WHERE word_id = ?`` (QueryService.java:448-452): the scan
touches only ``pmod(xxhash64(term), NB)`` partitions, never the full
postings table.  Every stage is a DataFrame op; per-group kernels are the
only Python, Arrow-batched.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..oracle import OPERATOR_PATTERN, PHRASE_PATTERN
from ..textproc import analyze_query, analyze_text
from .build import IndexPaths
from .kernels import (
    DocLens,
    TermPostings,
    conjunctive_candidates,
    exact_topk,
    phrase_candidates,
    wand_topk,
)
from .xxhash import term_bucket

RESULT_SCHEMA = "doc_id long, score double"
RESULT_CACHE_SIZE = 500  # SearchController.java:35
# below this many decoded postings the vectorized exact kernel beats the
# document-at-a-time WAND loop; above it WAND's skipping wins
WAND_MIN_POSTINGS = 50_000


@dataclass
class QuerySpec:
    mode: str  # disjunctive | conjunctive | phrase | boolean
    score_terms: list[str]  # unique, sorted — summation set
    phrase_a: list[str] | None = None  # ordered phrase terms
    phrase_b: list[str] | None = None
    bool_op: str | None = None


def parse_query(query_text: str, mode: str) -> QuerySpec | None:
    """Reference query parsing (QueryService.java:73-134, 80-104)."""
    if mode == "boolean":
        m = OPERATOR_PATTERN.search(query_text)
        phrases = PHRASE_PATTERN.findall(query_text)
        if not m or len(phrases) != 2:
            raise ValueError(f"invalid boolean query: {query_text!r}")
        op = m.group(1)
        lt, rt = analyze_text(phrases[0]), analyze_text(phrases[1])
        score = sorted(set(lt)) if op == "NOT" else sorted(set(lt + rt))
        return QuerySpec("boolean", score, lt, rt, op)
    if mode == "phrase":
        pm = PHRASE_PATTERN.search(query_text)
        terms = analyze_text(pm.group(1) if pm else query_text)
        if not terms:
            return None
        return QuerySpec("phrase", sorted(set(terms)), terms)
    terms = analyze_query(query_text)
    if not terms:
        return None
    return QuerySpec(mode, sorted(set(terms)))


class CompressedIndex:
    """Reader over an index directory produced by :class:`IndexBuilder`."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.paths = IndexPaths(root)
        with open(self.paths.meta) as f:
            self.meta = json.load(f)
        self.n_docs = int(self.meta["n_docs"])
        self.avgdl = float(self.meta["avgdl"])
        self.num_buckets = int(self.meta["num_buckets"])
        # doclen is G rows of blobs — hot on every query → cache
        self._doclen = spark.read.parquet(self.paths.doclen).cache()
        self.scheme = self.meta.get("docid_scheme", "dense")
        if self.scheme == "conv_rank":
            self.turn_bits = int(self.meta["turn_bits"])
            self._convs = spark.read.parquet(self.paths.convs).cache()
        else:
            # streaming/dense builds carry an explicit per-doc map
            self._docmap = spark.read.parquet(self.paths.docmap).cache()
        self._idf_cache: dict[str, float] = {}
        from collections import OrderedDict

        self._results: "OrderedDict[tuple, list]" = OrderedDict()
        # persistent DataFrame handles: the parquet file index (directory
        # listing over NUM_BUCKETS partition dirs) is built once and
        # reused by every query instead of re-listing per query.
        # Explicit schemas: an index over an all-stopword corpus has an
        # EMPTY idf table, which schema inference cannot read.
        from .build import BLOCKS_SCHEMA

        self._postings = spark.read.schema(BLOCKS_SCHEMA + ", bucket int").parquet(
            self.paths.postings
        )
        self._idf = spark.read.schema("term string, df long, idf double, bucket int").parquet(
            self.paths.idf
        )

    def warm(self) -> None:
        """Materialize the lookup caches (doclen, convs/docmap)."""
        self._doclen.count()
        if self.scheme == "conv_rank":
            self._convs.count()
        else:
            self._docmap.count()

    def _label(self, cand: DataFrame) -> DataFrame:
        """(doc_id, score) → (conv_id, turn_idx, score)."""
        if self.scheme == "conv_rank":
            return (
                cand.withColumn(
                    "conv_rank", F.shiftrightunsigned("doc_id", self.turn_bits)
                )
                .withColumn(
                    "turn_idx",
                    F.col("doc_id").bitwiseAND(F.lit((1 << self.turn_bits) - 1)).cast("int"),
                )
                .join(self._convs.select("conv_id", "conv_rank"), "conv_rank")
                .select("conv_id", "turn_idx", "score")
            )
        return cand.join(
            self._docmap.select("doc_id", "conv_id", "turn_idx"), "doc_id"
        ).select("conv_id", "turn_idx", "score")

    # -- lookups -----------------------------------------------------

    def _buckets(self, terms: list[str]) -> list[int]:
        # driver-side XXH64 — identical to the writer's Spark xxhash64,
        # no job launch (parity pinned by tests/test_xxhash.py)
        return sorted({term_bucket(t, self.num_buckets) for t in terms})

    def idf_map(self, terms: list[str]) -> dict[str, float]:
        """Bucket-pruned idf lookup; absent terms get df=0 idf (oracle parity)."""
        import math

        uniq = sorted(set(terms))
        if not uniq:
            return {}
        missing = [t for t in uniq if t not in self._idf_cache]
        if missing:
            buckets = self._buckets(missing)
            rows = (
                self._idf.filter(
                    F.col("bucket").isin(buckets) & F.col("term").isin(missing)
                )
                .select("term", "idf")
                .collect()
            )
            found = {r["term"]: float(r["idf"]) for r in rows}
            absent = math.log((1.0 + self.n_docs) / 1.0) + 1.0
            for t in missing:
                self._idf_cache[t] = found.get(t, absent)
        return {t: self._idf_cache[t] for t in uniq}

    def postings_df(self, terms: list[str]) -> DataFrame:
        buckets = self._buckets(terms)
        return self._postings.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )

    # -- query -------------------------------------------------------

    def topk_cached(
        self, query_text: str, mode: str = "disjunctive", k: int = 10, algo: str = "auto"
    ) -> list:
        """Collected top-k with an LRU result cache — the reference's
        500-entry search cache analog (SearchController.java:33-36, minus
        the TTL: the index is immutable once built)."""
        key = (query_text, mode, k, algo)
        hit = self._results.get(key)
        if hit is not None:
            self._results.move_to_end(key)
            return hit
        rows = self.topk(query_text, mode, k, algo).collect()
        self._results[key] = rows
        if len(self._results) > RESULT_CACHE_SIZE:
            self._results.popitem(last=False)
        return rows

    def topk(
        self, query_text: str, mode: str = "disjunctive", k: int = 10, algo: str = "auto"
    ) -> DataFrame:
        """Top-k → DataFrame(conv_id, turn_idx, score), oracle-identical."""
        spec = parse_query(query_text, mode)
        empty = self.spark.createDataFrame([], "conv_id string, turn_idx int, score double")
        if spec is None:
            return empty
        fetch_terms = sorted(
            set(spec.score_terms)
            | set(spec.phrase_a or [])
            | set(spec.phrase_b or [])
        )
        idf = self.idf_map(spec.score_terms)
        avgdl = self.avgdl
        # dense (streaming/arrival-ordered) doc ids are not isomorphic to
        # the (conv_id, turn_idx) tie-break order, so group kernels must
        # emit boundary ties and let the global sort resolve them; WAND's
        # bounded heap cannot hold ties, so it is only safe on conv_rank
        kernel = _make_group_kernel(
            spec, idf, avgdl, k, algo, with_ties=(self.scheme != "conv_rank")
        )
        post = self.postings_df(fetch_terms)
        cand = (
            post.groupBy("group")
            .cogroup(self._doclen.groupBy("group"))
            .applyInPandas(kernel, schema=RESULT_SCHEMA)
        )
        return (
            self._label(cand)
            .orderBy(F.desc("score"), F.asc("conv_id"), F.asc("turn_idx"))
            .limit(k)
        )


def _make_group_kernel(
    spec: QuerySpec,
    idf: dict[str, float],
    avgdl: float,
    k: int,
    algo: str,
    with_ties: bool = False,
):
    """Build the per-group cogroup kernel for one parsed query."""

    def kernel(key: tuple, post_pdf: pd.DataFrame, dl_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(post_pdf) == 0:
            return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                                 "score": pd.array([], dtype="float64")})
        doclens = DocLens(dl_pdf)
        plists: dict[str, TermPostings] = {}
        for term, tdf in post_pdf.groupby("term", sort=True):
            plists[str(term)] = TermPostings(str(term), tdf, idf.get(str(term), 0.0), avgdl)

        score_lists = {t: p for t, p in plists.items() if t in idf}
        if spec.mode == "disjunctive":
            total = sum(p.doc_ids.size for p in score_lists.values())
            use_wand = not with_ties and (
                algo == "wand" or (algo == "auto" and total >= WAND_MIN_POSTINGS)
            )
            if use_wand:
                docs, scores = wand_topk(score_lists, idf, doclens, avgdl, k)
            else:
                docs, scores = exact_topk(
                    score_lists, idf, doclens, avgdl, k, with_ties=with_ties
                )
        elif spec.mode == "conjunctive":
            need = {t: plists[t] for t in spec.score_terms if t in plists}
            if len(need) < len(spec.score_terms):
                docs = np.empty(0, dtype=np.int64)
                scores = np.empty(0, dtype=np.float64)
            else:
                cand = conjunctive_candidates(need)
                docs, scores = exact_topk(
                    score_lists, idf, doclens, avgdl, k,
                    candidates=cand, with_ties=with_ties,
                )
        elif spec.mode == "phrase":
            cand = phrase_candidates(spec.phrase_a or [], plists)
            docs, scores = exact_topk(
                score_lists, idf, doclens, avgdl, k, candidates=cand, with_ties=with_ties
            )
        else:  # boolean
            la = phrase_candidates(spec.phrase_a or [], plists)
            rb = phrase_candidates(spec.phrase_b or [], plists)
            if spec.bool_op == "AND":
                cand = np.intersect1d(la, rb, assume_unique=True)
            elif spec.bool_op == "OR":
                cand = np.union1d(la, rb)
            else:
                cand = np.setdiff1d(la, rb, assume_unique=True)
            docs, scores = exact_topk(
                score_lists, idf, doclens, avgdl, k, candidates=cand, with_ties=with_ties
            )
        return pd.DataFrame({"doc_id": docs, "score": scores})

    return kernel
