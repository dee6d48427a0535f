"""LSM read path: query a base index plus delta segments as ONE index.

``extend_index`` (extend.py) absorbs a delta by rewriting the merged
posting blocks — O(index bytes) per delta.  At 10^12 turns the index
bytes themselves are tens of TB, so per-delta rewrites are the wrong
steady state.  ``MultiIndex`` completes the LSM picture the way Lucene
segments do (public design; also the shape of the reference's freshness
story, where ``IndexerService.java:57-68`` upserts rows without ever
rebuilding the table):

  * ingest  — each delta becomes its OWN small index via a plain
    ``build_index`` over just the delta (O(delta) work, no old bytes
    touched; conversations/turns must be disjoint from other segments),
  * query   — ``MultiIndex([base, d1, d2, ...])`` answers with global
    BM25 statistics: N = Σ n_docs, avgdl = Σ dl / N, df(t) = Σ df_i(t)
    (segments hold disjoint documents, so document frequencies add),
    all exact, so results match a from-scratch build of the union
    byte-for-byte (pinned by tests),
  * compact — ``extend_index`` folds accumulated deltas back into one
    root when the segment count grows; queries regain the single-index
    fast path (WAND, exact-cut kernels).

Physical plan per query: each segment's bucket-pruned postings scan is
unioned with a ``seg`` literal; ONE grouped kernel pass scores every
(seg, group) partition against the broadcast global idf/avgdl (format
v5 blocks carry per-posting doclens inline, so no segment-local state
is needed); candidates map back to conversations through their own
segment's convs table (doc ids are segment-local ranks); a global
``ORDER BY score, conv_id, turn_idx LIMIT k`` merges segments.  The
kernels always run ``with_ties=True`` here — doc-id order means nothing
ACROSS segments, so boundary score-ties must surface for the global
sort to resolve (WAND's bounded heap cannot hold ties, which is one
more reason compaction exists).
"""

from __future__ import annotations

from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .reader import (
    BATCH_RESULT_SCHEMA,
    RESULT_SCHEMA,
    CompressedIndex,
    _batch_term_sets,
    _lru_topk,
    _make_batch_kernel,
    _make_group_kernel,
    _parse_batch,
    _rank_per_query,
    parse_query,
    resolve_tombstones,
)


def _with_seg(inner, n_cols_before: int = 0):
    """Wrap a grouped kernel so its output carries the segment id from
    the group key — the kernel itself is the tested single-index one."""

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        out = inner(key[1:], pdf)
        out.insert(0, "seg", np.full(len(out), key[0], dtype="int32"))
        return out

    return kernel


class MultiIndex:
    """Read-only view over several disjoint index segments.

    Segments must hold disjoint (conv_id, turn_idx) documents — that is
    the ingest contract (each turn is indexed into exactly one segment;
    ``extend_index`` enforces it on compaction).  Layout invariants
    (format v5, conv_rank scheme, turn_bits, num_buckets) must match
    across segments; num_groups may differ (groups are per-segment
    parallelism units, never joined across segments).
    """

    def __init__(self, spark: SparkSession, roots: list[str]):
        if not roots:
            raise ValueError("MultiIndex needs at least one segment root")
        self.spark = spark
        self.segments = [CompressedIndex(spark, r) for r in roots]
        s0 = self.segments[0]
        for seg in self.segments:
            if seg.scheme != "conv_rank":
                raise ValueError(
                    f"MultiIndex segment {seg.paths.root} uses doc-id scheme "
                    f"{seg.scheme!r}; segments must be conv_rank batch builds"
                )
            if int(seg.turn_bits) != int(s0.turn_bits):
                raise ValueError("MultiIndex segments disagree on turn_bits")
            if int(seg.num_buckets) != int(s0.num_buckets):
                raise ValueError("MultiIndex segments disagree on num_buckets")
        self.turn_bits = int(s0.turn_bits)
        self.num_buckets = int(s0.num_buckets)
        # exact global stats from the per-group doclen tables (G rows per
        # segment — one tiny job, not a corpus scan); summing the integer
        # totals reproduces the single-index avgdl bit-for-bit
        doclen = reduce(
            DataFrame.unionByName,
            [spark.read.parquet(seg.paths.doclen).select("n_docs", "sum_dl")
             for seg in self.segments],
        )
        r = doclen.agg(
            F.sum("n_docs").alias("n"), F.sum("sum_dl").alias("tok")
        ).collect()[0]
        self.n_docs = int(r["n"] or 0)
        self.avgdl = (int(r["tok"] or 0) / self.n_docs) if self.n_docs else 0.0
        # segments hold disjoint docs, so per-term document frequencies
        # ADD; idf is recomputed from the summed df at the global N
        self._df_all = reduce(
            DataFrame.unionByName,
            [seg._idf.select("term", "df", "bucket") for seg in self.segments],
        )
        # conversation map: doc ids are segment-local conv ranks, so the
        # label join is on (seg, conv_rank); one conversation may appear
        # in several segments (new turns in a later delta) — each row
        # maps only its own segment's candidates
        self._convs = reduce(
            DataFrame.unionByName,
            [
                seg._convs.select("conv_id", "conv_rank").withColumn("seg", F.lit(i))
                for i, seg in enumerate(self.segments)
            ],
        ).cache()
        self._idf_cache: dict[str, float] = {}
        from collections import OrderedDict

        self._results: "OrderedDict[tuple, list]" = OrderedDict()

    def warm(self) -> None:
        self._convs.count()

    def topk_cached(
        self, query_text: str, mode: str = "disjunctive", k: int = 10, algo: str = "auto"
    ) -> list:
        """Collected top-k through the shared LRU result cache — committed
        segments are immutable, so entries never go stale."""
        return _lru_topk(self, query_text, mode, k, algo)

    # -- global statistics -------------------------------------------

    def _resolve_tomb(self, tombstones) -> dict | None:
        """Tombstone items → one resolved set per segment (doc ids are
        segment-local rank encodings); kernels pick their segment's set
        from the batch's ``seg`` column."""
        if not tombstones:
            return None
        return {
            i: resolve_tombstones(seg._convs, tombstones)
            for i, seg in enumerate(self.segments)
        }

    def idf_map(self, terms: list[str]) -> dict[str, float]:
        """Global idf: df summed across segments, the build formula
        ``ln((1+N)/(1+df)) + 1`` (IndexerService.java:966) applied at
        the global N.  Bucket-pruned on every segment's idf table."""
        import math

        uniq = sorted(set(terms))
        if not uniq:
            return {}
        missing = [t for t in uniq if t not in self._idf_cache]
        if missing:
            buckets = self.segments[0]._buckets(missing)
            rows = (
                self._df_all.filter(
                    F.col("bucket").isin(buckets) & F.col("term").isin(missing)
                )
                .groupBy("term")
                .agg(F.sum("df").alias("df"))
                .collect()
            )
            found = {r["term"]: int(r["df"]) for r in rows}
            for t in missing:
                df = found.get(t, 0)
                self._idf_cache[t] = (
                    math.log((1.0 + self.n_docs) / (1.0 + df)) + 1.0
                )
        return {t: self._idf_cache[t] for t in uniq}

    def _postings(self, terms: list[str]) -> DataFrame:
        return reduce(
            DataFrame.unionByName,
            [
                seg.postings_df(terms).withColumn("seg", F.lit(i))
                for i, seg in enumerate(self.segments)
            ],
        )

    def _label(self, cand: DataFrame, extra: tuple = ()) -> DataFrame:
        cols = [*extra, "conv_id", "turn_idx", "score"]
        return (
            cand.withColumn("conv_rank", F.shiftrightunsigned("doc_id", self.turn_bits))
            .withColumn(
                "turn_idx",
                F.col("doc_id").bitwiseAND(F.lit((1 << self.turn_bits) - 1)).cast("int"),
            )
            .join(self._convs, ["seg", "conv_rank"])
            .select(*cols)
        )

    # -- query -------------------------------------------------------

    def topk(
        self,
        query_text: str,
        mode: str = "disjunctive",
        k: int = 10,
        algo: str = "auto",
        tombstones: list | None = None,
    ) -> DataFrame:
        """Top-k across all segments → DataFrame(conv_id, turn_idx,
        score); identical to a single index built over the union."""
        spec = parse_query(query_text, mode)
        empty = self.spark.createDataFrame(
            [], "conv_id string, turn_idx int, score double"
        )
        if spec is None:
            return empty
        fetch_terms = sorted(
            set(spec.score_terms) | set(spec.phrase_a or []) | set(spec.phrase_b or [])
        )
        idf = self.idf_map(spec.score_terms)
        kernel = _make_group_kernel(
            spec, idf, self.avgdl, k, algo, with_ties=True,
            exclude=self._resolve_tomb(tombstones),
        )
        cand = (
            self._postings(fetch_terms)
            .groupBy("seg", "group")
            .applyInPandas(_with_seg(kernel), schema="seg int, " + RESULT_SCHEMA)
        )
        return (
            self._label(cand)
            .orderBy(F.desc("score"), F.asc("conv_id"), F.asc("turn_idx"))
            .limit(k)
        )

    def match_count(
        self,
        query_text: str,
        mode: str = "disjunctive",
        tombstones: list | None = None,
    ) -> int:
        """Total matching documents across all segments (totalResults
        analog) — per-(seg, group) counts sum because segments and
        groups hold disjoint documents."""
        from .reader import _make_count_kernel

        spec = parse_query(query_text, mode)
        if spec is None:
            return 0
        fetch_terms = sorted(
            set(spec.score_terms) | set(spec.phrase_a or []) | set(spec.phrase_b or [])
        )
        idf = self.idf_map(spec.score_terms)
        kernel = _make_count_kernel(
            spec, idf, self.avgdl, exclude=self._resolve_tomb(tombstones)
        )
        row = (
            self._postings(fetch_terms)
            .groupBy("seg", "group")
            .applyInPandas(_with_seg(kernel), schema="seg int, n long")
            .agg(F.sum("n"))
            .collect()[0]
        )
        return int(row[0] or 0)

    def topk_batch(
        self,
        queries: list[tuple[str, str] | tuple[str, str, int]],
        k: int = 10,
        algo: str = "auto",
        tombstones: list | None = None,
    ) -> DataFrame:
        """Batched top-k across all segments in ONE job →
        DataFrame(query_id, conv_id, turn_idx, score); row-identical to
        per-query :meth:`topk` (pinned by tests)."""
        specs = _parse_batch(queries, k)
        empty = self.spark.createDataFrame(
            [], "query_id int, conv_id string, turn_idx int, score double"
        )
        if not specs:
            return empty
        fetch_terms, score_terms = _batch_term_sets(specs)
        merged_idf = self.idf_map(sorted(score_terms))
        idfs = [{t: merged_idf[t] for t in s.score_terms} for _, s, _ in specs]
        kernel = _make_batch_kernel(
            [s for _, s, _ in specs],
            idfs,
            merged_idf,
            self.avgdl,
            [kk for _, _, kk in specs],
            algo,
            with_ties=True,
            exclude=self._resolve_tomb(tombstones),
        )
        cand = (
            self._postings(sorted(fetch_terms))
            .groupBy("seg", "group")
            .applyInPandas(_with_seg(kernel), schema="seg int, " + BATCH_RESULT_SCHEMA)
        )
        return _rank_per_query(self._label(cand, extra=("query_id",)), specs)
