"""Compressed inverted-index build (SURVEY.md §4.4 step 1, M2).

Replaces the reference's row-per-posting PostgreSQL upsert pipeline
(``IndexerService.java:370-452`` batching, ``:57-68`` upserts) with a
Spark-first staged build over the transcripts table:

  phase 0  docmap/staging:  global dense ``doc_id`` by rank over
           ``(conv_id, turn_idx)`` (two-phase range partition + offset —
           the scalable analog of Ranker1's sorted-docId densification,
           ``Ranker1.java:128-137``), plus ``group = pmod(xxhash64(conv_id), G)``
           — the checkpoint/shard unit.  Staged parquet is partitioned by
           ``group`` so every later phase prunes to 1/G of the corpus.
  phase 1  per-group tokenize (resumable): Arrow-batched ``mapInPandas``
           kernel → one parquet of (doc_id, term, tf, pos varbyte-blob, dl)
           rows per group + a lineage row (tokens/docs/rows counters).
           A crashed build re-runs ONLY the missing groups.
  phase 2  corpus stats: N, avgdl (``IndexerService.java:1017-1020`` path).
  phase 3  merge: shuffle on ``(term, group)`` — the *group* key is the
           doc-range salt that spreads one Zipf head term over G reducers
           instead of one (SURVEY.md §4.1 "skew handling") — then an
           ``applyInPandas`` kernel packs sorted postings into
           delta+varbyte blocks of ``block_size`` with block-max BM25
           partial upper bounds for WAND.  Written partitioned by
           ``bucket = pmod(xxhash64(term), NB)`` for query-time partition
           pruning (the Iceberg ``bucket(term)`` analog).
  phase 4  idf table (``idf = ln((1+N)/(1+df)) + 1``, IndexerService.java:966)
           and per-group doclen blobs for the query kernels.

All heavy work is DataFrame ops + Arrow-batched pandas kernels; no
per-row Python, no driver-side loops over data.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import time
from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import BM25_B, BM25_K1, BuildConfig
from ..textproc import analyze_text
from .codec import varbyte_encode

TOKENS_SCHEMA = "doc_id long, term string, tf int, pos binary, dl int"
BLOCKS_SCHEMA = (
    "term string, group int, block_id int, n int, first_doc long, last_doc long, "
    "doc_blob binary, tf_blob binary, pos_blob binary, max_tf int, max_partial double"
)
DOCLEN_SCHEMA = "group int, n_docs long, doc_blob binary, dl_blob binary"

NUM_BUCKETS = 64  # term-hash partitions of the postings/idf tables


def _dir(base: str, name: str) -> str:
    return os.path.join(base, name)


@dataclass
class IndexPaths:
    root: str
    staged: str = field(init=False)
    docmap: str = field(init=False)
    tokens: str = field(init=False)
    postings: str = field(init=False)
    idf: str = field(init=False)
    doclen: str = field(init=False)
    lineage: str = field(init=False)
    meta: str = field(init=False)

    def __post_init__(self) -> None:
        self.staged = _dir(self.root, "staged")
        self.docmap = _dir(self.root, "docmap")
        self.tokens = _dir(self.root, "tokens")
        self.postings = _dir(self.root, "postings")
        self.idf = _dir(self.root, "idf")
        self.doclen = _dir(self.root, "doclen")
        self.lineage = _dir(self.root, "lineage")
        self.meta = _dir(self.root, "meta.json")


# ---------------------------------------------------------------- phase 0


def assign_doc_ids(transcripts: DataFrame, num_groups: int) -> tuple[DataFrame, DataFrame]:
    """transcripts → (group, doc_id, conv_id, turn_idx, text).

    ``doc_id`` is the global rank under ``(conv_id ASC, turn_idx ASC)`` —
    deterministic regardless of where the range-partition boundaries fall,
    because range partitions are contiguous in sort order and the offset of
    a partition is the count of rows in all earlier partitions.  No global
    single-task sort: rank is computed per partition + a driver-side
    prefix sum over per-partition counts (O(P) driver work).
    """
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    p = max(transcripts.sparkSession.sparkContext.defaultParallelism, 8)
    t = (
        transcripts.select("conv_id", "turn_idx", "text")
        .repartitionByRange(p, "conv_id", "turn_idx")
        .withColumn("_pid", F.spark_partition_id())
    )
    # Pin the sampled range boundaries: repartitionByRange re-samples per
    # job, so the counts job and the rank job MUST see the same physical
    # partitioning.  DISK_ONLY — one corpus-sized spill, same order of
    # cost as the staged write itself; released right after staging.
    t = t.persist(StorageLevel.DISK_ONLY)
    counts = {r["_pid"]: r["c"] for r in t.groupBy("_pid").agg(F.count("*").alias("c")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = t.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _off long"
    )
    w = Window.partitionBy("_pid").orderBy("conv_id", "turn_idx")
    staged = (
        t.join(F.broadcast(off_df), "_pid")
        .withColumn("doc_id", F.col("_off") + F.row_number().over(w) - 1)
        .withColumn("group", F.pmod(F.xxhash64("conv_id"), F.lit(num_groups)).cast("int"))
        .select("group", "doc_id", "conv_id", "turn_idx", "text")
    )
    return staged, t  # caller unpersists t after materializing staged


# ---------------------------------------------------------------- phase 1


def _tokenize_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """(doc_id, text) batches → (doc_id, term, tf, pos, dl) rows.

    One sentinel row per doc with ``term = NULL`` carries ``dl`` (so empty
    turns appear in doclen — N and avgdl count ALL turns, oracle parity).
    ``pos`` is the per-(doc, term) varbyte(delta(positions)) blob; varbyte
    is self-delimiting so the merge kernel can concatenate these blobs
    without re-encoding.
    """
    stem_cache: dict[str, str] = {}
    for pdf in batches:
        doc_ids: list[int] = []
        terms: list[str | None] = []
        tfs: list[int] = []
        blobs: list[bytes | None] = []
        dls: list[int] = []
        for did, text in zip(pdf["doc_id"], pdf["text"]):
            toks = analyze_text(text if isinstance(text, str) else "", _stem_cache=stem_cache)
            dl = len(toks)
            doc_ids.append(int(did))
            terms.append(None)
            tfs.append(0)
            blobs.append(None)
            dls.append(dl)
            per_term: dict[str, list[int]] = {}
            for pos, tk in enumerate(toks):
                per_term.setdefault(tk, []).append(pos)
            for tk, ps in per_term.items():
                a = np.asarray(ps, dtype=np.int64)
                d = np.empty_like(a)
                d[0] = a[0]
                d[1:] = a[1:] - a[:-1]
                doc_ids.append(int(did))
                terms.append(tk)
                tfs.append(len(ps))
                blobs.append(varbyte_encode(d.astype(np.uint64)))
                dls.append(dl)
        yield pd.DataFrame(
            {
                "doc_id": pd.array(doc_ids, dtype="int64"),
                "term": terms,
                "tf": pd.array(tfs, dtype="int32"),
                "pos": blobs,
                "dl": pd.array(dls, dtype="int32"),
            }
        )


# ---------------------------------------------------------------- phase 3


def _make_merge_kernel(avgdl: float, block_size: int):
    """applyInPandas kernel over one (term, group): fragments → blocks."""
    k1, b = BM25_K1, BM25_B

    def merge(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        term, group = key
        order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
        doc_ids = pdf["doc_id"].to_numpy()[order]
        tfs = pdf["tf"].to_numpy()[order].astype(np.int64)
        dls = pdf["dl"].to_numpy()[order].astype(np.float64)
        blobs = pdf["pos"].to_numpy(dtype=object)[order]
        partial = tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls / avgdl))
        rows = []
        for bi, s in enumerate(range(0, len(doc_ids), block_size)):
            e = min(s + block_size, len(doc_ids))
            d = np.asarray(doc_ids[s:e], dtype=np.int64)
            t = tfs[s:e]
            deltas = np.empty_like(d)
            deltas[0] = d[0]
            deltas[1:] = d[1:] - d[:-1]
            rows.append(
                (
                    term,
                    group,
                    bi,
                    e - s,
                    int(d[0]),
                    int(d[-1]),
                    varbyte_encode(deltas.astype(np.uint64)),
                    varbyte_encode(t.astype(np.uint64)),
                    b"".join(blobs[s:e]),
                    int(t.max()),
                    float(partial[s:e].max()),
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "term", "group", "block_id", "n", "first_doc", "last_doc",
                "doc_blob", "tf_blob", "pos_blob", "max_tf", "max_partial",
            ],
        )

    return merge


def _doclen_kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
    (group,) = key
    order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
    doc_ids = pdf["doc_id"].to_numpy()[order].astype(np.int64)
    dls = pdf["dl"].to_numpy()[order].astype(np.uint64)
    deltas = np.empty_like(doc_ids)
    if len(doc_ids):
        deltas[0] = doc_ids[0]
        deltas[1:] = doc_ids[1:] - doc_ids[:-1]
    return pd.DataFrame(
        [
            (
                int(group),
                len(doc_ids),
                varbyte_encode(deltas.astype(np.uint64)),
                varbyte_encode(dls),
            )
        ],
        columns=["group", "n_docs", "doc_blob", "dl_blob"],
    )


# ---------------------------------------------------------------- driver


def _group_done_marker(paths: IndexPaths, group: int) -> str:
    return os.path.join(paths.tokens, f"group={group}", "_GROUP_SUCCESS")


class IndexBuilder:
    """Checkpoint-resumable build driver.

    ``build()`` runs every phase; ``build(resume=True)`` after a crash
    skips groups whose tokenize output committed (per-group marker +
    lineage row) — the resume test asserts byte-identical final output.
    """

    def __init__(self, spark: SparkSession, out_dir: str, config: BuildConfig | None = None):
        self.spark = spark
        self.paths = IndexPaths(out_dir)
        self.config = config or BuildConfig()
        self.metrics: list[dict] = []

    # -- phases ------------------------------------------------------

    def stage(self, transcripts: DataFrame) -> None:
        """Phase 0: doc ids + groups, staged parquet partitioned by group."""
        staged, pinned = assign_doc_ids(transcripts, self.config.num_groups)
        staged.write.mode("overwrite").partitionBy("group").parquet(self.paths.staged)
        pinned.unpersist()
        docmap = self.spark.read.parquet(self.paths.staged).select(
            "doc_id", "conv_id", "turn_idx", "group"
        )
        docmap.write.mode("overwrite").parquet(self.paths.docmap)

    def groups_done(self) -> set[int]:
        return {
            g
            for g in range(self.config.num_groups)
            if os.path.exists(_group_done_marker(self.paths, g))
        }

    def tokenize_group(self, group: int) -> dict:
        """Phase 1 for one group; idempotent (overwrites its own dir)."""
        t0 = time.time()
        staged = self.spark.read.parquet(self.paths.staged).filter(F.col("group") == group)
        tokens = staged.select("doc_id", "text").mapInPandas(
            _tokenize_kernel, schema=TOKENS_SCHEMA
        )
        gdir = os.path.join(self.paths.tokens, f"group={group}")
        tokens.write.mode("overwrite").parquet(gdir)
        out = self.spark.read.parquet(gdir)
        row = out.agg(
            F.count("*").alias("rows"),
            F.sum(F.when(F.col("term").isNull(), 1).otherwise(0)).alias("docs"),
            F.sum(F.when(F.col("term").isNull(), F.col("dl")).otherwise(0)).alias("tokens"),
            F.sum(F.when(F.col("term").isNotNull(), F.octet_length("pos")).otherwise(0)).alias(
                "pos_bytes"
            ),
        ).collect()[0]
        lineage = {
            "group": group,
            "phase": "tokenize",
            "n_docs": int(row["docs"] or 0),
            "n_tokens": int(row["tokens"] or 0),
            "n_posting_rows": int(row["rows"] or 0) - int(row["docs"] or 0),
            "pos_bytes": int(row["pos_bytes"] or 0),
            "wall_s": round(time.time() - t0, 3),
            "status": "complete",
        }
        with open(_group_done_marker(self.paths, group), "w") as f:
            json.dump(lineage, f)
        self.metrics.append(lineage)
        return lineage

    def _tokens(self) -> DataFrame:
        return self.spark.read.option("basePath", self.paths.tokens).parquet(
            *[
                os.path.join(self.paths.tokens, f"group={g}")
                for g in range(self.config.num_groups)
            ]
        )

    def corpus_stats(self) -> tuple[int, float]:
        doc_rows = self._tokens().filter(F.col("term").isNull())
        r = doc_rows.agg(F.count("*").alias("n"), F.sum("dl").alias("tok")).collect()[0]
        n = int(r["n"] or 0)
        avgdl = (int(r["tok"] or 0) / n) if n else 0.0
        return n, avgdl

    def merge(self, avgdl: float) -> None:
        """Phase 3: salted (term, group) shuffle → block rows → bucketed parquet."""
        frags = self._tokens().filter(F.col("term").isNotNull())
        blocks = frags.groupBy("term", "group").applyInPandas(
            _make_merge_kernel(avgdl, self.config.block_size), schema=BLOCKS_SCHEMA
        )
        blocks = blocks.withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(NUM_BUCKETS)).cast("int")
        )
        blocks.write.mode("overwrite").partitionBy("bucket").parquet(self.paths.postings)

    def finalize(self, n_docs: int, avgdl: float) -> None:
        """Phase 4: idf + doclen blobs + lineage table + meta."""
        blocks = self.spark.read.parquet(self.paths.postings)
        idf = (
            blocks.groupBy("term")
            .agg(F.sum("n").alias("df"))
            .withColumn(
                "idf",
                F.log((F.lit(1.0) + F.lit(float(n_docs))) / (F.lit(1.0) + F.col("df")))
                + F.lit(1.0),
            )
            .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(NUM_BUCKETS)).cast("int"))
        )
        idf.write.mode("overwrite").partitionBy("bucket").parquet(self.paths.idf)

        doc_rows = self._tokens().filter(F.col("term").isNull()).select("group", "doc_id", "dl")
        doclen = doc_rows.groupBy("group").applyInPandas(_doclen_kernel, schema=DOCLEN_SCHEMA)
        doclen.write.mode("overwrite").parquet(self.paths.doclen)

        lineage_df = self.spark.createDataFrame(pd.DataFrame(self.metrics)) if self.metrics else None
        if lineage_df is not None:
            lineage_df.write.mode("overwrite").parquet(self.paths.lineage)

        meta = {
            "n_docs": n_docs,
            "avgdl": avgdl,
            "num_groups": self.config.num_groups,
            "num_buckets": NUM_BUCKETS,
            "block_size": self.config.block_size,
            "k1": BM25_K1,
            "b": BM25_B,
            "format_version": 1,
        }
        with open(self.paths.meta, "w") as f:
            json.dump(meta, f, indent=2)

    # -- entry point -------------------------------------------------

    def build(self, transcripts: DataFrame, resume: bool = False) -> IndexPaths:
        if not resume:
            if os.path.exists(self.paths.root):
                shutil.rmtree(self.paths.root)
            os.makedirs(self.paths.root, exist_ok=True)
        if not resume or not os.path.exists(self.paths.docmap):
            self.stage(transcripts)
        done = self.groups_done() if resume else set()
        for g in range(self.config.num_groups):
            if g in done:
                with open(_group_done_marker(self.paths, g)) as f:
                    self.metrics.append(json.load(f))
                continue
            self.tokenize_group(g)
        n_docs, avgdl = self.corpus_stats()
        self.merge(avgdl)
        self.finalize(n_docs, avgdl)
        return self.paths


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    config: BuildConfig | None = None,
    resume: bool = False,
) -> IndexPaths:
    return IndexBuilder(spark, out_dir, config).build(transcripts, resume=resume)


def load_meta(out_dir: str) -> dict:
    with open(IndexPaths(out_dir).meta) as f:
        return json.load(f)
