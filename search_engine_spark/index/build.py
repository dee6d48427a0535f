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
  phase 1  tokenize + per-partition posting-FRAGMENT construction in one
           Arrow-batched ``mapInPandas`` kernel: within each input batch,
           postings are aggregated per term and emitted as delta+varbyte
           compressed fragment rows (term, group, n, min_doc, doc/tf/pos/dl
           blobs) — a map-side combine that shrinks the shuffle from one
           row per (doc, term) to one row per (batch, term).  Doc-length
           rows ride along as ``term IS NULL`` fragments.  Two modes with
           identical on-disk layout: one job for the whole corpus (fast
           path) or one job per group (checkpoint/resume unit + lineage).
  phase 2  corpus stats: N, avgdl (``IndexerService.java:1017-1020`` path).
  phase 3  merge: ONE hash shuffle on ``(term, group)`` — the *group* key
           is the doc-range salt that spreads one Zipf head term over G
           reducers instead of one (SURVEY.md §4.1 "skew handling") —
           sort-within-partition by (term, group, min_doc), then a
           ``mapInPandas`` kernel (one invocation per Arrow batch, NOT per
           term) concatenates fragments into sorted posting runs and packs
           them into blocks of ``block_size`` with block-max BM25 partial
           upper bounds for WAND.  Written partitioned by
           ``bucket = pmod(xxhash64(term), NB)`` for query-time partition
           pruning (the Iceberg ``bucket(term)`` analog).
  phase 4  idf table (``idf = ln((1+N)/(1+df)) + 1``, IndexerService.java:966)
           and per-group doclen blobs for the query kernels.

All heavy work is DataFrame ops + Arrow-batched numpy kernels; no
per-row Python in any hot path, no driver-side loops over data.
"""

from __future__ import annotations

import json
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
from .codec import stream_byte_offsets, varbyte_decode, varbyte_encode

# term IS NULL rows are doclen fragments: doc_blob=delta(doc_ids),
# dl_blob=varbyte(dls), n=doc count, sum_dl=Σdl (for avgdl).
FRAGMENTS_SCHEMA = (
    "term string, group int, n int, min_doc long, sum_dl long, "
    "doc_blob binary, tf_blob binary, pos_blob binary, dl_blob binary"
)
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
    tokens: str = field(init=False)  # fragment table (kept name for layout compat)
    postings: str = field(init=False)
    idf: str = field(init=False)
    doclen: str = field(init=False)
    lineage: str = field(init=False)
    meta: str = field(init=False)

    def __post_init__(self) -> None:
        self.staged = _dir(self.root, "staged")
        self.tokens = _dir(self.root, "fragments")
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


def _delta(a: np.ndarray) -> np.ndarray:
    d = np.empty_like(a)
    d[0] = a[0]
    d[1:] = a[1:] - a[:-1]
    return d


def _fragment_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """(group, doc_id, text) batches → compressed fragment rows.

    Map-side combine: one output row per (term, group) per batch, postings
    already sorted by doc_id (input order within a staged file is doc-id
    ascending) and delta+varbyte packed.  One ``term IS NULL`` row per
    (group, batch) carries the doclen fragment.
    """
    stem_cache: dict[str, str] = {}
    for pdf in batches:
        rows: list = []
        for group, gdf in pdf.groupby("group", sort=False):
            per_term: dict[str, list] = {}
            doc_ids_all: list[int] = []
            dls_all: list[int] = []
            for did, text in zip(gdf["doc_id"], gdf["text"]):
                did = int(did)
                toks = analyze_text(
                    text if isinstance(text, str) else "", _stem_cache=stem_cache
                )
                doc_ids_all.append(did)
                dls_all.append(len(toks))
                per_doc: dict[str, list[int]] = {}
                for pos, tk in enumerate(toks):
                    per_doc.setdefault(tk, []).append(pos)
                dl = len(toks)
                for tk, ps in per_doc.items():
                    per_term.setdefault(tk, []).append((did, len(ps), ps, dl))
            g = int(group)
            # doclen fragment
            da = np.asarray(doc_ids_all, dtype=np.int64)
            dla = np.asarray(dls_all, dtype=np.int64)
            order = np.argsort(da, kind="stable")
            da, dla = da[order], dla[order]
            rows.append(
                (
                    None, g, len(da), int(da[0]), int(dla.sum()),
                    varbyte_encode(_delta(da).astype(np.uint64)),
                    None, None,
                    varbyte_encode(dla.astype(np.uint64)),
                )
            )
            # posting fragments
            for tk, plist in per_term.items():
                docs = np.asarray([p[0] for p in plist], dtype=np.int64)
                tfs = np.asarray([p[1] for p in plist], dtype=np.int64)
                dls = np.asarray([p[3] for p in plist], dtype=np.int64)
                if not np.all(docs[1:] >= docs[:-1]):
                    o = np.argsort(docs, kind="stable")
                    docs, tfs, dls = docs[o], tfs[o], dls[o]
                    plist = [plist[i] for i in o]
                pos_blob = b"".join(
                    varbyte_encode(_delta(np.asarray(p[2], dtype=np.int64)).astype(np.uint64))
                    for p in plist
                )
                rows.append(
                    (
                        tk, g, len(docs), int(docs[0]), 0,
                        varbyte_encode(_delta(docs).astype(np.uint64)),
                        varbyte_encode(tfs.astype(np.uint64)),
                        pos_blob,
                        varbyte_encode(dls.astype(np.uint64)),
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "term", "group", "n", "min_doc", "sum_dl",
                "doc_blob", "tf_blob", "pos_blob", "dl_blob",
            ],
        )


# ---------------------------------------------------------------- phase 3


_BLOCK_COLS = [
    "term", "group", "block_id", "n", "first_doc", "last_doc",
    "doc_blob", "tf_blob", "pos_blob", "max_tf", "max_partial",
]


def _emit_blocks(rows: list, term: str, group: int, doc_ids: np.ndarray,
                 tfs: np.ndarray, dls: np.ndarray, pos_stream: bytes,
                 avgdl: float, block_size: int) -> None:
    """Pack one doc-sorted (term, group) posting run into block rows."""
    k1, b = BM25_K1, BM25_B
    partial = tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls.astype(np.float64) / avgdl))
    if len(doc_ids) > block_size:
        pos_offsets = stream_byte_offsets(pos_stream, tfs)
    for bi, s in enumerate(range(0, len(doc_ids), block_size)):
        e = min(s + block_size, len(doc_ids))
        d = doc_ids[s:e]
        t = tfs[s:e]
        pos_part = (
            pos_stream
            if len(doc_ids) <= block_size
            else bytes(pos_stream[pos_offsets[s] : pos_offsets[e]])
        )
        rows.append(
            (
                term, group, bi, e - s, int(d[0]), int(d[-1]),
                varbyte_encode(_delta(d).astype(np.uint64)),
                varbyte_encode(t.astype(np.uint64)),
                pos_part,
                int(t.max()),
                float(partial[s:e].max()),
            )
        )


def _merge_run(rows: list, pdf: pd.DataFrame, avgdl: float, block_size: int) -> None:
    """Merge the fragments of ONE (term, group), already min_doc-sorted."""
    term = str(pdf["term"].iloc[0])
    group = int(pdf["group"].iloc[0])
    docs = np.concatenate(
        [np.cumsum(varbyte_decode(b).astype(np.int64)) for b in pdf["doc_blob"]]
    )
    tfs = np.concatenate([varbyte_decode(b).astype(np.int64) for b in pdf["tf_blob"]])
    dls = np.concatenate([varbyte_decode(b).astype(np.int64) for b in pdf["dl_blob"]])
    pos_stream = b"".join(pdf["pos_blob"])
    if not np.all(docs[1:] > docs[:-1]):
        # fragments overlapped (never happens for disjoint staged files;
        # kept as a correctness fallback) — reorder per posting
        offsets = stream_byte_offsets(pos_stream, tfs)
        o = np.argsort(docs, kind="stable")
        pos_stream = b"".join(
            pos_stream[offsets[i] : offsets[i + 1]] for i in o
        )
        docs, tfs, dls = docs[o], tfs[o], dls[o]
    _emit_blocks(rows, term, group, docs, tfs, dls, pos_stream, avgdl, block_size)


def _make_merge_mapper(avgdl: float, block_size: int):
    """mapInPandas kernel over a (term, group)-hash partition sorted by
    (term, group, min_doc): one invocation per Arrow batch (a corpus has
    millions of terms — per-key applyInPandas overhead would dominate).
    A (term, group) run can span batch boundaries, so each batch's
    trailing run is carried over."""

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: pd.DataFrame | None = None
        for pdf in batches:
            if buf is not None:
                pdf = pd.concat([buf, pdf], ignore_index=True)
                buf = None
            if len(pdf) == 0:
                continue
            t = pdf["term"].to_numpy()
            g = pdf["group"].to_numpy()
            tail_mask = (t == t[-1]) & (g == g[-1])
            tail_len = int(tail_mask[::-1].argmin()) if not tail_mask.all() else len(pdf)
            head_end = len(pdf) - tail_len
            buf = pdf.iloc[head_end:].reset_index(drop=True)
            if head_end:
                yield _merge_frame(pdf.iloc[:head_end], avgdl, block_size)
        if buf is not None and len(buf):
            yield _merge_frame(buf, avgdl, block_size)

    return mapper


def _merge_frame(pdf: pd.DataFrame, avgdl: float, block_size: int) -> pd.DataFrame:
    terms = pdf["term"].to_numpy()
    groups = pdf["group"].to_numpy()
    change = np.flatnonzero((terms[1:] != terms[:-1]) | (groups[1:] != groups[:-1])) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(pdf)]])
    rows: list = []
    for s, e in zip(starts, ends):
        _merge_run(rows, pdf.iloc[s:e], avgdl, block_size)
    return pd.DataFrame(rows, columns=_BLOCK_COLS)


# ---------------------------------------------------------------- phase 4


def _doclen_kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
    """Doclen fragments of one group → a single (group, blobs) row."""
    (group,) = key
    pdf = pdf.sort_values("min_doc", kind="mergesort")
    docs = np.concatenate(
        [np.cumsum(varbyte_decode(b).astype(np.int64)) for b in pdf["doc_blob"]]
    )
    dls = np.concatenate([varbyte_decode(b).astype(np.int64) for b in pdf["dl_blob"]])
    if not np.all(docs[1:] > docs[:-1]):
        o = np.argsort(docs, kind="stable")
        docs, dls = docs[o], dls[o]
    return pd.DataFrame(
        [
            (
                int(group),
                len(docs),
                varbyte_encode(_delta(docs).astype(np.uint64)),
                varbyte_encode(dls.astype(np.uint64)),
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
    skips groups whose fragment output committed (per-group marker +
    lineage row) — the resume test asserts the final index is identical.
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
        with open(os.path.join(self.paths.root, "_STAGED_SUCCESS"), "w") as f:
            f.write("ok")

    def groups_done(self) -> set[int]:
        return {
            g
            for g in range(self.config.num_groups)
            if os.path.exists(_group_done_marker(self.paths, g))
        }

    def _lineage_rows(self, frags: DataFrame, wall_s: float) -> list[dict]:
        rows = (
            frags.groupBy("group")
            .agg(
                F.sum(F.when(F.col("term").isNull(), F.col("n")).otherwise(0)).alias("docs"),
                F.sum(F.when(F.col("term").isNull(), F.col("sum_dl")).otherwise(0)).alias("tokens"),
                F.sum(F.when(F.col("term").isNotNull(), F.col("n")).otherwise(0)).alias("postings"),
                F.sum(
                    F.when(F.col("term").isNotNull(), F.octet_length("pos_blob")).otherwise(0)
                ).alias("pos_bytes"),
            )
            .collect()
        )
        return [
            {
                "group": int(r["group"]),
                "phase": "tokenize",
                "n_docs": int(r["docs"] or 0),
                "n_tokens": int(r["tokens"] or 0),
                "n_posting_rows": int(r["postings"] or 0),
                "pos_bytes": int(r["pos_bytes"] or 0),
                "wall_s": wall_s,
                "status": "complete",
            }
            for r in rows
        ]

    def tokenize_group(self, group: int) -> dict:
        """Phase 1 (checkpoint path) for one group; idempotent."""
        t0 = time.time()
        staged = self.spark.read.parquet(self.paths.staged).filter(F.col("group") == group)
        frags = staged.select("group", "doc_id", "text").mapInPandas(
            _fragment_kernel, schema=FRAGMENTS_SCHEMA
        ).drop("group")
        gdir = os.path.join(self.paths.tokens, f"group={group}")
        frags.write.mode("overwrite").parquet(gdir)
        out = self.spark.read.parquet(gdir).withColumn("group", F.lit(group))
        lineage = self._lineage_rows(out, round(time.time() - t0, 3))[0]
        with open(_group_done_marker(self.paths, group), "w") as f:
            json.dump(lineage, f)
        self.metrics.append(lineage)
        return lineage

    def tokenize_all(self) -> None:
        """Phase 1 fast path: ONE job for every group, same on-disk layout."""
        t0 = time.time()
        staged = self.spark.read.parquet(self.paths.staged).select("group", "doc_id", "text")
        frags = staged.mapInPandas(_fragment_kernel, schema=FRAGMENTS_SCHEMA)
        frags.write.mode("overwrite").partitionBy("group").parquet(self.paths.tokens)
        wall = round(time.time() - t0, 3)
        for lineage in self._lineage_rows(self._tokens(), wall):
            with open(_group_done_marker(self.paths, lineage["group"]), "w") as f:
                json.dump(lineage, f)
            self.metrics.append(lineage)

    def _tokens(self) -> DataFrame:
        return self.spark.read.option("basePath", self.paths.tokens).parquet(
            *[
                os.path.join(self.paths.tokens, f"group={g}")
                for g in range(self.config.num_groups)
            ]
        )

    def corpus_stats(self) -> tuple[int, float]:
        doc_rows = self._tokens().filter(F.col("term").isNull())
        r = doc_rows.agg(F.sum("n").alias("n"), F.sum("sum_dl").alias("tok")).collect()[0]
        n = int(r["n"] or 0)
        avgdl = (int(r["tok"] or 0) / n) if n else 0.0
        return n, avgdl

    def merge(self, avgdl: float) -> None:
        """Phase 3: salted (term, group) shuffle → block rows → bucketed parquet."""
        frags = self._tokens().filter(F.col("term").isNotNull()).select(
            "term", "group", "n", "min_doc", "doc_blob", "tf_blob", "pos_blob", "dl_blob"
        )
        clustered = frags.repartition(
            self.config.shuffle_partitions, "term", "group"
        ).sortWithinPartitions("term", "group", "min_doc")
        blocks = clustered.mapInPandas(
            _make_merge_mapper(avgdl, self.config.block_size), schema=BLOCKS_SCHEMA
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

        doc_rows = self._tokens().filter(F.col("term").isNull()).select(
            "group", "min_doc", "doc_blob", "dl_blob"
        )
        doclen = doc_rows.groupBy("group").applyInPandas(_doclen_kernel, schema=DOCLEN_SCHEMA)
        doclen.write.mode("overwrite").parquet(self.paths.doclen)

        if self.metrics:
            self.spark.createDataFrame(pd.DataFrame(self.metrics)).write.mode(
                "overwrite"
            ).parquet(self.paths.lineage)

        meta = {
            "n_docs": n_docs,
            "avgdl": avgdl,
            "num_groups": self.config.num_groups,
            "num_buckets": NUM_BUCKETS,
            "block_size": self.config.block_size,
            "k1": BM25_K1,
            "b": BM25_B,
            "format_version": 2,
        }
        with open(self.paths.meta, "w") as f:
            json.dump(meta, f, indent=2)

    # -- entry point -------------------------------------------------

    def build(self, transcripts: DataFrame, resume: bool = False) -> IndexPaths:
        if not resume:
            if os.path.exists(self.paths.root):
                shutil.rmtree(self.paths.root)
            os.makedirs(self.paths.root, exist_ok=True)
        if not resume or not os.path.exists(os.path.join(self.paths.root, "_STAGED_SUCCESS")):
            self.stage(transcripts)
        if resume or self.config.checkpoint:
            done = self.groups_done() if resume else set()
            for g in range(self.config.num_groups):
                if g in done:
                    with open(_group_done_marker(self.paths, g)) as f:
                        self.metrics.append(json.load(f))
                    continue
                self.tokenize_group(g)
        else:
            self.tokenize_all()
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
