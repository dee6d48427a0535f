"""Hybrid retrieval — lexical BM25 fused with embedding similarity, the
Elasticsearch/OpenSearch *hybrid search* analog (`knn` + `query` with
reciprocal-rank-fusion or min-max score normalization).

The reference repo ranks by lexical signals only (RankerService.java's
tf-idf + PageRank blend); a modern deployment of the same corpus runs
BM25 and a vector query side by side and fuses the two rankings.  Both
standard fusion modes are implemented:

- **RRF** (`method="rrf"`): ``score = Σ_i w_i / (rrf_k + rank_i)`` over
  the lists a doc appears in — rank-based, scale-free, the ES
  ``rank.rrf`` retriever.  ``rrf_k`` defaults to 60 (the constant from
  Cormack/Clarke/Buettcher's original RRF paper and the ES default).
- **Linear** (`method="linear"`): per-list min-max normalization to
  [0, 1] then a weighted sum — the OpenSearch normalization-processor
  (``min_max`` + ``arithmetic_mean``) semantics.  A doc missing from a
  list contributes 0 for that list; a constant-score list normalizes
  to 1.0.

Scale shape: the fusion operates on the **already-retrieved top-`depth`
lists** (≤ a few hundred rows each), never the corpus — the expensive
work is the two retrievals, each of which is the engine's own scale
path (partition-pruned BM25 kernel; brute-force or LSH/IVF ANN).  The
single-partition rank window inside the fusion therefore touches
O(depth) rows by construction.

The embedder (:func:`hash_embed`) is the classic feature-hashing
(hashing-trick) bag-of-words embedding — Weinberger et al., ICML 2009:
each analyzed term adds ±1 at ``xxh64(term) % dim`` (sign from an
independent hash bit), L2-normalized.  Deterministic, vocabulary-free,
and embarrassingly parallel (one ``mapInPandas`` pass, no shuffle), so
the same code embeds 100 TB of transcripts or a 12-row test corpus.  A
learned-model embedding drops in by replacing :func:`embed_tokens`; all
fusion/ranking machinery is embedding-agnostic (any
(conv_id, turn_idx, embedding) table works).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from ..functions import rnd
from ..index.xxhash import xxh64
from ..textproc.pipeline import analyze_text

ROUND = 5
RRF_K = 60  # Cormack/Clarke/Buettcher 2009 constant; the ES default
EMBED_SCHEMA = "conv_id string, turn_idx int, embedding array<double>"


# ---------------------------------------------------------------------------
# feature-hashing embedder (shared kernel: Spark mapInPandas AND the
# pure-Python oracle import THIS function, so parity is structural)
# ---------------------------------------------------------------------------


def embed_tokens(
    tokens: list[str],
    dim: int = 64,
    _hash_cache: dict[str, tuple[int, float]] | None = None,
) -> list[float]:
    """Hashing-trick embedding of an analyzed token list.

    index = xxh64(term) % dim, sign from hash bit 62 (independent of the
    index bits for dim ≤ 2^32); accumulate, then L2-normalize.  An empty
    token list (or total cancellation) returns the zero vector — callers
    treat zero-norm vectors as "no semantic signal".

    ``_hash_cache`` memoizes term → (index, sign) across calls (the
    corpus vocabulary is Zipf — a few thousand distinct terms cover
    millions of occurrences); purely an evaluation cache, identical
    output with or without.  The cached index is ``% dim``, so a cache
    is valid for ONE dim — never share it across dimensions (the
    kernel keeps one per (pass, dim), and the default is per-call).
    """
    c = _hash_cache if _hash_cache is not None else {}
    v = np.zeros(dim, dtype=np.float64)
    for t in tokens:
        e = c.get(t)
        if e is None:
            h = xxh64(t.encode("utf-8"))
            e = (h % dim, 1.0 if (h >> 62) & 1 == 0 else -1.0)
            c[t] = e
        v[e[0]] += e[1]
    n = math.sqrt(float((v * v).sum()))
    if n > 0.0:
        v /= n
    return [float(x) for x in v]


def embed_query(query_text: str, dim: int = 64) -> list[float]:
    """Embed raw query text through the same analyzer + hasher as docs
    (symmetric dual-encoder semantics: one embedding space)."""
    return embed_tokens(analyze_text(query_text), dim)


def hash_embed(transcripts: DataFrame, dim: int = 64) -> DataFrame:
    """(conv_id, turn_idx, embedding): per-turn hashing-trick embeddings.

    One Arrow-batched ``mapInPandas`` pass over (conv_id, turn_idx,
    text) — no shuffle, no driver state; output partitioning inherits
    the input's, so a downstream ANN index build sees the same layout
    as any other embedding table.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, str] = {}
        hcache: dict[str, tuple[int, float]] = {}
        for b in batches:
            embs = [
                embed_tokens(
                    analyze_text(t if isinstance(t, str) else "", cache),
                    dim,
                    hcache,
                )
                for t in b["text"]
            ]
            yield pd.DataFrame(
                {
                    "conv_id": b["conv_id"],
                    "turn_idx": b["turn_idx"],
                    "embedding": embs,
                }
            )

    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        kernel, EMBED_SCHEMA
    )


# ---------------------------------------------------------------------------
# conversation-level pooling (nested-document / join-field rollup)
# ---------------------------------------------------------------------------


def pool_vectors(vectors: list[list[float]]) -> list[float]:
    """Mean-pool a conversation's turn vectors (zero-norm turns
    excluded), L2-normalized.  Shared by the Spark kernel and the
    oracle; the sum is a deterministic np column sum over the
    turn-ordered matrix, so both sides are bit-identical."""
    mats = [np.asarray(v, dtype=np.float64) for v in vectors]
    mats = [m for m in mats if float((m * m).sum()) > 0.0]
    if not mats:
        return [0.0] * (len(vectors[0]) if vectors else 0)
    s = np.stack(mats).sum(axis=0) / float(len(mats))
    n = math.sqrt(float((s * s).sum()))
    if n > 0.0:
        s /= n
    return [float(x) for x in s]


def pool_conversations(embeddings: DataFrame) -> DataFrame:
    """(conv_id, embedding): one mean-pooled vector per conversation —
    the semantic twin of the reader's conversation collapse.  One
    shuffle on conv_id (the same key the index's doc-groups already
    co-locate); the kernel sorts each group by turn_idx so the float
    sum order is deterministic and oracle-replicable."""

    def kernel(_key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("turn_idx", kind="mergesort")
        return pd.DataFrame(
            {
                "conv_id": [pdf["conv_id"].iloc[0]],
                "embedding": [pool_vectors([list(v) for v in pdf["embedding"]])],
            }
        )

    return embeddings.select("conv_id", "turn_idx", "embedding").groupBy(
        "conv_id"
    ).applyInPandas(kernel, "conv_id string, embedding array<double>")


def hybrid_conversations(
    index,
    embeddings: DataFrame,
    query_text: str,
    k: int = 10,
    depth: int = 50,
    rrf_k: int = RRF_K,
    w_lex: float = 1.0,
    w_sem: float = 1.0,
    mode: str = "disjunctive",
    dim: int = 64,
) -> DataFrame:
    """Conversation-level hybrid: the reader's conversation-collapsed
    BM25 list (best turn per conversation) RRF-fused with cosine over
    the mean-pooled conversation embeddings → (conv_id, score).

    ``embeddings`` is the TURN table (pooling happens here); pass a
    pre-pooled (conv_id, embedding) table via
    ``pool_conversations(...)`` yourself to amortize the pooling
    shuffle across queries — it is a build-time artifact, like the
    index."""
    qv = embed_query(query_text, dim)
    lex = index.topk_conversations(query_text, mode, depth).select("conv_id", "score")
    lists: list[tuple[DataFrame, str, float]] = [(lex, "score", w_lex)]
    if any(v != 0.0 for v in qv):
        pooled = (
            embeddings
            if "turn_idx" not in embeddings.columns
            else pool_conversations(embeddings)
        )
        q = F.array(*[F.lit(float(v)) for v in qv])
        e = F.col("embedding")
        nrm = F.sqrt(_dot_fold(e, e))
        sem = (
            pooled.select(
                "conv_id", F.when(nrm > 0.0, _dot_fold(e, q) / nrm).alias("cos")
            )
            .filter(F.col("cos").isNotNull())
            .orderBy(F.desc("cos"), F.asc("conv_id"))
            .limit(depth)
        )
        lists.append((sem, "cos", w_sem))
    return rrf_fuse(lists, k, rrf_k, keys=("conv_id",))


# ---------------------------------------------------------------------------
# int8 scalar quantization (the ES dense_vector int8 quantization analog)
# ---------------------------------------------------------------------------


def quantize_vec(v: list[float]) -> tuple[list[int], float]:
    """Symmetric per-vector int8 quantization: q = round(v·127/amax),
    scale = amax/127 so v ≈ q·scale.  Shared by the Spark kernel and
    the pure-Python oracle.  A zero vector quantizes to zeros with
    scale 0."""
    amax = max((abs(float(x)) for x in v), default=0.0)
    if amax == 0.0:
        return [0] * len(v), 0.0
    s = amax / 127.0
    return [int(round(float(x) / s)) for x in v], s


def quantize_embeddings(embeddings: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, qvec array<tinyint>, qscale double): the
    storage-tier embedding table — **8× smaller** than array<double>
    per dimension, which at 100 TB is the difference between the
    semantic scan fitting in page cache or not.  One shuffle-free
    ``mapInPandas`` pass; dequantized cosine error is bounded by the
    per-dim step (≤ amax/254), verified in tests."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            qs, ss = [], []
            for v in b["embedding"]:
                q, s = quantize_vec(list(v))
                qs.append(q)
                ss.append(s)
            yield pd.DataFrame(
                {
                    "conv_id": b["conv_id"],
                    "turn_idx": b["turn_idx"],
                    "qvec": qs,
                    "qscale": ss,
                }
            )

    return embeddings.select(*_KEYS, "embedding").mapInPandas(
        kernel,
        "conv_id string, turn_idx int, qvec array<tinyint>, qscale double",
    )


def quantized_semantic_topk(
    qembeddings: DataFrame,
    query_vec: list[float],
    depth: int,
    rerank_with: DataFrame | None = None,
    oversample: int = 3,
    scope: DataFrame | None = None,
) -> DataFrame:
    """(conv_id, turn_idx, cos): cosine top-`depth` over the int8
    quantized table.

    The scan-side math is integer dot products scaled once per vector
    (cos ≈ qscaleᵥ·Σ qᵥᵢ·qqᵢ / ‖v_deq‖, all JVM expressions over
    tinyint arrays — the full-precision table is never read).  With
    ``rerank_with`` (the float table), the quantized pass only ranks
    ``oversample·depth`` candidates and the winners are re-scored
    exactly — the ES quantized-HNSW rescore pattern; results then carry
    EXACT cosines (comparable with :func:`semantic_topk` ranks)."""
    qq, _qs = quantize_vec(query_vec)
    qcol = F.array(*[F.lit(int(x)).cast("int") for x in qq])
    qv = F.transform(F.col("qvec"), lambda x: x.cast("int"))
    # dequantized norm = qscale·sqrt(Σ q²); the scalar factors cancel in
    # ranking but keep cos in [-1, 1] for thresholds
    idot = F.aggregate(
        F.zip_with(qv, qcol, lambda a, b: a * b), F.lit(0), lambda a, x: a + x
    ).cast("double")
    qnorm = F.sqrt(
        F.aggregate(
            F.zip_with(qv, qv, lambda a, b: a * b), F.lit(0), lambda a, x: a + x
        ).cast("double")
    )
    qq_norm = math.sqrt(sum(x * x for x in qq)) or 1.0
    if scope is not None:
        qembeddings = qembeddings.join(
            scope.select(*_KEYS).dropDuplicates(list(_KEYS)), list(_KEYS), "left_semi"
        )
    approx = (
        qembeddings.select(
            *_KEYS,
            F.when(qnorm > 0.0, idot / (qnorm * F.lit(qq_norm))).alias("cos"),
        )
        .filter(F.col("cos").isNotNull())
        .orderBy(F.desc("cos"), *[F.asc(c) for c in _KEYS])
        .limit(depth * oversample if rerank_with is not None else depth)
    )
    if rerank_with is None:
        return approx
    cand = rerank_with.join(
        F.broadcast(approx.select(*_KEYS)), list(_KEYS), "left_semi"
    )
    return semantic_topk(cand, query_vec, depth)


# ---------------------------------------------------------------------------
# ANN acceleration of the semantic leg
# ---------------------------------------------------------------------------

#: composite doc key inside the vec_id-keyed ANN index machinery
_KEY_SEP = "\x1f"


def write_turn_ann_index(
    embeddings: DataFrame,
    path: str,
    dim: int,
    bits: int = 4,
    tables: int = 8,
    seed: int = 42,
) -> None:
    """Persist the LSH ANN index over a (conv_id, turn_idx, embedding)
    table — the scale path for the hybrid semantic leg.

    Reuses the ids-only (table, bucket)-partitioned index machinery
    (pipeline/similarity.write_ann_index, incl. its ``_meta`` parameter
    sidecar and small-files repartition) by encoding the turn key as a
    composite ``vec_id``; zero-norm vectors are excluded at build time
    (they carry no signal and their sign pattern is degenerate)."""
    from .similarity import write_ann_index

    e = F.col("embedding")
    keyed = embeddings.filter(F.sqrt(_dot_fold(e, e)) > 0.0).select(
        F.concat_ws(_KEY_SEP, F.col("conv_id"), F.col("turn_idx")).alias("vec_id"),
        "embedding",
    )
    write_ann_index(keyed, path, dim, bits, tables, seed)


def ann_semantic_topk(
    embeddings: DataFrame,
    index_path: str | list[str],
    query_vec: list[float],
    depth: int,
    scope: DataFrame | None = None,
) -> DataFrame:
    """(conv_id, turn_idx, cos): ANN-accelerated cosine top-`depth` —
    a partition-pruned read of the query's probe cells from the
    persisted index, candidate keys broadcast-semi-joined back to the
    embedding table, exact cosine rerank of candidates only (the same
    tie-break and fold order as :func:`semantic_topk`, so fusion ranks
    are comparable).  Approximate with the ANN recall profile of the
    underlying LSH index (probed at 1M vectors in SCALE_PROBE.json);
    ``scope`` composes the filtered-kNN semi-join on the candidates.

    ``index_path`` may be a list of segment roots (base + deltas from
    ``similarity.extend_ann_index`` — the same LSM freshness story as
    the vec_id ANN index; parameter compatibility fails loud).
    Deletions need no tombstones here: candidates semi-join the CURRENT
    embedding table, so removing a turn's embedding row removes it from
    every probe, and ``similarity.compact_ann_index`` drops its stale
    signatures physically."""
    from .similarity import (
        _probe_predicate,
        _read_ann_segments,
        query_buckets,
        read_ann_index,
    )

    spark = embeddings.sparkSession
    if isinstance(index_path, (list, tuple)):
        sigs, meta = _read_ann_segments(spark, list(index_path))
        if meta["dim"] != len(query_vec):
            raise ValueError(
                f"query dim {len(query_vec)} != index dim {meta['dim']}"
            )
    else:
        sigs, meta = read_ann_index(spark, index_path, dim=len(query_vec))
    parts = F.split(F.col("vec_id"), _KEY_SEP)
    cand_keys = (
        sigs.filter(
            _probe_predicate(
                query_buckets(query_vec, meta["bits"], meta["tables"], meta["seed"])
            )
        )
        .select("vec_id")
        .dropDuplicates(["vec_id"])
        .select(
            parts.getItem(0).alias("conv_id"),
            parts.getItem(1).cast("int").alias("turn_idx"),
        )
    )
    cand = embeddings.join(F.broadcast(cand_keys), list(_KEYS), "left_semi")
    return semantic_topk(cand, query_vec, depth, scope=scope)


# ---------------------------------------------------------------------------
# fusion
# ---------------------------------------------------------------------------

#: deterministic doc tie-break, shared by every ranking below
_KEYS = ("conv_id", "turn_idx")


def _with_rank(
    df: DataFrame, score_col: str, keys: tuple[str, ...] = _KEYS
) -> DataFrame:
    """1-based rank by (score desc, *keys).  Single-partition window —
    safe because every input is an already-LIMITed top-depth list (see
    module docstring), never a corpus-sized relation."""
    w = Window.orderBy(F.desc(score_col), *[F.asc(k) for k in keys])
    return df.withColumn("rank", F.row_number().over(w))


def rrf_fuse(
    lists: list[tuple[DataFrame, str, float]],
    k: int = 10,
    rrf_k: int = RRF_K,
    keys: tuple[str, ...] = _KEYS,
) -> DataFrame:
    """Reciprocal-rank fusion of ranked lists.

    ``lists`` is [(df, score_col, weight)]; each df carries the ``keys``
    columns / its score column and is already truncated to retrieval
    depth.  Returns (*keys, score) — score = Σ w/(rrf_k + rank) over
    the lists the doc appears in — top-k, ties broken by key.
    """
    parts = [
        _with_rank(df.select(*keys, score_col), score_col, keys).select(
            *keys,
            (F.lit(float(w)) / (F.lit(float(rrf_k)) + F.col("rank"))).alias(
                "contrib"
            ),
        )
        for df, score_col, w in lists
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy(*keys)
        .agg(F.sum("contrib").alias("score"))
        .orderBy(F.desc("score"), *[F.asc(c) for c in keys])
        .limit(k)
    )


def linear_fuse(
    lists: list[tuple[DataFrame, str, float]],
    k: int = 10,
) -> DataFrame:
    """Min-max-normalized weighted-sum fusion (OpenSearch ``min_max`` +
    ``arithmetic_mean``): each list's scores map to [0, 1] via
    (s - min)/(max - min) (constant list → 1.0), then
    score = Σ wᵢ·normᵢ / Σ wᵢ with missing-from-list = 0."""
    total_w = sum(w for _, _, w in lists)
    parts = []
    for df, score_col, w in lists:
        s = F.col(score_col).cast("double")
        # per-list min/max over ≤ depth rows: an unpartitioned window is
        # the cheapest correct plan at this cardinality
        wspec = Window.partitionBy()
        lo, hi = F.min(s).over(wspec), F.max(s).over(wspec)
        norm = F.when(hi > lo, (s - lo) / (hi - lo)).otherwise(F.lit(1.0))
        parts.append(
            df.select(*_KEYS, (F.lit(float(w)) * norm).alias("contrib"))
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy(*_KEYS)
        .agg((F.sum("contrib") / F.lit(float(total_w))).alias("score"))
        .orderBy(F.desc("score"), *[F.asc(c) for c in _KEYS])
        .limit(k)
    )


# ---------------------------------------------------------------------------
# end-to-end hybrid query
# ---------------------------------------------------------------------------


def _dot_fold(a, b):
    """Left-fold dot product (F.aggregate) — the oracle mirrors this
    exact summation order so near-tie ranks can't diverge by ulps."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def semantic_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    depth: int,
    scope: DataFrame | None = None,
) -> DataFrame:
    """(conv_id, turn_idx, cos): exact cosine top-`depth` over a
    (conv_id, turn_idx, embedding) table.  Zero-norm vectors (empty
    docs) are excluded — they carry no semantic signal.  One narrow
    scan + TakeOrderedAndProject; the LSH/IVF indexes in
    pipeline/similarity.py are the drop-in scale path.

    ``scope`` (a DataFrame with conv_id/turn_idx — typically the corpus
    metadata filtered by a structured predicate) is the ES *filtered
    kNN* semantics: the filter applies DURING search, so the k results
    are the best among matching docs, not a post-filter of an unscoped
    top-k.  Executed as a semi-join BEFORE the cosine math — scores are
    never computed for out-of-scope vectors, and cost tracks filter
    selectivity."""
    if scope is not None:
        embeddings = embeddings.join(
            scope.select(*_KEYS).dropDuplicates(list(_KEYS)), list(_KEYS), "left_semi"
        )
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    e = F.col("embedding")
    nrm = F.sqrt(_dot_fold(e, e))
    return (
        embeddings.select(
            *_KEYS,
            F.when(nrm > 0.0, _dot_fold(e, q) / nrm).alias("cos"),
        )
        .filter(F.col("cos").isNotNull())
        .orderBy(F.desc("cos"), *[F.asc(c) for c in _KEYS])
        .limit(depth)
    )


def hybrid_topk(
    index,
    embeddings: DataFrame,
    query_text: str,
    k: int = 10,
    depth: int = 50,
    method: str = "rrf",
    rrf_k: int = RRF_K,
    w_lex: float = 1.0,
    w_sem: float = 1.0,
    mode: str = "disjunctive",
    query_vec: list[float] | None = None,
    dim: int = 64,
    scope: DataFrame | None = None,
    ann_index: str | list[str] | None = None,
    spec=None,
) -> DataFrame:
    """BM25 ∪ vector top-k, fused → (conv_id, turn_idx, score).

    ``ann_index`` (a :func:`write_turn_ann_index` path, or a list of
    base+delta segment roots) switches the semantic leg from the
    brute-force scan to the partition-pruned ANN probe — the 100 TB
    path; the fusion is unchanged (any top-`depth` semantic list fuses
    the same way).

    Two top-`depth` retrievals — the index's own lexical path
    (``index.topk``) and :func:`semantic_topk` over ``embeddings`` —
    fused by ``method`` ("rrf" or "linear").  ``query_vec`` defaults to
    :func:`embed_query` of the query text (dual-encoder symmetry); pass
    an external vector to search someone else's embedding space.  The
    query vector is a driver-side constant folded into the plan — no
    extra job, no shuffle beyond the two retrievals' own.

    ``scope`` applies the same metadata filter to BOTH legs (the
    reader's filter-context scope on the lexical side, the filtered-kNN
    semi-join on the semantic side), so the fused ranking is over
    exactly the in-scope docs.
    """
    if method not in ("rrf", "linear"):
        raise ValueError(f"unknown fusion method {method!r}")
    qv = query_vec if query_vec is not None else embed_query(query_text, dim)
    lex = index.topk(query_text, mode, depth, scope=scope, spec=spec).select(*_KEYS, "score")
    lists: list[tuple[DataFrame, str, float]] = [(lex, "score", w_lex)]
    if any(v != 0.0 for v in qv):
        sem = (
            ann_semantic_topk(embeddings, ann_index, qv, depth, scope=scope)
            if ann_index
            else semantic_topk(embeddings, qv, depth, scope=scope)
        )
        lists.append((sem, "cos", w_sem))
    if method == "rrf":
        fused = rrf_fuse(lists, k, rrf_k)
    else:
        fused = linear_fuse(lists, k)
    return fused.select(*_KEYS, F.col("score").cast("double").alias("score"))
