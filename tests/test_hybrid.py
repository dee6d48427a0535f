"""Hybrid retrieval (pipeline/hybrid.py) vs the pure-Python oracle.

The embedder is checked bit-exactly (the Spark mapInPandas kernel and
the oracle share embed_tokens, so any divergence is plumbing); the
fused rankings (RRF and min-max linear, symmetric and asymmetric
weights) are checked against oracle_hybrid_topk, whose lexical side is
the rank-identical pure-Python BM25 scorer and whose cosine side
mirrors the engine's left-fold summation order.  Edge cases: a
stopword-only query (zero query vector → lexical-only fusion) and a
query with no lexical hits (semantic-only ranking still returns).
"""

from __future__ import annotations

import math

import pytest

from search_engine_spark.config import BuildConfig
from search_engine_spark.corpus import generate_transcripts
from search_engine_spark.index.build import build_index
from search_engine_spark.index.reader import CompressedIndex
from search_engine_spark.oracle import (
    build_oracle_index,
    oracle_hybrid_topk,
    oracle_semantic_topk,
)  # noqa: F401  (oracle_semantic_topk used by the scoped tests)
from search_engine_spark.pipeline.hybrid import (
    embed_query,
    embed_tokens,
    hash_embed,
    hybrid_topk,
    semantic_topk,
)

DIM = 16

QUERIES = [
    ("term0001 term0002", "disjunctive"),
    ("term0003 term0004", "conjunctive"),
    ("term0010", "disjunctive"),
]


@pytest.fixture(scope="module")
def xs_pdf():
    return generate_transcripts("xs")


@pytest.fixture(scope="module")
def xs_df(spark, xs_pdf):
    return spark.createDataFrame(xs_pdf).cache()


@pytest.fixture(scope="module")
def xs_index(spark, xs_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("hybrid") / "idx")
    build_index(spark, xs_df, out, BuildConfig(num_groups=2))
    return CompressedIndex(spark, out)


@pytest.fixture(scope="module")
def xs_oracle(xs_pdf):
    return build_oracle_index(xs_pdf)


@pytest.fixture(scope="module")
def xs_emb(spark, xs_df):
    return hash_embed(xs_df, DIM).cache()


def _rows(df) -> list[tuple]:
    return [(r.conv_id, r.turn_idx, round(r.score, 9)) for r in df.collect()]


def _want(oracle, q, mode, **kw) -> list[tuple]:
    return [
        (c, t, round(s, 9))
        for (c, t), s in oracle_hybrid_topk(oracle, q, mode=mode, dim=DIM, **kw)
    ]


def test_embedder_parity(xs_emb, xs_oracle):
    """Spark kernel embeddings are bit-identical to the shared
    embed_tokens over the oracle's analyzed token lists."""
    got = {(r.conv_id, r.turn_idx): list(r.embedding) for r in xs_emb.collect()}
    assert set(got) == set(xs_oracle.tokens)
    for key, toks in xs_oracle.tokens.items():
        assert got[key] == embed_tokens(toks, DIM), key


def test_embedder_unit_norm(xs_oracle):
    for toks in list(xs_oracle.tokens.values())[:20]:
        v = embed_tokens(toks, DIM)
        n = math.sqrt(sum(x * x for x in v))
        assert n == 0.0 or abs(n - 1.0) < 1e-12


def test_semantic_topk_parity(xs_emb, xs_oracle):
    qv = embed_query("term0001 term0002", DIM)
    got = [(r.conv_id, r.turn_idx, round(r.cos, 9)) for r in
           semantic_topk(xs_emb, qv, 15).collect()]
    want = [(c, t, round(s, 9))
            for (c, t), s in oracle_semantic_topk(xs_oracle, qv, 15, DIM)]
    assert got == want


@pytest.mark.parametrize("q,mode", QUERIES)
def test_rrf_parity(xs_index, xs_emb, xs_oracle, q, mode):
    got = _rows(hybrid_topk(xs_index, xs_emb, q, k=10, depth=20,
                            method="rrf", mode=mode, dim=DIM))
    assert got == _want(xs_oracle, q, mode, k=10, depth=20, method="rrf")


@pytest.mark.parametrize("q,mode", QUERIES[:2])
def test_linear_parity(xs_index, xs_emb, xs_oracle, q, mode):
    got = _rows(hybrid_topk(xs_index, xs_emb, q, k=10, depth=20,
                            method="linear", mode=mode, dim=DIM))
    assert got == _want(xs_oracle, q, mode, k=10, depth=20, method="linear")


def test_asymmetric_weights(xs_index, xs_emb, xs_oracle):
    q, mode = QUERIES[0]
    got = _rows(hybrid_topk(xs_index, xs_emb, q, k=10, depth=20, method="rrf",
                            mode=mode, dim=DIM, w_lex=2.0, w_sem=0.5))
    assert got == _want(xs_oracle, q, mode, k=10, depth=20, method="rrf",
                        w_lex=2.0, w_sem=0.5)
    # and the weights actually matter: all-lexical ≠ balanced on this corpus
    balanced = _rows(hybrid_topk(xs_index, xs_emb, q, k=10, depth=20,
                                 method="rrf", mode=mode, dim=DIM))
    assert got != balanced


def test_stopword_only_query_is_lexical_only(xs_index, xs_emb, xs_oracle):
    """'the' analyzes to nothing → zero query vector → the semantic list
    is dropped and the fusion degrades to pure-lexical RRF; with no
    lexical hits either, the result is empty rather than an error."""
    assert embed_query("the", DIM) == [0.0] * DIM
    assert _rows(hybrid_topk(xs_index, xs_emb, "the", k=5, dim=DIM)) == []


def test_no_lexical_hits_still_ranks_semantically(xs_index, xs_emb, xs_oracle):
    """An out-of-vocabulary term has zero BM25 hits but a nonzero hash
    embedding — hybrid still returns the semantic neighbors."""
    q = "zzqunknownword"
    got = _rows(hybrid_topk(xs_index, xs_emb, q, k=5, depth=10, dim=DIM))
    assert got == _want(xs_oracle, q, "disjunctive", k=5, depth=10, method="rrf")
    assert len(got) == 5


def test_scoped_semantic_topk(xs_df, xs_emb, xs_oracle, xs_pdf):
    """Filtered kNN: the scope restricts candidates BEFORE ranking, so
    results are the best among in-scope docs — not a post-filter."""
    from pyspark.sql import functions as F

    qv = embed_query("term0001 term0002", DIM)
    scope_df = xs_df.filter(F.col("role") == "user")
    scope = set(
        zip(xs_pdf[xs_pdf.role == "user"].conv_id,
            xs_pdf[xs_pdf.role == "user"].turn_idx)
    )
    got = [(r.conv_id, r.turn_idx, round(r.cos, 9)) for r in
           semantic_topk(xs_emb, qv, 10, scope=scope_df).collect()]
    want = [(c, t, round(s, 9)) for (c, t), s in
            oracle_semantic_topk(xs_oracle, qv, 10, DIM, scope=scope)]
    assert got == want
    # and it differs from post-filtering the unscoped list
    unscoped = semantic_topk(xs_emb, qv, 10).collect()
    post = [(r.conv_id, r.turn_idx) for r in unscoped
            if (r.conv_id, r.turn_idx) in scope]
    assert len(post) < len(got)


def test_scoped_hybrid(xs_index, xs_df, xs_emb, xs_oracle, xs_pdf):
    """scope applies to BOTH fusion legs (filter-context lexical +
    filtered-kNN semantic)."""
    from pyspark.sql import functions as F

    q, mode = QUERIES[0]
    scope_df = xs_df.filter(F.col("role") == "user")
    scope = set(
        zip(xs_pdf[xs_pdf.role == "user"].conv_id,
            xs_pdf[xs_pdf.role == "user"].turn_idx)
    )
    got = _rows(hybrid_topk(xs_index, xs_emb, q, k=10, depth=20,
                            mode=mode, dim=DIM, scope=scope_df))
    assert got == _want(xs_oracle, q, mode, k=10, depth=20, method="rrf",
                        scope=scope)
    assert all((c, t) in scope for c, t, _ in got)
    assert len(got) == 10


def test_unknown_method_raises(xs_index, xs_emb):
    with pytest.raises(ValueError):
        hybrid_topk(xs_index, xs_emb, "term0001", method="nope", dim=DIM)


def test_determinism(xs_index, xs_emb):
    q, mode = QUERIES[0]
    a = _rows(hybrid_topk(xs_index, xs_emb, q, mode=mode, dim=DIM))
    b = _rows(hybrid_topk(xs_index, xs_emb, q, mode=mode, dim=DIM))
    assert a == b and len(a) == 10


# ------------------------------------------------------------------ ANN leg


@pytest.fixture(scope="module")
def xs_ann(xs_emb, tmp_path_factory):
    from search_engine_spark.pipeline.hybrid import write_turn_ann_index

    path = str(tmp_path_factory.mktemp("hyb_ann") / "ann")
    write_turn_ann_index(xs_emb, path, DIM, bits=2, tables=8)
    return path


def test_ann_semantic_exact_on_candidates(xs_emb, xs_ann, xs_oracle):
    """Every ANN hit's cosine equals the brute-force cosine for that key
    (the probe only prunes candidates, the rerank is exact), and the
    hit set is a subset of the corpus' nonzero-norm docs."""
    from search_engine_spark.pipeline.hybrid import ann_semantic_topk

    qv = embed_query("term0001 term0002", DIM)
    got = {(r.conv_id, r.turn_idx): r.cos
           for r in ann_semantic_topk(xs_emb, xs_ann, qv, 15).collect()}
    assert got
    brute = {(c, t): s for (c, t), s in
             oracle_semantic_topk(xs_oracle, qv, 10**6, DIM)}
    for key, cos in got.items():
        assert cos == brute[key], key


def test_ann_semantic_recall(xs_emb, xs_ann, xs_oracle):
    """Deterministic recall floor on the fixed corpus/seed: the ANN
    top-10 recovers most of the brute-force top-10 (8 tables × 2 bits)."""
    from search_engine_spark.pipeline.hybrid import ann_semantic_topk

    qv = embed_query("term0001 term0002", DIM)
    got = {(r.conv_id, r.turn_idx)
           for r in ann_semantic_topk(xs_emb, xs_ann, qv, 10).collect()}
    want = {(c, t) for (c, t), _ in oracle_semantic_topk(xs_oracle, qv, 10, DIM)}
    recall = len(got & want) / len(want)
    assert recall >= 0.5, recall


def test_hybrid_with_ann_index(xs_index, xs_emb, xs_ann):
    """hybrid_topk(ann_index=...) fuses the ANN semantic list exactly
    like the manual composition of the two legs."""
    from search_engine_spark.pipeline.hybrid import (
        ann_semantic_topk,
        rrf_fuse,
    )

    q = "term0001 term0002"
    qv = embed_query(q, DIM)
    got = _rows(hybrid_topk(xs_index, xs_emb, q, k=10, depth=20, dim=DIM,
                            ann_index=xs_ann))
    lex = xs_index.topk(q, "disjunctive", 20).select("conv_id", "turn_idx", "score")
    sem = ann_semantic_topk(xs_emb, xs_ann, qv, 20)
    want = [(r.conv_id, r.turn_idx, round(r.score, 9))
            for r in rrf_fuse([(lex, "score", 1.0), (sem, "cos", 1.0)], 10).collect()]
    assert got == want and len(got) == 10


def test_turn_ann_index_excludes_zero_norm(spark, xs_emb, xs_ann, xs_pdf):
    """Empty-text turns (zero vectors) never enter the index."""
    from search_engine_spark.pipeline.similarity import read_ann_index

    sigs, meta = read_ann_index(spark, xs_ann, dim=DIM)
    assert meta["bits"] == 2 and meta["tables"] == 8
    indexed = {tuple(r.vec_id.split("\x1f")) for r in sigs.collect()}
    empties = {(c, str(t)) for c, t in
               zip(xs_pdf[xs_pdf.text == ""].conv_id,
                   xs_pdf[xs_pdf.text == ""].turn_idx)}
    assert empties and not (indexed & empties)


def test_ann_semantic_scope_composes(xs_df, xs_emb, xs_ann):
    from pyspark.sql import functions as F

    from search_engine_spark.pipeline.hybrid import ann_semantic_topk

    qv = embed_query("term0001 term0002", DIM)
    scope_df = xs_df.filter(F.col("role") == "user")
    got = ann_semantic_topk(xs_emb, xs_ann, qv, 10, scope=scope_df).collect()
    scope = {(r.conv_id, r.turn_idx) for r in scope_df.select("conv_id", "turn_idx").collect()}
    assert got and all((r.conv_id, r.turn_idx) in scope for r in got)


def test_ann_index_dim_mismatch_fails_loud(xs_emb, xs_ann):
    from search_engine_spark.pipeline.hybrid import ann_semantic_topk

    with pytest.raises(ValueError):
        ann_semantic_topk(xs_emb, xs_ann, [1.0] * (DIM + 1), 10)


def test_ann_segments_equal_rebuild(spark, xs_df, xs_emb, tmp_path_factory):
    """LSM freshness for the turn ANN index: base over half the corpus
    + extend_ann_index delta over the rest == one rebuilt index, and a
    deleted embedding row vanishes from the probe without tombstones."""
    from pyspark.sql import functions as F

    from search_engine_spark.pipeline.hybrid import (
        ann_semantic_topk,
        write_turn_ann_index,
        _KEY_SEP,
    )
    from search_engine_spark.pipeline.similarity import extend_ann_index

    d = tmp_path_factory.mktemp("hyb_ann_lsm")
    convs = sorted(r.conv_id for r in xs_emb.select("conv_id").distinct().collect())
    half = set(convs[: len(convs) // 2])
    base_emb = xs_emb.filter(F.col("conv_id").isin(half))
    delta_emb = xs_emb.filter(~F.col("conv_id").isin(half))
    write_turn_ann_index(base_emb, str(d / "base"), DIM, bits=2, tables=8)
    e = F.col("embedding")
    nonzero = F.sqrt(F.aggregate(F.zip_with(e, e, lambda x, y: x * y),
                                 F.lit(0.0), lambda a, x: a + x)) > 0.0
    delta_keyed = delta_emb.filter(nonzero).select(
        F.concat_ws(_KEY_SEP, "conv_id", "turn_idx").alias("vec_id"), "embedding"
    )
    extend_ann_index(spark, str(d / "base"), delta_keyed, str(d / "delta"))
    write_turn_ann_index(xs_emb, str(d / "full"), DIM, bits=2, tables=8)

    qv = embed_query("term0001 term0002", DIM)
    seg = [(r.conv_id, r.turn_idx, round(r.cos, 9)) for r in
           ann_semantic_topk(xs_emb, [str(d / "base"), str(d / "delta")], qv, 10).collect()]
    full = [(r.conv_id, r.turn_idx, round(r.cos, 9)) for r in
            ann_semantic_topk(xs_emb, str(d / "full"), qv, 10).collect()]
    assert seg == full and len(seg) == 10

    # delete the top hit's embedding row: it disappears from the probe
    top_c, top_t, _ = seg[0]
    pruned_emb = xs_emb.filter(
        ~((F.col("conv_id") == top_c) & (F.col("turn_idx") == top_t))
    )
    after = [(r.conv_id, r.turn_idx) for r in
             ann_semantic_topk(pruned_emb, [str(d / "base"), str(d / "delta")], qv, 10).collect()]
    assert (top_c, top_t) not in after and len(after) == 10


# --------------------------------------------------------- int8 quantization


def test_quantize_roundtrip_error_bound(xs_oracle):
    """Dequantized vectors are within one quantization step per dim."""
    from search_engine_spark.pipeline.hybrid import quantize_vec

    checked = 0
    for toks in xs_oracle.tokens.values():
        v = embed_tokens(toks, DIM)
        q, s = quantize_vec(v)
        assert all(-127 <= x <= 127 for x in q)
        if s == 0.0:
            assert v == [0.0] * DIM
            continue
        for x, qx in zip(v, q):
            assert abs(x - qx * s) <= s / 2 + 1e-12
        checked += 1
    assert checked > 50


def test_quantized_table_parity(xs_emb, xs_oracle):
    """The Spark quantization kernel matches the shared quantize_vec."""
    from search_engine_spark.pipeline.hybrid import (
        quantize_embeddings,
        quantize_vec,
    )

    got = {(r.conv_id, r.turn_idx): (list(r.qvec), r.qscale)
           for r in quantize_embeddings(xs_emb).collect()}
    for key, toks in xs_oracle.tokens.items():
        q, s = quantize_vec(embed_tokens(toks, DIM))
        assert got[key] == (q, s), key


def test_quantized_semantic_recall_and_rerank(xs_emb, xs_oracle):
    """int8 scan recall vs exact is high on the fixed corpus, and the
    rerank_with pass returns EXACT cosines for its winners."""
    from search_engine_spark.pipeline.hybrid import (
        quantize_embeddings,
        quantized_semantic_topk,
    )

    qemb = quantize_embeddings(xs_emb).cache()
    qv = embed_query("term0001 term0002", DIM)
    exact = {(c, t): s for (c, t), s in oracle_semantic_topk(xs_oracle, qv, 10, DIM)}

    approx = quantized_semantic_topk(qemb, qv, 10)
    got_keys = {(r.conv_id, r.turn_idx) for r in approx.collect()}
    assert len(got_keys & set(exact)) >= 8  # deterministic, observed 10/10

    rer = quantized_semantic_topk(qemb, qv, 10, rerank_with=xs_emb)
    got = {(r.conv_id, r.turn_idx): r.cos for r in rer.collect()}
    full = {(c, t): s for (c, t), s in
            oracle_semantic_topk(xs_oracle, qv, 10**6, DIM)}
    for key, cos in got.items():
        assert cos == full[key], key
    assert len(got & exact.keys()) >= 9


def test_quantized_scope(xs_df, xs_emb):
    from pyspark.sql import functions as F

    from search_engine_spark.pipeline.hybrid import (
        quantize_embeddings,
        quantized_semantic_topk,
    )

    qemb = quantize_embeddings(xs_emb)
    qv = embed_query("term0001 term0002", DIM)
    scope_df = xs_df.filter(F.col("role") == "user")
    scope = {(r.conv_id, r.turn_idx)
             for r in scope_df.select("conv_id", "turn_idx").collect()}
    got = quantized_semantic_topk(qemb, qv, 10, rerank_with=xs_emb,
                                  scope=scope_df).collect()
    assert got and all((r.conv_id, r.turn_idx) in scope for r in got)


# ------------------------------------------------ conversation-level hybrid


def test_pooled_conversations_parity(xs_emb, xs_oracle):
    """Spark pooling kernel == shared pool_vectors over turn-ordered
    shared-embedder vectors, bit-exact."""
    from search_engine_spark.pipeline.hybrid import (
        pool_conversations,
        pool_vectors,
    )

    got = {r.conv_id: list(r.embedding)
           for r in pool_conversations(xs_emb).collect()}
    by_conv = {}
    for (conv, turn), toks in xs_oracle.tokens.items():
        by_conv.setdefault(conv, []).append((turn, embed_tokens(toks, DIM)))
    assert set(got) == set(by_conv)
    for conv, items in by_conv.items():
        assert got[conv] == pool_vectors([v for _t, v in sorted(items)]), conv


def test_hybrid_conversations_parity(xs_index, xs_emb, xs_oracle):
    from search_engine_spark.pipeline.hybrid import hybrid_conversations
    from search_engine_spark.oracle import oracle_hybrid_conversations

    got = [(r.conv_id, round(r.score, 9)) for r in
           hybrid_conversations(xs_index, xs_emb, "term0001 term0002",
                                k=10, depth=15, dim=DIM).collect()]
    want = [(c, round(s, 9)) for c, s in
            oracle_hybrid_conversations(xs_oracle, "term0001 term0002",
                                        k=10, depth=15, dim=DIM)]
    assert got == want and len(got) == 10


def test_hybrid_conversations_prepooled(xs_index, xs_emb):
    """Passing a pre-pooled table gives identical results (the pooling
    artifact amortizes across queries)."""
    from search_engine_spark.pipeline.hybrid import (
        hybrid_conversations,
        pool_conversations,
    )

    pooled = pool_conversations(xs_emb).cache()
    a = [(r.conv_id, round(r.score, 9)) for r in
         hybrid_conversations(xs_index, xs_emb, "term0003 term0004",
                              mode="conjunctive", dim=DIM).collect()]
    b = [(r.conv_id, round(r.score, 9)) for r in
         hybrid_conversations(xs_index, pooled, "term0003 term0004",
                              mode="conjunctive", dim=DIM).collect()]
    assert a == b and len(a) > 0
