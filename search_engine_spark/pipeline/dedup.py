"""Deduplication operators for training-data pipelines.

All hot paths are built-in Spark SQL expressions (JVM, codegen); no
Python UDFs anywhere.  Designed for 100 TB corpora: every method is a
shuffle-on-key groupBy/join — no driver-side state, no cross-product
except *within* LSH buckets (whose size is bounded by design).

Methods
-------
exact            md5(normalized text) groupBy — one shuffle.
ngram jaccard    shingle self-join: |A∩B| via join on shingle,
                 |A∪B| = |A|+|B|−|A∩B|.  Exact but O(pairs sharing a
                 shingle); used as the verifier for the sketch methods.
minhash + LSH    k permutation-free min-hashes h_i = min((a_i·x+b_i) mod p)
                 over shingle hashes x, banded; candidate pairs join on
                 (band_id, band_hash) — only colliding docs ever meet.
simhash          64-bit sign-of-weighted-sum fingerprint; near-dup =
                 hamming distance ≤ r, candidates via 4×16-bit chunk
                 banding (pigeonhole: r<4 ⇒ some chunk equal).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..functions import rnd

# 2^31−1: keeps (a·x + b) < 2^62 so the JVM long multiply never
# overflows under ANSI mode
MERSENNE_P = (1 << 31) - 1

# Number of SimHash bits.  60 (not 64) so the fingerprint is the first
# 15 hex chars of md5 — positive in a signed long on both engines, no
# unsigned/sign-extension divergence between Spark and the SQL oracle.
SIMHASH_BITS = 60
SIMHASH_CHUNKS = 4  # 4 × 15-bit chunks; pigeonhole covers hamming ≤ 3


def h60(col):
    """60-bit integer hash both engines compute identically.

    Spark:  conv(substring(md5(x), 1, 15), 16, 10)::long
    DuckDB: ('0x' || substr(md5(x), 1, 15))::UBIGINT::BIGINT
    md5 is bytewise-identical across engines, so sketches built on h60
    are fully oracle-checkable (unlike xxhash64, which DuckDB lacks).
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


H60_SQL = "('0x' || substr(md5({x}), 1, 15))::UBIGINT::BIGINT"


def normalized(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))).alias("norm")
    )


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Groups of byte-identical (normalized) docs: (content_hash, n_docs, keep_doc)."""
    return (
        normalized(docs)
        .groupBy(F.md5("norm").alias("content_hash"))
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc"))
    )


def shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle)."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda x: x != F.lit("")
    )
    # shingle i = tokens[i : i+n] joined — array transform over a sequence
    # of start offsets; narrow (no shuffle until the final distinct)
    return (
        docs.select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= n)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice("t", i, n)),
                )
            ).alias("shingle"),
        )
        .distinct()
    )


def _jaccard_from_inter(inter: DataFrame, sizes: DataFrame, threshold: float) -> DataFrame:
    """(doc_a, doc_b, inter) + per-doc sizes → thresholded Jaccard pairs."""
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sa"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sb"), "doc_b")
        .withColumn(
            "jaccard",
            rnd(
                F.col("inter").cast("double")
                / (F.col("sa") + F.col("sb") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs over n-gram shingle sets (a < b).

    ``max_shingle_df`` caps the document frequency of shingles entering
    the self-join (standard near-dup practice: a shingle in ``d`` docs
    yields O(d²) join rows, so one stopword trigram shared by 10⁶ docs
    would explode the join at corpus scale).  ``None`` keeps the exact
    all-shingles semantics; set it when running at scale — union sizes
    still count every shingle, so capped Jaccard is a lower bound.
    """
    sh = shingles(docs, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    joinable = sh
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        joinable = sh.join(F.broadcast(hot), "shingle", "left_anti")
    inter = (
        joinable.alias("x")
        .join(joinable.alias("y"), F.col("x.shingle") == F.col("y.shingle"))
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    return _jaccard_from_inter(inter, sizes, threshold)


def jaccard_for_pairs(
    pairs: DataFrame, docs: DataFrame, n: int = 3, threshold: float = 0.0
) -> DataFrame:
    """Exact Jaccard computed ONLY for the given (doc_a, doc_b) pairs.

    The candidate-verification primitive: shingles are semi-joined down
    to the docs that appear in any pair, packed into one set array per
    candidate doc, and each pair intersects two arrays JVM-side — cost
    is O(candidate pairs × shingles/doc), never the
    all-co-shingling-pairs blowup of the exact self-join.
    """
    sh = shingles(docs, n)
    cand_docs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sets = (
        sh.join(cand_docs, "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("ss"))
    )
    joined = (
        pairs.join(sets.select(F.col("doc_id").alias("doc_a"), F.col("ss").alias("sa")), "doc_a")
        .join(sets.select(F.col("doc_id").alias("doc_b"), F.col("ss").alias("sb")), "doc_b")
    )
    inter = F.size(F.array_intersect("sa", "sb"))
    jac = rnd(
        inter.cast("double")
        / (F.size("sa") + F.size("sb") - inter).cast("double"),
        6,
    )
    return (
        joined.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _hash_params(num_hashes: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_P, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, MERSENNE_P, size=num_hashes, dtype=np.int64)
    return a, b


def minhash_signatures(docs: DataFrame, num_hashes: int = 32, n: int = 3, seed: int = 42) -> DataFrame:
    """(doc_id, sig array<long>) — k min-hashes, entirely JVM-side.

    h_i(x) = (a_i·x + b_i) mod 2^31−1 over x = h60(shingle) mod 2^31−1 —
    one groupBy with k min() aggregates; no Python, one shuffle.  The
    md5-derived shingle hash is reproducible in the SQL oracle.
    """
    a, b = _hash_params(num_hashes, seed)
    sh = shingles(docs, n).withColumn("hx", h60("shingle") % F.lit(MERSENNE_P))
    aggs = [
        F.min(
            (F.col("hx") * F.lit(int(a[i])) + F.lit(int(b[i]))) % F.lit(MERSENNE_P)
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    wide = sh.groupBy("doc_id").agg(*aggs)
    return wide.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """MinHash-LSH candidate generation + exact-Jaccard verification.

    bands × rows layout (rows = num_hashes/bands); candidates = pairs
    colliding in ≥1 band; survivors verified with exact shingle Jaccard
    computed ONLY for candidate pairs (never trust the sketch at the
    boundary, never do all-pairs work — verification cost is bounded by
    the candidate count, which is what makes LSH an LSH at 100 TB).
    Returns (doc_a, doc_b, jaccard ≥ threshold).
    """
    rows = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, n, seed)
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        h60(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", bi * rows + ri + 1).cast("string")
                                    for ri in range(rows)
                                ],
                            )
                        ).alias("bh"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bh"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    return jaccard_for_pairs(cand, docs, n, threshold)


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """60-bit SimHash per doc from token hashes — (doc_id, simhash long).

    bit_b(doc) = 1 iff Σ_tokens (2·bit_b(h60(tok)) − 1) · tf > 0.
    60 conditional-sum aggregates in one groupBy; pure JVM.  60 bits
    (the md5-derived h60) keeps the fingerprint positive in a signed
    long on both engines, so the SQL oracle reproduces it exactly.
    """
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda x: x != F.lit("")
    )
    t = docs.select("doc_id", F.explode(toks).alias("token")).withColumn(
        "hx", h60("token")
    )
    aggs = [
        F.sum(
            F.when(F.shiftright("hx", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    wide = t.groupBy("doc_id").agg(*aggs)
    fp = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        fp = fp + F.when(F.col(f"s{b}") > 0, F.lit(2**b).cast("long")).otherwise(0)
    return wide.select("doc_id", fp.alias("simhash"))


_CHUNK_BITS = SIMHASH_BITS // SIMHASH_CHUNKS  # 15
_CHUNK_MASK = (1 << _CHUNK_BITS) - 1


def simhash_near_dup_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Pairs with hamming(simhash) ≤ r via 4×15-bit chunk banding.

    Pigeonhole: r < 4 ⇒ at least one of 4 chunks is identical, so the
    join on (chunk_id, chunk_value) finds every qualifying pair without
    a cross-product.  Verified with bit_count(xor).
    """
    fp = simhash_fingerprints(docs)
    chunks = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned("simhash", _CHUNK_BITS * c)
                        .bitwiseAND(F.lit(_CHUNK_MASK))
                        .alias("cv"),
                    )
                    for c in range(SIMHASH_CHUNKS)
                ]
            )
        ).alias("cc"),
    ).select("doc_id", "simhash", F.col("cc.chunk").alias("chunk"), F.col("cc.cv").alias("cv"))
    pairs = (
        chunks.alias("x")
        .join(chunks.alias("y"), ["chunk", "cv"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs
