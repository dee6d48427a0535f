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


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.8) -> DataFrame:
    """Exact Jaccard-similar pairs over n-gram shingle sets (a < b)."""
    sh = shingles(docs, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        sh.alias("x")
        .join(sh.alias("y"), F.col("x.shingle") == F.col("y.shingle"))
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
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


def _hash_params(num_hashes: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_P, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, MERSENNE_P, size=num_hashes, dtype=np.int64)
    return a, b


def minhash_signatures(docs: DataFrame, num_hashes: int = 32, n: int = 3, seed: int = 42) -> DataFrame:
    """(doc_id, sig array<long>) — k min-hashes, entirely JVM-side.

    h_i(x) = (a_i·x + b_i) mod 2^61−1 over x = xxhash64(shingle)&MAX —
    one groupBy with k min() aggregates; no Python, one shuffle.
    """
    a, b = _hash_params(num_hashes, seed)
    sh = shingles(docs, n).withColumn(
        "hx", F.abs(F.xxhash64("shingle")) % F.lit(MERSENNE_P)
    )
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
    (never trust the sketch at the boundary).  Returns
    (doc_a, doc_b, jaccard ≥ threshold).
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
                        F.xxhash64(
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
    exact = ngram_jaccard_pairs(docs, n, threshold=0.0)
    return (
        cand.join(exact, ["doc_a", "doc_b"])
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """64-bit SimHash per doc from token hashes — (doc_id, simhash long).

    bit_b(doc) = 1 iff Σ_tokens (2·bit_b(xxhash64(tok)) − 1) · tf > 0.
    64 conditional-sum aggregates in one groupBy; pure JVM.
    """
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda x: x != F.lit("")
    )
    t = docs.select("doc_id", F.explode(toks).alias("token")).withColumn(
        "hx", F.xxhash64("token")
    )
    aggs = [
        F.sum(
            F.when(F.shiftright("hx", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(64)
    ]
    wide = t.groupBy("doc_id").agg(*aggs)
    fp = F.lit(0).cast("long")
    for b in range(64):
        fp = fp + F.when(F.col(f"s{b}") > 0, F.lit(1).cast("long") * (2**b if b < 63 else -(2**63))).otherwise(0)
    return wide.select("doc_id", fp.alias("simhash"))


def simhash_near_dup_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Pairs with hamming(simhash) ≤ r via 4×16-bit chunk banding.

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
                        F.shiftrightunsigned("simhash", 16 * c)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("cv"),
                    )
                    for c in range(4)
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
