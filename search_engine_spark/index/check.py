"""Index integrity checker (fsck) — validate a compressed index root
against its own invariants without trusting any single artifact.

The reference exposes `/index-status` counters
(`ReindexController.java:106-155`) but has no consistency check — a
torn write or a bad copy surfaces only as wrong query results.  An
immutable columnar index can be audited cheaply, so this module
recomputes every derivable statistic from the posting blocks and
cross-checks the sidecar artifacts:

structural pass (metadata columns only — no blob decode):
  * per-term document frequency: Σ block ``n`` vs the idf table's
    ``df`` (both directions: missing/extra terms);
  * idf formula: ``ln((1+N)/(1+df)) + 1`` recomputed from meta's N;
  * corpus stats: doclen table Σ n_docs / Σ sum_dl vs meta
    ``n_docs`` / ``avgdl``;
  * bucket assignment: ``pmod(xxhash64(term), num_buckets)`` ==
    the partition value for every block row;
  * block layout: ``n > 0``, ``first_doc <= last_doc``,
    ``max_tf >= 1``, ``min_dl >= 1``, and within each (term, group)
    the ``block_id``-ordered doc ranges are strictly increasing and
    non-overlapping.

deep pass (``deep=True`` — decodes every blob, one Arrow kernel over
the same bucket-partitioned scan, still fully distributed):
  * decoded doc count == ``n``; docs strictly ascending; first/last
    match the stored metadata; every tf >= 1; ``max(tf) == max_tf``;
    ``min(dl) == min_dl``; position stream splits into exactly ``n``
    lists whose lengths equal the tfs, each strictly ascending.

Everything runs as Spark aggregations over the bucket-partitioned
postings scan — at 10^12 turns this is one pass over index bytes
(comparable to a compaction read), with per-term state only.
"""

from __future__ import annotations

import math
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .build import load_meta, IndexPaths

#: absolute idf tolerance — idf is stored as a double computed by the
#: same formula; allow for decimal/round-trip noise only
IDF_TOL = 1e-9


def _err_rows(df: DataFrame, label: str, cap: int = 5) -> list[str]:
    rows = df.limit(cap).collect()
    return [f"{label}: {r.asDict()}" for r in rows]


def check_index(
    spark: SparkSession, root: str, deep: bool = False
) -> dict:
    """Audit the index at ``root``; returns a report dict:

    ``{"ok": bool, "errors": [...], "checks": {name: count_or_flag}}``

    ``errors`` carries at most a few sample rows per failed check (the
    counts in ``checks`` are exact).  ``deep=True`` adds the
    blob-decode pass."""
    paths = IndexPaths(root)
    meta = load_meta(root)
    errors: list[str] = []
    checks: dict = {}

    allrows = spark.read.parquet(paths.postings)
    # per-group doclen blobs ride in the postings table as term IS NULL
    # rows (bucket -1) — validated separately, excluded from term checks
    post = allrows.filter(F.col("term").isNotNull())
    riders = allrows.filter(F.col("term").isNull())
    idf = spark.read.parquet(paths.idf)
    doclen = spark.read.parquet(paths.doclen)
    n_docs = int(meta["n_docs"])
    nb = int(meta.get("num_buckets", 64))

    bad_rider = riders.filter(F.col("bucket") != F.lit(-1))
    checks["rider_bucket_mismatches"] = bad_rider.count()
    if checks["rider_bucket_mismatches"]:
        errors += _err_rows(
            bad_rider.select("group", "bucket"), "doclen-rider bucket != -1"
        )

    # -- per-term df + idf formula ---------------------------------
    df_blocks = post.groupBy("term").agg(F.sum("n").alias("df_blocks"))
    joined = df_blocks.join(
        idf.select("term", "df", "idf"), "term", "full_outer"
    )
    bad_df = joined.filter(
        F.col("df_blocks").isNull()
        | F.col("df").isNull()
        | (F.col("df_blocks") != F.col("df"))
    )
    checks["df_mismatches"] = bad_df.count()
    if checks["df_mismatches"]:
        errors += _err_rows(bad_df, "df mismatch (blocks vs idf table)")
    expected_idf = F.log((F.lit(1.0) + F.lit(float(n_docs))) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)
    bad_idf = joined.filter(
        F.col("df").isNotNull()
        & (F.abs(F.col("idf") - expected_idf) > IDF_TOL)
    )
    checks["idf_mismatches"] = bad_idf.count()
    if checks["idf_mismatches"]:
        errors += _err_rows(bad_idf, "idf formula mismatch")

    # -- corpus stats ----------------------------------------------
    r = doclen.agg(
        F.sum("n_docs").alias("n"), F.sum("sum_dl").alias("tok")
    ).collect()[0]
    dl_n, dl_tok = int(r["n"] or 0), int(r["tok"] or 0)
    checks["n_docs_meta"] = n_docs
    checks["n_docs_doclen"] = dl_n
    if dl_n != n_docs:
        errors.append(f"meta n_docs {n_docs} != doclen table {dl_n}")
    avgdl = dl_tok / dl_n if dl_n else 0.0
    if abs(avgdl - float(meta["avgdl"])) > 1e-9:
        errors.append(f"meta avgdl {meta['avgdl']} != doclen-derived {avgdl}")

    # -- bucket assignment -----------------------------------------
    bad_bucket = post.filter(
        F.pmod(F.xxhash64("term"), F.lit(nb)) != F.col("bucket")
    )
    checks["bucket_mismatches"] = bad_bucket.count()
    if checks["bucket_mismatches"]:
        errors += _err_rows(
            bad_bucket.select("term", "bucket"), "bucket mismatch"
        )

    # -- block layout ----------------------------------------------
    bad_block = post.filter(
        (F.col("n") <= 0)
        | (F.col("first_doc") > F.col("last_doc"))
        | (F.col("max_tf") < 1)
        | (F.col("min_dl") < 1)
    )
    checks["bad_block_meta"] = bad_block.count()
    if checks["bad_block_meta"]:
        errors += _err_rows(
            bad_block.select("term", "group", "block_id", "n"),
            "bad block metadata",
        )
    from pyspark.sql import Window

    w = Window.partitionBy("term", "group").orderBy("block_id")
    overlap = (
        post.select(
            "term", "group", "block_id", "first_doc", "last_doc",
            F.lag("last_doc").over(w).alias("prev_last"),
        )
        .filter(
            F.col("prev_last").isNotNull()
            & (F.col("first_doc") <= F.col("prev_last"))
        )
    )
    checks["block_range_overlaps"] = overlap.count()
    if checks["block_range_overlaps"]:
        errors += _err_rows(overlap, "block doc-range overlap")

    # -- deep decode pass ------------------------------------------
    if deep:
        def kernel(pdfs):
            import numpy as np

            from .codec import decode_postings_block, varbyte_decode

            for pdf in pdfs:
                bad = 0
                samples: list[str] = []
                for row in pdf.itertuples(index=False):
                    problems = []
                    docs, tfs = decode_postings_block(row.doc_blob, row.tf_blob)
                    if len(docs) != row.n:
                        problems.append(f"decoded {len(docs)} != n {row.n}")
                    if len(docs) and (
                        int(docs[0]) != row.first_doc
                        or int(docs[-1]) != row.last_doc
                    ):
                        problems.append("first/last mismatch")
                    if len(docs) > 1 and not (np.diff(docs) > 0).all():
                        problems.append("docs not strictly ascending")
                    if len(tfs) and int(tfs.min()) < 1:
                        problems.append("tf < 1")
                    if len(tfs) and int(tfs.max()) != row.max_tf:
                        problems.append("max_tf mismatch")
                    try:
                        dl = varbyte_decode(row.dl_blob)
                        if len(dl) != row.n:
                            problems.append("dl count mismatch")
                        elif len(dl) and int(dl.min()) != row.min_dl:
                            problems.append("min_dl mismatch")
                    except Exception as e:  # torn blob
                        problems.append(f"dl decode failed: {e}")
                    try:
                        # block pos format: FLAT delta stream, the tfs
                        # are the per-posting counts (kernels
                        # positions_at) — no count prefix
                        flat = varbyte_decode(row.pos_blob)
                        if len(flat) != int(tfs.sum()):
                            problems.append("position stream length != Σtf")
                        else:
                            offs = np.concatenate([[0], np.cumsum(tfs)])
                            if any(
                                (flat[offs[j] + 1 : offs[j + 1]] <= 0).any()
                                for j in range(len(tfs))
                                if offs[j + 1] - offs[j] > 1
                            ):
                                problems.append("positions not ascending")
                    except Exception as e:
                        problems.append(f"pos decode failed: {e}")
                    if problems:
                        bad += 1
                        if len(samples) < 3:
                            samples.append(
                                f"term={row.term} group={row.group} "
                                f"block={row.block_id}: {'; '.join(problems)}"
                            )
                yield pd.DataFrame(
                    {"bad": [bad], "samples": ["\n".join(samples)]}
                )

        rep = (
            post.mapInPandas(kernel, schema="bad long, samples string")
            .agg(
                F.sum("bad").alias("bad"),
                F.max("samples").alias("sample"),
            )
            .collect()[0]
        )
        checks["deep_bad_blocks"] = int(rep["bad"] or 0)
        if checks["deep_bad_blocks"]:
            errors.append(f"deep decode: {rep['sample']}")

    return {"ok": not errors, "errors": errors, "checks": checks}
