"""Index integrity checker (index/check.py): a healthy index audits
clean (structural + deep), and seeded corruption in any artifact —
idf table, block metadata, blob bytes, meta stats — is detected with
an exact mismatch count."""

from __future__ import annotations

import glob
import json
import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_spark.config import BuildConfig
from search_engine_spark.corpus import generate_transcripts
from search_engine_spark.index.build import build_index
from search_engine_spark.index.check import check_index


@pytest.fixture(scope="module")
def healthy(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("check") / "idx")
    build_index(
        spark, spark.createDataFrame(generate_transcripts("xs")), out,
        BuildConfig(num_groups=2),
    )
    return out


def _copy(healthy, tmp_path) -> str:
    dst = str(tmp_path / "idx")
    shutil.copytree(healthy, dst)
    return dst


def _rewrite_one(parquet_dir: str, mutate) -> None:
    """Load the first parquet file under dir, apply ``mutate`` to its
    pandas frame, write it back (same file)."""
    for f in sorted(glob.glob(os.path.join(parquet_dir, "**", "*.parquet"),
                              recursive=True)):
        if "bucket=-1" in f:  # doclen-rider partition: NULL terms
            continue
        t = pq.read_table(f)
        if t.num_rows:
            break
    pdf = mutate(t.to_pandas())
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=t.schema, preserve_index=False), f
    )
    # drop Hadoop .crc sidecars so the LocalFS checksum layer doesn't
    # mask the tamper before our checker sees it
    for crc in glob.glob(os.path.join(parquet_dir, "**", ".*.crc"),
                         recursive=True):
        os.remove(crc)


def test_healthy_index_passes(spark, healthy):
    rep = check_index(spark, healthy, deep=True)
    assert rep["ok"], rep["errors"]
    assert rep["checks"]["df_mismatches"] == 0
    assert rep["checks"]["deep_bad_blocks"] == 0


def test_detects_idf_tamper(spark, healthy, tmp_path):
    root = _copy(healthy, tmp_path)

    def mutate(pdf):
        pdf.loc[pdf.index[0], "df"] = int(pdf["df"].iloc[0]) + 5
        return pdf

    _rewrite_one(os.path.join(root, "idf"), mutate)
    rep = check_index(spark, root)
    assert not rep["ok"]
    # the tampered row breaks BOTH the df cross-check and the idf formula
    assert rep["checks"]["df_mismatches"] == 1
    assert rep["checks"]["idf_mismatches"] == 1


def test_detects_block_meta_tamper(spark, healthy, tmp_path):
    root = _copy(healthy, tmp_path)

    def mutate(pdf):
        pdf.loc[pdf.index[0], "n"] = int(pdf["n"].iloc[0]) + 1
        return pdf

    _rewrite_one(os.path.join(root, "postings"), mutate)
    rep = check_index(spark, root, deep=True)
    assert not rep["ok"]
    assert rep["checks"]["df_mismatches"] >= 1   # block sum no longer matches
    assert rep["checks"]["deep_bad_blocks"] >= 1  # decoded count != n


def test_detects_blob_corruption(spark, healthy, tmp_path):
    root = _copy(healthy, tmp_path)

    def mutate(pdf):
        blob = bytes(pdf["tf_blob"].iloc[0])
        pdf.loc[pdf.index[0], "tf_blob"] = blob[: max(0, len(blob) - 1)]
        return pdf

    _rewrite_one(os.path.join(root, "postings"), mutate)
    clean = check_index(spark, root)           # structural pass can't see it
    assert clean["checks"]["df_mismatches"] == 0
    rep = check_index(spark, root, deep=True)  # deep decode does
    assert not rep["ok"]
    assert rep["checks"]["deep_bad_blocks"] >= 1


def test_detects_meta_stat_tamper(spark, healthy, tmp_path):
    root = _copy(healthy, tmp_path)
    mpath = os.path.join(root, "meta.json")
    meta = json.load(open(mpath))
    meta["n_docs"] = meta["n_docs"] + 1
    json.dump(meta, open(mpath, "w"))
    rep = check_index(spark, root)
    assert not rep["ok"]
    assert any("n_docs" in e for e in rep["errors"])
