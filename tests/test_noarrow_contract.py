"""Regression tests for the driver-session compatibility class that
turned 17 CORRECTNESS_r04 rows red.

The grading driver runs a bare ``SparkSession.builder.getOrCreate()``:
Arrow is DISABLED there, so (a) ``createDataFrame(pandas_df)`` takes the
row-inference fallback, which mis-infers pandas ``string``-dtype
``pd.NA`` cells as empty structs (CANNOT_MERGE_TYPE crash — 15 entries),
and (b) results convert through pandas where NULL-able integer columns
become float64 and poison the value hash (2 entries).  These tests pin
both fixes under an Arrow-disabled session.
"""

from __future__ import annotations

import os

import pytest

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")

_ARROW_KEY = "spark.sql.execution.arrow.pyspark.enabled"


@pytest.fixture()
def no_arrow(spark):
    """The shared session with Arrow disabled for the duration of one
    test — createDataFrame checks the conf at call time, so this is an
    exact emulation of the driver's no-Arrow conversion path."""
    old = spark.conf.get(_ARROW_KEY)
    spark.conf.set(_ARROW_KEY, "false")
    yield spark
    spark.conf.set(_ARROW_KEY, old)


def test_transcripts_spark_df_no_arrow(no_arrow):
    from search_engine_spark.corpus import transcripts_spark_df

    df = transcripts_spark_df(no_arrow, "xs")
    assert df.count() == 100
    assert df.schema.simpleString() == (
        "struct<conv_id:string,turn_idx:int,role:string,"
        "text:string,tool:string,ts:timestamp>"
    )
    # the NULL tool cells must survive as real SQL NULLs
    assert df.filter("tool IS NULL").count() > 0
    assert df.filter("tool IS NOT NULL").count() > 0


def test_raw_generate_transcripts_still_crashes_no_arrow(no_arrow):
    """Documents WHY the helper exists: the raw pandas frame (string
    dtype + pd.NA) is NOT safe under a no-Arrow session.  If pandas or
    PySpark ever fix the inference, this starts xfailing and the helper
    can be retired."""
    from pyspark.errors.exceptions.base import PySparkTypeError

    from search_engine_spark.corpus import generate_transcripts

    with pytest.raises(PySparkTypeError):
        no_arrow.createDataFrame(generate_transcripts("xs")).collect()


def test_contract_entry_runs_no_arrow(no_arrow):
    """One of the 15 previously-red entries end-to-end under the
    driver-style session (the crash was in fixture setup, before any
    query logic ran)."""
    import __spark_entry__ as e

    df = e.queries()["transcripts_facets"](no_arrow, f"{TESTDATA}/sf0.001")
    assert df.count() > 0


def test_pack_contract_outputs_have_no_nullable_int_columns(spark):
    """pack_sequences / sft_pack_spans contract projections must emit
    the NULL-able seq columns as double (a long column holding NULLs
    becomes float64 through the driver's pandas round-trip, which
    hash-mismatches an integer oracle while rows/schema still agree)."""
    import __spark_entry__ as e

    qs = e.queries()
    for name in ("pack_sequences", "sft_pack_spans"):
        df = qs[name](spark, f"{TESTDATA}/sf0.001")
        types = dict(df.dtypes)
        for c in ("seq_first", "seq_last", "seq_offset"):
            assert types[c] == "double", (name, c, types[c])
