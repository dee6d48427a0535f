"""Driver-contract integration test: queries() vs oracle_sql() via DuckDB.

Runs the same comparison the grading driver performs (row count, column
set, order-insensitive value multiset) at sf0.001 so CI stays fast; the
full sf0.01 sweep is scripts/check_contract.py.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def entrymod():
    import __spark_entry__ as e

    return e


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def _canon(rows, cols):
    return sorted(tuple(repr(d[c]) for c in sorted(cols)) for d in rows)


def test_entry_smoke(entrymod, spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert df.columns == ["doc_id", "score"]
    assert len(rows) > 0


def test_every_query_has_callable_and_oracle_keys_subset(entrymod):
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert qs, "queries() must not be empty"
    assert set(os_) <= set(qs)
    # the majority of entries must be oracle-checkable
    assert len(os_) >= 0.7 * len(qs)


def _oracle_names(entrymod):
    return sorted(entrymod.oracle_sql())


def pytest_generate_tests(metafunc):
    if "qname" in metafunc.fixturenames:
        import __spark_entry__ as e

        metafunc.parametrize("qname", sorted(e.oracle_sql()))


def test_query_matches_oracle(entrymod, duck, spark, qname):
    fn = entrymod.queries()[qname]
    sdf = fn(spark, SF)
    scols = [c.lower() for c in sdf.columns]
    srows = [{c.lower(): r[c] for c in sdf.columns} for r in sdf.collect()]
    rel = duck.sql(entrymod.oracle_sql()[qname])
    dcols = [c.lower() for c in rel.columns]
    drows = [dict(zip(dcols, t)) for t in rel.fetchall()]
    assert sorted(scols) == sorted(dcols), f"schema mismatch: {scols} vs {dcols}"
    assert len(srows) == len(drows), f"rowcount {len(srows)} vs {len(drows)}"
    assert _canon(srows, scols) == _canon(drows, dcols)


def test_rows_only_queries_run(entrymod, spark):
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    for name in sorted(set(qs) - set(os_)):
        df = qs[name](spark, SF)
        assert df.columns, name
        df.limit(5).collect()  # must execute without error
