"""Side-by-side contract check: Spark queries() vs DuckDB oracle_sql().

Mimics the grading driver: runs each pair at a given sf dir, compares
row count, column names, and an order-insensitive value multiset.

Driver-replica hardening (round-5, after CORRECTNESS_r04):

* The session runs with Arrow DISABLED — the driver uses a bare
  ``SparkSession.builder.getOrCreate()`` where
  ``spark.sql.execution.arrow.pyspark.enabled`` defaults to false, and
  round 4 lost 15 entries to a ``createDataFrame`` crash that only
  reproduces on the no-Arrow row-inference path.
* Spark-side values go through a ``toPandas()`` round-trip before
  comparison (the driver-style conversion): a long column holding NULLs
  becomes float64 there (5 → 5.0), which must hash-match the oracle's
  raw DuckDB values — round 4 lost pack_sequences/sft_pack_spans to
  exactly this class.  Entries must not emit NULL-able integer columns.

Usage: python scripts/check_contract.py [sf_dir] [name ...]
"""

from __future__ import annotations

import datetime
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm(v):
    """Canonicalize one cell to plain-Python values, PRESERVING the
    int/float distinction (so pandas NULL-int → float64 coercion is a
    visible mismatch, not silently repaired)."""
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, np.ndarray):
        return [norm(x) for x in v.tolist()]
    if isinstance(v, (list, tuple)):
        return [norm(x) for x in v]
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None)
    return v


def canon(rows, cols):
    out = []
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    for r in rows:
        out.append(tuple(repr(norm(r[i])) for i in order))
    return sorted(out)


def spark_rows_driver_style(sdf):
    """Spark result through the driver-style pandas round-trip (Arrow is
    off session-wide, so this is the plain row-by-row conversion where
    nullable longs become float64)."""
    pdf = sdf.toPandas()
    return list(pdf.itertuples(index=False, name=None)), list(pdf.columns)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from search_engine_spark.session import get_spark

    spark = get_spark(
        app_name="contract-check",
        cores=8,
        shuffle_partitions=16,
        extra_conf={"spark.sql.execution.arrow.pyspark.enabled": "false"},
    )
    assert spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "false"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, os_ = e.queries(), e.oracle_sql()
    failed, passed, rows_only = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows, scols = spark_rows_driver_style(sdf)
        except Exception as ex:
            failed.append((name, f"SPARK ERROR: {ex}"))
            print(f"FAIL {name}: spark error {str(ex)[:300]}")
            continue
        if name not in os_:
            rows_only.append((name, len(srows)))
            print(f"rows {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(os_[name])
            dcols = [c for c in rel.columns]
            drows = rel.fetchall()
        except Exception as ex:
            failed.append((name, f"DUCKDB ERROR: {ex}"))
            print(f"FAIL {name}: duckdb error {str(ex)[:300]}")
            continue
        problems = []
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
            problems.append(f"schema {scols} vs {dcols}")
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if not problems:
            a = canon(srows, [c.lower() for c in scols])
            b = canon(drows, [c.lower() for c in dcols])
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, e.g. {diff}")
        if problems:
            failed.append((name, "; ".join(problems)))
            print(f"FAIL {name}: {'; '.join(p[:400] for p in problems)}")
        else:
            passed.append(name)
            print(f"ok   {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{len(passed)} ok, {len(rows_only)} rows-only, {len(failed)} failed")
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
