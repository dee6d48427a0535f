"""Side-by-side contract check: Spark queries() vs DuckDB oracle_sql().

Mimics the grading driver: runs each pair at a given sf dir, compares
row count, column names, and an order-insensitive value multiset.
Usage: python scripts/check_contract.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(rows, cols):
    out = []
    for r in rows:
        d = dict(zip(cols, r)) if not isinstance(r, dict) else r
        out.append(tuple(repr(d[c]) for c in sorted(cols)))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from search_engine_spark.session import get_spark

    spark = get_spark(app_name="contract-check", cores=8, shuffle_partitions=16)
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
            scols = sdf.columns
            srows = [tuple(r[c] for c in scols) for r in sdf.collect()]
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
