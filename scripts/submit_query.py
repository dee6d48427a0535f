"""spark-submit entrypoint: query an index (ships with --py-files zip).

spark-submit --master local[8] --py-files search_engine_spark.zip \
    scripts/submit_query.py --index ./idx --query "terms here" [--k 10]
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", required=True)
    ap.add_argument("--mode", default="disjunctive")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("sgs-query").getOrCreate()
    from search_engine_spark.index.reader import CompressedIndex

    idx = CompressedIndex(spark, args.index)
    if args.mode == "qs":
        from search_engine_spark.operators.querystring import (
            search_query_string,
        )

        rows = search_query_string(idx, args.query, args.k).collect()
    else:
        rows = idx.topk(args.query, args.mode, args.k).collect()
    print(json.dumps([
        {"conv_id": r["conv_id"], "turn_idx": r["turn_idx"], "score": r["score"]}
        for r in rows
    ]))
    spark.stop()


if __name__ == "__main__":
    main()
