"""spark-submit entrypoint: build an index (ships with --py-files zip).

spark-submit --master local[8] --py-files search_engine_spark.zip \
    scripts/submit_build.py --input t.parquet --output ./idx [--groups 8]
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--groups", type=int, default=8)
    ap.add_argument("--checkpoint", action="store_true")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("sgs-build").getOrCreate()
    from search_engine_spark.config import BuildConfig
    from search_engine_spark.index.build import build_index, load_meta
    from search_engine_spark.sources import load_transcripts

    t0 = time.time()
    build_index(
        spark,
        # parquet path, or table:/iceberg:<name> for catalog (Iceberg) tables
        load_transcripts(spark, args.input),
        args.output,
        BuildConfig(num_groups=args.groups, checkpoint=args.checkpoint),
        resume=args.resume,
    )
    meta = load_meta(args.output)
    print(json.dumps({"seconds": round(time.time() - t0, 2), **meta}))
    spark.stop()


if __name__ == "__main__":
    main()
