"""Execute the ``iceberg:<name>`` source path against a REAL Iceberg
catalog when the runtime jar is available; skip (visibly) when it is not.

The north rule names Iceberg tables; the engine's ``table:``/``iceberg:``
source (sources/transcripts.py) is format-agnostic by design —
``spark.table`` plus a configured
``org.apache.iceberg.spark.SparkCatalog``.  This sandbox ships no
Iceberg runtime jar and has no network to fetch one, so here the test
self-skips; on any environment with the jar on the classpath
(``ICEBERG_JAR`` env var or a jar already in ``spark.jars``) it runs
the full loop: create a local Hadoop-catalog Iceberg table, write the
xs fixture, read it back through ``load_transcripts(spark,
"iceberg:...")``, and verify partition-pruned scans.
"""

from __future__ import annotations

import glob
import os

import pytest


def _find_iceberg_jar() -> str | None:
    env = os.environ.get("ICEBERG_JAR")
    if env and os.path.exists(env):
        return env
    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    for pat in ("iceberg-spark-runtime*.jar",):
        hits = glob.glob(os.path.join(jars, pat))
        if hits:
            return hits[0]
    return None


ICEBERG_JAR = _find_iceberg_jar()


@pytest.mark.skipif(
    ICEBERG_JAR is None,
    reason="no Iceberg runtime jar in this environment (sandbox has no "
    "network; set ICEBERG_JAR or drop iceberg-spark-runtime on the "
    "classpath to execute this path)",
)
def test_iceberg_catalog_round_trip(tmp_path):
    """Full loop: Iceberg table write → iceberg:<name> read →
    contract validation → conv_id-filtered (pruned) scan."""
    from pyspark.sql import SparkSession

    from search_engine_spark.corpus import transcripts_spark_df
    from search_engine_spark.sources.transcripts import load_transcripts

    wh = str(tmp_path / "warehouse")
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-test")
        .config("spark.jars", ICEBERG_JAR)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", wh)
        .getOrCreate()
    )
    try:
        df = transcripts_spark_df(spark, "xs")
        df.writeTo("local.db.transcripts").partitionedBy("conv_id").create()
        got = load_transcripts(spark, "iceberg:local.db.transcripts")
        assert got.count() == df.count()
        one = got.filter("conv_id = 'conv-000003'")
        assert one.count() == 5
        # partition pruning must reach the Iceberg scan
        plan = one._jdf.queryExecution().executedPlan().toString()
        assert "conv-000003" in plan
    finally:
        spark.stop()
