"""Transcript-table source — the engine's single entry point for corpus
input (the reference's crawler+Postgres `documents` table analog; the
target deployment reads an Iceberg table of multi-turn conversation /
agent transcripts).

One loader handles every layout the engine is deployed against:

* ``table:<name>`` / ``iceberg:<name>`` — a catalog table read via
  ``spark.table(name)``.  With an Iceberg catalog configured
  (``spark.sql.catalog.* = org.apache.iceberg.spark.SparkCatalog``)
  this is the Iceberg scan path: Catalyst pushes filters and column
  pruning into the Iceberg reader, and a table partitioned/bucketed on
  ``conv_id`` gives the build's per-conversation grouping data
  locality for free.  The sandbox container has no Iceberg runtime
  jars, so tests exercise this code path through a registered temp
  view — ``spark.table`` is the same API either way, which is the
  point: the engine never needs to know the table format.
* anything else — a Parquet path (``spark.read.parquet``), the
  driver-testdata layout.

Every load is schema-validated against the transcript contract
(``conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp`` — BASELINE.json input_hint): a missing or
mistyped column fails loud at load time, not as a misscored corpus
after a full index build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: the input contract — BASELINE.json input_hint / FIXTURES.md
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

#: columns the index build actually consumes; extra columns in a wider
#: table are pruned at the scan (checked in PLANS.md), never an error.
#: ``ts`` accepts both timestamp flavors: parquet written through Arrow
#: carries timestamp_ntz, Iceberg timestamptz maps to timestamp
REQUIRED: dict[str, tuple] = {
    "conv_id": (T.StringType(),),
    "turn_idx": (T.IntegerType(),),
    "role": (T.StringType(),),
    "text": (T.StringType(),),
    "tool": (T.StringType(),),
    "ts": (T.TimestampType(), T.TimestampNTZType()),
}


def validate_transcripts(df: DataFrame, source: str = "<df>") -> DataFrame:
    """Fail loud on a missing/mistyped contract column; prune to the
    contract columns (wider tables are fine — the scan prunes)."""
    have = {f.name: f.dataType for f in df.schema.fields}
    problems = []
    for name, dtypes in REQUIRED.items():
        if name not in have:
            problems.append(f"missing column {name} ({dtypes[0].simpleString()})")
        elif have[name] not in dtypes:
            problems.append(
                f"column {name}: expected {dtypes[0].simpleString()}, "
                f"got {have[name].simpleString()}"
            )
    if problems:
        raise ValueError(
            f"transcript source {source} does not match the input contract: "
            + "; ".join(problems)
        )
    return df.select(*REQUIRED)


def load_transcripts(spark: SparkSession, source: str) -> DataFrame:
    """Load + validate a transcript corpus.

    ``source`` forms: ``table:<name>`` or ``iceberg:<name>`` (catalog
    table — the Iceberg path when a catalog is configured), else a
    Parquet path."""
    if source.startswith(("table:", "iceberg:")):
        df = spark.table(source.split(":", 1)[1])
    else:
        df = spark.read.parquet(source)
    return validate_transcripts(df, source)
