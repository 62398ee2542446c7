"""Parquet table sources.

The reference consumes raw text lines (``TextInputFormat`` →
``(LongWritable, Text)``, reference PageRankAlgorithm.java:66,84,102,119);
this engine's scan primitive is a parquet (or text) DataFrame read, which
gives Catalyst column pruning + predicate pushdown for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to TimestampType (micros,
    epoch == the raw stored value) regardless of how the file was
    written.  Testdata generations have used two physical types:

    - parquet TIMESTAMP(NANOS): readable only as long nanos with
      ``nanosAsLong`` on; truncate to micros (DuckDB's conversion).
    - parquet timestamp[us] (unannotated → TIMESTAMP_NTZ under Spark 4's
      ``inferTimestampNTZ`` default): cast NTZ → TIMESTAMP, a value
      identity in a UTC session (the repo factory pins
      ``spark.sql.session.timeZone=UTC``; the test container's JVM
      default is UTC too, so driver-owned bare sessions match).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dt, TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # Older testdata wrote events.ts as parquet TIMESTAMP(NANOS),
        # which Spark's reader rejects unless nanosAsLong is on.  The
        # conf is runtime-settable, and callers (e.g. a driver harness)
        # may hand us a session they built themselves — so set it here,
        # not only in our own factory.
        # PERSISTENT SESSION SIDE EFFECT (deliberate): the conf stays on
        # for the session's lifetime, so any later parquet read in this
        # session surfaces TIMESTAMP(NANOS) columns as long nanos.  It
        # cannot be restored after this call — the scan consults the
        # conf at EXECUTION time, so flipping it back would fail the
        # (lazy) read we just planned.  The only nanos-typed testdata
        # column ever generated is events.ts, which this loader already
        # converts (current generations write micros; see
        # :func:`normalize_event_ts`, which handles both).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_ts(df)
    return df


def write_table(
    df: DataFrame, path: str, fmt: str = "parquet", partition_by: list[str] | None = None
) -> None:
    """Format-generic sink: parquet (default), json lines, or csv.
    ``partition_by`` produces hive-style directory partitioning —
    the physical layout that makes partition pruning possible on read."""
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.option("header", "true")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_table(
    spark: SparkSession, path: str, fmt: str = "parquet", schema: str | None = None
) -> DataFrame:
    """Format-generic source.  For json/csv an explicit schema string
    skips the inference scan (mandatory at scale: inference reads the
    data once just to guess what a schema declaration states for free)."""
    r = spark.read.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    elif fmt in ("json", "csv"):
        r = r.option("inferSchema", "true")
    if fmt == "csv":
        r = r.option("header", "true")
    return r.load(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view (for spark.sql use)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
