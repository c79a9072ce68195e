"""Batch sources and sinks (SURVEY.md §2.A, S1–S4).

All loaders return plain DataFrames; downstream operators never know
or care where the data came from, which is what lets the same
transforms run in batch and streaming (see streaming/sources.py for
the S5/S6 streaming counterparts).

Scale notes (100-TB design point):
- parquet scans go through Spark's vectorized reader; predicate
  pushdown + column pruning reach the row groups for free as long as
  callers express filters/projections on the DataFrame (verified by
  plan assertions in tests/test_plans.py);
- sinks partition by a date-derived key so static + dynamic partition
  pruning fire on the read path — the Spark-native equivalent of the
  reference's per-month MongoDB collection swap + secondary indexes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flirt_consume_spark import schemas
from flirt_consume_spark.session import apply_runtime_confs

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S1: parquet scan of one driver table (TESTDATA.md).

    ``events.ts`` is TIMESTAMP(NANOS) in the file; with the
    nanosAsLong legacy conf it scans as int64 nanos and is converted
    here to µs TimestampType with integer division (``DIV`` stays in
    long arithmetic — ``/1000`` would round-trip through double and
    corrupt the low bits at 1.7e18 ns magnitudes).
    """
    apply_runtime_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = schemas.TABLE_NAMES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def read_csv(spark: SparkSession, path: str, schema, header: bool = True) -> DataFrame:
    """S2: CSV scan with an explicit schema — the reference's native
    input format (monthly flight-schedule extracts). No schema
    inference: drift fails loudly (SURVEY.md §1.3).
    """
    apply_runtime_confs(spark)
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "FAILFAST")
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """S3: JSON-lines scan (airport/aux reference data)."""
    apply_runtime_confs(spark)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """S4: batch sink with idempotent partition overwrite.

    The reference swaps in a whole MongoDB collection per consumed
    month; the Spark-native equivalent is dynamic partition overwrite:
    re-consuming a month replaces exactly that month's partition and
    nothing else, which makes the job idempotent and safely re-runnable.
    """
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.option("partitionOverwriteMode", "dynamic").partitionBy(
            *partition_cols
        )
    writer.parquet(path)


def with_month_key(df: DataFrame, ts_col: str, key_col: str = "month_key") -> DataFrame:
    """Derive the partition key used by the monthly sink ('YYYY-MM')."""
    return df.withColumn(key_col, F.date_format(F.col(ts_col), "yyyy-MM"))
