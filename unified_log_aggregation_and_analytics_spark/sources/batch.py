"""Batch scans (S6/S7): parquet table loads with pruning-friendly plans.

S6 mirrors the reference's Discover index-pattern scan
(reference README.md:301-312): a daily index selection becomes Parquet
partition pruning on ``log_date``. S7 is the driver-testdata contract.

Scale note: ``spark.read.parquet`` + declarative select/filter is all
that's needed — Catalyst pushes predicates and prunes columns down to
the scan, which is exactly the shard-local filtering OpenSearch does.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from unified_log_aggregation_and_analytics_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Load one driver-testdata table as a DataFrame.

    The events table stores TIMESTAMP(NANOS) parquet, which Spark 4
    refuses to read natively; it is read via nanosAsLong and converted
    to TimestampType with exact integer division (``div`` — plain ``/``
    would round-trip through double and lose precision above 2^53 ns).
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The DuckDB oracle is timezone-naive; pin the session to UTC so
    # date_trunc/day bucketing agrees regardless of host timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Load every testdata table, keyed by name."""
    return {name: load_table(spark, name, sf_dir) for name in names}


def register_testdata_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register all testdata tables as temp views so spark.sql works
    against the same names DuckDB pre-registers (driver contract)."""
    for name in TESTDATA_TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_col: str,
    n_ranges: int = 8,
    partition_by: list[str] | None = None,
) -> None:
    """Data-layout management: write a table range-partitioned and
    sorted on ``sort_col`` so parquet row-group/file min-max statistics
    become disjoint — a later scan with a ``sort_col`` predicate skips
    whole files instead of reading the full table.

    ``repartitionByRange`` samples the column to build balanced range
    boundaries (one shuffle), ``sortWithinPartitions`` orders rows
    inside each output file (no extra shuffle). At 100 TB this is the
    difference between a time-range query touching ~1/N of the files
    and touching all of them; the same layout is what makes
    z-order/liquid-clustering effective in lakehouse engines. Combine
    with ``partition_by`` (e.g. log_date) for directory-level pruning
    on a second key.
    """
    out = df.repartitionByRange(n_ranges, sort_col).sortWithinPartitions(sort_col)
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
