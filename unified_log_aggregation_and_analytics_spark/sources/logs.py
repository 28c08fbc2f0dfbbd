"""Log-file sources (S1-S4): batch and streaming readers.

The reference collects logs four ways (SURVEY.md §2.1):
- S1 EC2: Kinesis agent tails httpd access/error logs
  (reference lib/computes/ec2/ec2-startup.sh:39-54)
- S2 ECS: FireLens/Fluent Bit ships container stdout as JSON
  (reference lib/computes/ecs.ts:33-43)
- S3 EKS: Fluent Bit kinesis_firehose output, Match * (identity routing)
  (reference lib/computes/eks/eks-fargate-logging.ts:24-30)
- S4 Lambda: telemetry extension PUTs JSON event-batch arrays
  (reference README.md:82-88)

All become Spark file sources here: ``text`` for raw lines, ``json``
for structured shippers. In production the same transforms attach to a
Kinesis/Kafka connector source — only this module changes.

Scale notes:
- File streaming sources get exactly-once tracking from the checkpoint
  log, replacing the Kinesis agent's own checkpoint file.
- ``maxFilesPerTrigger`` bounds micro-batch size (the reference's
  1 MB buffering hint, utils.ts:71); the trigger interval itself is set
  at the writeStream (pipeline.py, ST1).
- Schemas are always declared (schemas.py) — streaming json inference
  is disabled at scale by default and would cost a full pre-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_text_logs(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of raw log lines (one ``value`` column). S1 batch mode."""
    return spark.read.text(path)


def stream_text_logs(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming tail of a log directory — the engine's Kinesis-agent
    equivalent (reference ec2-startup.sh:39-54 filePattern globs)."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def read_json_logs(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Batch read of JSON-lines shipper output (S2/S3 batch mode)."""
    return spark.read.schema(schema).json(path)


def stream_json_logs(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming read of JSON-lines shipper output (S2/S3/S4)."""
    reader = spark.readStream.schema(schema).format("json")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def stream_kinesis(
    spark: SparkSession,
    stream_name: str,
    region: str = "us-east-1",
    starting_position: str = "LATEST",
) -> DataFrame:
    """S5 production path — Kinesis Data Streams source (the engine's
    stand-in for the reference's four Firehose DirectPut delivery
    streams, lib/common/utils.ts:40-42). Requires the
    spark-sql-kinesis connector on the classpath; local tests use the
    file sources above, which exercise the identical downstream
    normalize -> DLQ -> sink pipeline.

    The returned frame carries the connector's standard columns
    (``data: binary``, ``partitionKey``, ``sequenceNumber``,
    ``approximateArrivalTimestamp``); ``data.cast('string')`` feeds the
    same per-source normalizers.
    """
    try:
        return (
            spark.readStream.format("kinesis")
            .option("streamName", stream_name)
            .option("region", region)
            .option("startingPosition", starting_position)
            .load()
        )
    except Exception as exc:  # pragma: no cover - connector not bundled here
        raise NotImplementedError(
            "Kinesis connector not on classpath; use stream_text_logs/"
            "stream_json_logs file sources locally"
        ) from exc
