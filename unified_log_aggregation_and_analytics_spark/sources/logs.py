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


# The record schema every Kinesis connector emits (and the contract the
# downstream pipeline is written against): payload is opaque binary,
# plus the stream position/arrival metadata. This is the Spark-side
# Record shape the awslabs spark-sql-kinesis-connector documents for
# format('aws-kinesis') sources, carrying one Firehose DirectPut
# record each (reference utils.ts:40-42): data, streamName,
# partitionKey, sequenceNumber, approximateArrivalTimestamp.
KINESIS_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("data", T.BinaryType(), True),
        T.StructField("streamName", T.StringType(), True),
        T.StructField("partitionKey", T.StringType(), True),
        T.StructField("sequenceNumber", T.StringType(), True),
        T.StructField("approximateArrivalTimestamp", T.TimestampType(), True),
    ]
)

# The connector documents TRIM_HORIZON / LATEST / AT_TIMESTAMP;
# EARLIEST is accepted here as the Kinesis-API synonym and normalized
# to TRIM_HORIZON. AT_TIMESTAMP needs a timestamp side-option and is
# deliberately NOT wired until something needs it (loud, not silent).
_KINESIS_POSITIONS = {"LATEST", "TRIM_HORIZON", "EARLIEST"}
_KINESIS_CONSUMER_TYPES = {"GetRecords", "SubscribeToShard"}

# The connector's source format name. Option keys below follow its
# public README; Spark reads options through CaseInsensitiveStringMap,
# so key casing is cosmetic — the PREFIX and spelling are the
# contract. Freshness: the pinned surface (format name, kinesis.*
# prefix, streamName/region/consumerType/startingPosition keys,
# GetRecords|SubscribeToShard, LATEST|TRIM_HORIZON|AT_TIMESTAMP) is
# the awslabs spark-sql-kinesis-connector spec as of its 1.x README;
# this sandbox has no network, so re-pinning against a newer README
# is a deployment-time checklist item — the contract test
# (tests/test_streaming.py kinesis contract) is the single place to
# update if a key is renamed upstream.
KINESIS_FORMAT = "aws-kinesis"


def kinesis_source_config(
    stream_name: str,
    region: str = "us-east-1",
    starting_position: str = "LATEST",
    endpoint_url: str | None = None,
    consumer_type: str = "GetRecords",
) -> dict[str, str]:
    """S5 config contract — the exact option map handed to
    ``readStream.format('aws-kinesis')`` (the public awslabs
    spark-sql-kinesis-connector: ``kinesis.``-prefixed keys), validated
    eagerly so a bad deployment config fails at build time, not at
    stream start. Factored out of stream_kinesis so the contract is
    testable without the connector jar (tests/test_streaming.py); the
    sandbox has no Kinesis, so this boundary — format name + options +
    record schema + payload decode — IS the production integration
    surface, and production wiring is a jar-drop.

    ``consumer_type``: GetRecords (polling, default) or
    SubscribeToShard (enhanced fan-out), per the connector docs."""
    if not stream_name or not stream_name.strip():
        raise ValueError("kinesis stream_name must be non-empty")
    pos = starting_position.upper()
    if pos not in _KINESIS_POSITIONS:
        raise ValueError(
            f"starting_position {starting_position!r} not in {sorted(_KINESIS_POSITIONS)}"
        )
    if pos == "EARLIEST":
        pos = "TRIM_HORIZON"
    if consumer_type not in _KINESIS_CONSUMER_TYPES:
        raise ValueError(
            f"consumer_type {consumer_type!r} not in {sorted(_KINESIS_CONSUMER_TYPES)}"
        )
    cfg = {
        "kinesis.streamName": stream_name,
        "kinesis.region": region,
        "kinesis.consumerType": consumer_type,
        "kinesis.startingPosition": pos,
    }
    if endpoint_url is not None:
        cfg["kinesis.endpointUrl"] = endpoint_url
    return cfg


def kinesis_records_to_lines(records: DataFrame) -> DataFrame:
    """The decode boundary between connector records and the log
    pipeline: ``data`` (binary UTF-8 payload) becomes the one-column
    ``value: string`` frame the per-source normalizers consume — a
    Kinesis stream drops into run_pipeline exactly where a file-tail
    source does. Works identically on batch and streaming frames, so
    the contract is testable without the connector."""
    from pyspark.sql import functions as F

    return records.select(F.col("data").cast("string").alias("value"))


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

    The returned frame carries KINESIS_RECORD_SCHEMA;
    ``kinesis_records_to_lines`` feeds the same per-source
    normalizers.
    """
    cfg = kinesis_source_config(stream_name, region, starting_position)
    try:
        reader = spark.readStream.format(KINESIS_FORMAT)
        for k, v in cfg.items():
            reader = reader.option(k, v)
        return reader.load()
    except Exception as exc:  # pragma: no cover - connector not bundled here
        raise NotImplementedError(
            "Kinesis connector not on classpath; use stream_text_logs/"
            "stream_json_logs file sources locally"
        ) from exc


def read_csv_logs(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = False,
    delimiter: str = ",",
) -> DataFrame:
    """Batch read of CSV/TSV log exports (ELB access logs, CloudFront
    logs, and billing exports arrive this way) with POISON-PROOF
    parsing: PERMISSIVE mode plus ``columnNameOfCorruptRecord`` keeps
    every malformed line as a ``_corrupt_record`` row instead of
    failing the job or silently dropping it — the same
    no-poisoning-the-batch stance the streaming DLQ split takes
    (reference's Firehose transformer would fail the whole batch,
    SURVEY §2.3 T8).

    The returned frame carries the declared columns plus
    ``_corrupt_record``; route with :func:`csv_dlq_split`. Schema is
    always declared — inference costs a full pre-scan and can flip
    types between days at scale.
    """
    out_schema = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    return (
        spark.read.schema(out_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .csv(path)
    )


def csv_dlq_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a ``read_csv_logs`` frame into (clean, dead-letter):
    clean rows drop the corrupt column; DLQ rows keep the full
    (null-parsed) row, the raw line, and the source file for replay
    after a parser fix. Map-only, no shuffle. (The DLQ branch keeps
    every schema column deliberately: Spark disallows plans that prune
    a raw CSV scan down to ``_corrupt_record`` alone, and the
    null-parsed columns show a replayer exactly which fields failed.)
    """
    from pyspark.sql import functions as F

    corrupt = F.col("_corrupt_record").isNotNull()
    clean = df.filter(~corrupt).drop("_corrupt_record")
    dlq = (
        df.filter(corrupt)
        .withColumnRenamed("_corrupt_record", "raw")
        .withColumn("src_file", F.input_file_name())
    )
    return clean, dlq
