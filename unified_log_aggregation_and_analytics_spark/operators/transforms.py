"""Per-record transforms T1-T10 as DataFrame -> DataFrame functions,
plus the per-source transformer registry.

The reference's entire hand-written dataflow is two Firehose record
transformers (reference lib/computes/ec2/lambda/index.js,
lib/computes/lambda/transformer/index.js) wired in by an optional
``transformer`` argument of the delivery-stream factory
(reference lib/common/utils.ts:12-13,44-56 — ECS and EKS pass none).
This module re-expresses them as column expressions; the registry
mirrors the optional-transformer wiring.

Engine-native semantics keep data typed and row-per-event; the
byte-faithful Firehose-envelope variants for golden parity live in
compat.py.

Scale note: everything here is built-in column expressions — executed
JVM-side inside whole-stage codegen, no shuffle, no Python.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unified_log_aggregation_and_analytics_spark.functions.apache_log import (
    parse_apache_combined,
    parse_lambda_record_line,
)
from unified_log_aggregation_and_analytics_spark.schemas import LAMBDA_EVENT_BATCH

# --- T1/T3: transport base64 envelope ----------------------------------


def decode_envelope(df: DataFrame, data_col: str = "data") -> DataFrame:
    """T1 — base64-decode the Firehose record payload
    (reference ec2/lambda/index.js:3, transformer/index.js:3)."""
    return df.withColumn("payload", F.unbase64(F.col(data_col)).cast("string"))


def encode_envelope(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """T3 — base64-encode an output payload (reference
    ec2/lambda/index.js:8, transformer/index.js:13). Transport-only;
    the engine's own sink stores typed columns instead."""
    # regexp_replace strips Spark base64's MIME line breaks (JS
    # Buffer.toString('base64') emits a single line).
    return df.withColumn(
        "data",
        F.regexp_replace(F.base64(F.col(payload_col).cast("binary")), "[\\r\\n]", ""),
    )


# --- T2: EC2 wrap-as-logs ----------------------------------------------


def ec2_wrap_logs(df: DataFrame, line_col: str = "value") -> DataFrame:
    """T2 — the EC2 transformer wraps each raw line as ``{"logs": line}``
    (reference ec2/lambda/index.js:4-7; golden I/O README.md:44-56).
    Engine-native form: a typed ``logs`` column, not re-serialized JSON.
    """
    return df.select(F.col(line_col).alias("logs"))


# --- T4-T7: Lambda telemetry batch -------------------------------------


def parse_lambda_batch(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """T4 — parse the JSON array payload of {time, type, record} events
    (reference transformer/index.js:4; shape README.md:95-147).

    ``record`` may be a JSON object (platform.* events) or a plain
    string (function events); it is preserved as its raw JSON-or-string
    form for per-type parsing downstream.
    """
    return df.withColumn("events", F.from_json(F.col(payload_col), LAMBDA_EVENT_BATCH))


def explode_lambda_events(df: DataFrame, events_col: str = "events") -> DataFrame:
    """T5 — flatten a telemetry batch to one row per event, keeping the
    in-batch ordinal (reference transformer/index.js:7 forEach)."""
    return df.select(
        "*", F.posexplode(F.col(events_col)).alias("event_pos", "event")
    ).drop(events_col)


def filter_function_events(df: DataFrame) -> DataFrame:
    """T6 — keep only ``type === 'function'`` events
    (reference transformer/index.js:9; intent README.md:90)."""
    return df.filter(F.col("event.type") == "function")


def rekey_function_events(df: DataFrame, record_id_col: str = "recordId") -> DataFrame:
    """T7 engine-native — per-record ordinal numbering of surviving
    function events. The reference hand-rolls ``logEvent_+(++index)``
    (transformer/index.js:10-11); that is a row_number() over the
    in-record event order. The byte-faithful map-shaped output lives in
    compat.firehose_lambda_transform.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(record_id_col).orderBy("event_pos")
    return df.withColumn("log_event_n", F.row_number().over(w))


def tag_result(df: DataFrame, result: str = "Ok") -> DataFrame:
    """T8 — per-record delivery-status tag (reference
    ec2/lambda/index.js:11, transformer/index.js:16); drives the
    dead-letter split (K3) in pipeline.py."""
    return df.withColumn("result", F.lit(result))


# T9/T10 re-exported from functions.apache_log for registry completeness.
parse_access_log = parse_apache_combined
parse_function_record = parse_lambda_record_line


# --- Transformer registry ----------------------------------------------
# Mirrors CreateKirehoseDataStream(stack, streamName, index, ...,
# transformer?) (reference utils.ts:12-13): ec2 and lambda attach a
# transform; ecs and eks ship structured JSON straight through.

Transformer = Callable[[DataFrame], DataFrame]


def lambda_telemetry_transform(df: DataFrame) -> DataFrame:
    """Full engine-native Lambda pipeline: T4 -> T5 -> T6 -> T10."""
    out = explode_lambda_events(parse_lambda_batch(df))
    out = filter_function_events(out)
    out = out.select(
        "*",
        F.col("event.time").alias("event_time"),
        F.col("event.record").alias("record"),
    )
    return parse_lambda_record_line(out)


TRANSFORMERS: dict[str, Transformer | None] = {
    "ec2": ec2_wrap_logs,  # reference ec2.ts:58-68
    "lambda": lambda_telemetry_transform,  # reference lambda.ts:16-26
    "ecs": None,  # no transformer attached (reference ecs.ts:14)
    "eks": None,  # no transformer attached (reference eks.ts:21)
}
