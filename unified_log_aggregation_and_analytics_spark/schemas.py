"""Declared StructType schemas for every source the engine ingests.

The reference relies on OpenSearch dynamic mapping (no mapping is ever
declared — reference lib/common/utils.ts:43-82 configures only
``indexName``). At 100 TB, silent schema drift is the top correctness
hazard, so this engine declares schemas per source (FIXTURES.md) and
keeps a permissive ``_raw`` passthrough column.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Transport envelope -------------------------------------------------
# Firehose record envelope consumed/produced by both reference
# transformers (reference lib/computes/ec2/lambda/index.js:2-14,
# lib/computes/lambda/transformer/index.js:2-19).
FIREHOSE_ENVELOPE = T.StructType(
    [
        T.StructField("recordId", T.StringType(), False),
        T.StructField("data", T.StringType(), False),  # base64 of UTF-8 payload
    ]
)

FIREHOSE_ENVELOPE_OUT = T.StructType(
    [
        T.StructField("recordId", T.StringType(), False),
        T.StructField("result", T.StringType(), False),  # 'Ok' | 'ProcessingFailed'
        T.StructField("data", T.StringType(), False),
    ]
)

# --- Raw per-source input schemas --------------------------------------
# EC2: Kinesis agent tails Apache httpd access/error logs
# (reference lib/computes/ec2/ec2-startup.sh:39-54); one raw line per row.
EC2_RAW = T.StructType([T.StructField("value", T.StringType(), True)])

# Lambda telemetry: extension delivers a JSON array of
# {time, type, record} events per payload (reference README.md:95-147).
# ``record`` is a string for type='function' (tab-separated line) and an
# object for platform.* events — kept as raw JSON string, parsed per-type.
LAMBDA_EVENT = T.StructType(
    [
        T.StructField("time", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("record", T.StringType(), True),
    ]
)
LAMBDA_EVENT_BATCH = T.ArrayType(LAMBDA_EVENT)

# ECS: FireLens/Fluent Bit 'firehose' output wraps container stdout with
# ECS metadata (reference lib/computes/ecs.ts:33-43; public FireLens shape).
ECS_FIRELENS = T.StructType(
    [
        T.StructField("log", T.StringType(), True),
        T.StructField("container_id", T.StringType(), True),
        T.StructField("container_name", T.StringType(), True),
        T.StructField("ecs_cluster", T.StringType(), True),
        T.StructField("ecs_task_arn", T.StringType(), True),
        T.StructField("ecs_task_definition", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

# EKS: Fluent Bit kinesis_firehose output with kubernetes metadata
# (reference lib/computes/eks/eks-fargate-logging.ts:24-30).
EKS_FLUENTBIT = T.StructType(
    [
        T.StructField("log", T.StringType(), True),
        T.StructField("stream", T.StringType(), True),
        T.StructField("time", T.StringType(), True),
        T.StructField(
            "kubernetes",
            T.StructType(
                [
                    T.StructField("namespace_name", T.StringType(), True),
                    T.StructField("pod_name", T.StringType(), True),
                    T.StructField("container_name", T.StringType(), True),
                    T.StructField("host", T.StringType(), True),
                    T.StructField("labels", T.MapType(T.StringType(), T.StringType()), True),
                ]
            ),
            True,
        ),
    ]
)

# --- Unified logs table (sink schema, K1/K2) ---------------------------
# All four sources normalize into this; (source, log_date) are the
# partition columns, reproducing the reference's per-source daily index
# rotation (reference README.md:30) as partition pruning.
UNIFIED_LOG = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("log_date", T.DateType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("level", T.StringType(), True),
        T.StructField("message", T.StringType(), True),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("_raw", T.StringType(), True),
    ]
)

# Parsed Apache combined log (operator T9; sample line reference
# README.md:47, enhancement called out at README.md:58).
APACHE_ACCESS = T.StructType(
    [
        T.StructField("client_ip", T.StringType(), True),
        T.StructField("identd", T.StringType(), True),
        T.StructField("user", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("method", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("protocol", T.StringType(), True),
        T.StructField("status", T.IntegerType(), True),
        T.StructField("bytes", T.LongType(), True),
        T.StructField("referer", T.StringType(), True),
        T.StructField("user_agent", T.StringType(), True),
    ]
)

# --- Driver testdata tables (read-only star schema + events etc.) ------
TESTDATA_TABLES = (
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
