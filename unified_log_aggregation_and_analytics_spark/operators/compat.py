"""Byte-faithful Firehose-envelope transformer variants (golden parity).

These reproduce the reference transformers' exact input/output contract
— ``{recordId, data:base64}`` in, ``{recordId, result, data:base64}``
out — including JSON byte layout, for the golden I/O pairs published in
the reference (EC2: README.md:44-56; Lambda: README.md:92-164).

The engine-native typed forms live in transforms.py; this module exists
so a user migrating off the reference can verify parity bit-for-bit.

Scale design: both transforms are pure per-record column expressions
built from higher-order functions (``filter``/``transform`` over the
parsed event array) — no explode, no groupBy, no shuffle, no Python.
A 100 TB replay of archived Firehose batches runs map-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Lambda telemetry events: ``record`` is a JSON object for platform.*
# events and a plain string for function events (reference
# README.md:95-147) — VariantType holds both and ``to_json`` re-emits
# the original shape with JS-compatible escaping.
_TELEMETRY_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("time", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("record", T.VariantType()),
        ]
    )
)

_OK = "Ok"
_FAILED = "ProcessingFailed"


def _b64(col: F.Column) -> F.Column:
    """JS Buffer.toString('base64')-compatible base64: Spark's base64
    emits MIME line breaks every 76 chars; JS emits one line."""
    return F.regexp_replace(F.base64(col), "[\\r\\n]", "")


def firehose_ec2_transform(df: DataFrame) -> DataFrame:
    """Byte-faithful EC2 transformer (reference ec2/lambda/index.js:1-17).

    base64-decode -> wrap as ``{"logs": <line>}`` -> JSON-serialize ->
    base64-encode, echoing ``recordId`` and tagging ``result:'Ok'``.
    ``to_json`` matches ``JSON.stringify`` byte-for-byte here: compact
    separators, same string escaping, single known key.
    """
    line = F.unbase64(F.col("data")).cast("string")
    out_json = F.to_json(F.struct(line.alias("logs")))
    return df.select(
        F.col("recordId"),
        F.lit(_OK).alias("result"),
        _b64(out_json.cast("binary")).alias("data"),
    )


def firehose_lambda_transform(df: DataFrame) -> DataFrame:
    """Byte-faithful Lambda telemetry transformer
    (reference transformer/index.js:1-22; golden I/O README.md:92-164).

    Parses the JSON array payload, keeps only ``type === "function"``
    events, and re-keys survivors ``logEvent_1..N`` (ordinal restarts
    per record, reference transformer/index.js:7-12). Zero function
    events => ``{}`` with ``result:'Ok'`` (reference behavior).

    Divergence (documented improvement): a payload that is not valid
    JSON is tagged ``result:'ProcessingFailed'`` instead of throwing —
    the reference's throw poisons the whole Firehose batch.
    """
    payload = F.unbase64(F.col("data")).cast("string")
    events = F.from_json(payload, _TELEMETRY_SCHEMA)
    fn_events = F.filter(events, lambda e: e["type"] == "function")
    entries = F.transform(
        fn_events,
        lambda e, i: F.concat(
            F.lit('"logEvent_'),
            (i + 1).cast("string"),
            F.lit('":'),
            F.to_json(e),
        ),
    )
    out_json = F.concat(F.lit("{"), F.concat_ws(",", entries), F.lit("}"))
    return df.select(
        F.col("recordId"),
        F.when(events.isNull(), F.lit(_FAILED)).otherwise(F.lit(_OK)).alias("result"),
        F.when(
            events.isNull(), F.col("data")
        ).otherwise(_b64(out_json.cast("binary"))).alias("data"),
    )
