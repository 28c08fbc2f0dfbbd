"""Golden transformer-parity tests: the exact input/output pairs the
reference publishes (EC2: README.md:44-56; Lambda: README.md:92-164),
byte-for-byte through the compat Firehose-envelope transforms.
"""

from __future__ import annotations

import base64
import json

from unified_log_aggregation_and_analytics_spark.operators.compat import (
    firehose_ec2_transform,
    firehose_lambda_transform,
)

# Sample access-log line from reference README.md:47.
EC2_LINE = (
    '46.99.153.40 - - [29/Jul/2021:15:32:33 +0000] "GET / HTTP/1.1" 200 173 "-" '
    '"Mozilla/5.0 (Windows NT 6.1; WOW64) AppleWebKit/537.36 (KHTML, like Gecko) '
    'Chrome/51.0.2704.103 Safari/537.36"'
)

# Lambda telemetry batch from reference README.md:95-147 (6 events,
# 2 of type function) and its golden output README.md:149-163.
LAMBDA_EVENTS = [
    {
        "time": "2021-07-29T19:54:08.949Z",
        "type": "platform.start",
        "record": {"requestId": "024ae572-72c7-44e0-90f5-3f002a1df3f2", "version": "$LATEST"},
    },
    {
        "time": "2021-07-29T19:54:09.094Z",
        "type": "platform.logsSubscription",
        "record": {
            "name": "kinesisfirehose-logs-extension-demo",
            "state": "Subscribed",
            "types": ["platform", "function"],
        },
    },
    {
        "time": "2021-07-29T19:54:09.096Z",
        "type": "function",
        "record": "2021-07-29T19:54:09.094Z\tundefined\tINFO\tLoading function\n",
    },
    {
        "time": "2021-07-29T19:54:09.096Z",
        "type": "platform.extension",
        "record": {
            "name": "kinesisfirehose-logs-extension-demo",
            "state": "Ready",
            "events": ["INVOKE", "SHUTDOWN"],
        },
    },
    {
        "time": "2021-07-29T19:54:09.097Z",
        "type": "function",
        "record": "2021-07-29T19:54:09.097Z\t024ae572-72c7-44e0-90f5-3f002a1df3f2\tINFO\tvalue1 = value1\n",
    },
    {
        "time": "2021-07-29T19:54:09.098Z",
        "type": "platform.runtimeDone",
        "record": {"requestId": "024ae572-72c7-44e0-90f5-3f002a1df3f2", "status": "success"},
    },
]


def _envelope(spark, payload: str, record_id: str = "rec-1"):
    data = base64.b64encode(payload.encode()).decode()
    return spark.createDataFrame([(record_id, data)], "recordId string, data string")


def _js_stringify(obj) -> str:
    # JSON.stringify: compact separators, insertion order preserved
    return json.dumps(obj, separators=(",", ":"), ensure_ascii=False)


def test_ec2_transform_golden(spark):
    out = firehose_ec2_transform(_envelope(spark, EC2_LINE)).collect()
    assert len(out) == 1
    row = out[0]
    assert row.recordId == "rec-1"
    assert row.result == "Ok"
    decoded = base64.b64decode(row.data).decode()
    # byte-exact JSON.stringify({"logs": line}) per ec2/lambda/index.js:4-8
    assert decoded == _js_stringify({"logs": EC2_LINE})


def test_ec2_transform_empty_batch(spark):
    # event.records empty still returns {records: []} (ec2/lambda/index.js:2,16)
    df = spark.createDataFrame([], "recordId string, data string")
    assert firehose_ec2_transform(df).collect() == []


def test_lambda_transform_golden(spark):
    payload = _js_stringify(LAMBDA_EVENTS)
    out = firehose_lambda_transform(_envelope(spark, payload)).collect()
    assert len(out) == 1
    row = out[0]
    assert row.result == "Ok"
    decoded = base64.b64decode(row.data).decode()
    expected = _js_stringify(
        {
            "logEvent_1": LAMBDA_EVENTS[2],
            "logEvent_2": LAMBDA_EVENTS[4],
        }
    )
    # byte-exact: only function events survive, re-keyed logEvent_N
    # with per-record ordinal (transformer/index.js:7-12)
    assert decoded == expected


def test_lambda_transform_zero_function_events(spark):
    # a batch with no function events yields {} with result Ok
    # (transformer/index.js:5-18)
    payload = _js_stringify([LAMBDA_EVENTS[0], LAMBDA_EVENTS[1]])
    out = firehose_lambda_transform(_envelope(spark, payload)).collect()
    assert out[0].result == "Ok"
    assert base64.b64decode(out[0].data).decode() == "{}"


def test_lambda_transform_malformed_json_routes_to_dlq(spark):
    # documented divergence: malformed payload -> ProcessingFailed with
    # original data echoed (reference would throw and poison the batch)
    bad = base64.b64encode(b"this is not json").decode()
    df = spark.createDataFrame([("r1", bad)], "recordId string, data string")
    out = firehose_lambda_transform(df).collect()
    assert out[0].result == "ProcessingFailed"
    assert out[0].data == bad


def test_lambda_transform_ordinal_restarts_per_record(spark):
    # logEvent_N numbering restarts at 1 for EACH record (the ++index
    # is per-invocation-record in transformer/index.js:6-11)
    payload = _js_stringify([LAMBDA_EVENTS[2]])
    df = spark.createDataFrame(
        [("r1", base64.b64encode(payload.encode()).decode()),
         ("r2", base64.b64encode(payload.encode()).decode())],
        "recordId string, data string",
    )
    rows = {r.recordId: r for r in firehose_lambda_transform(df).collect()}
    for rid in ("r1", "r2"):
        decoded = json.loads(base64.b64decode(rows[rid].data))
        assert list(decoded.keys()) == ["logEvent_1"]


def test_ec2_transform_unicode_multiline(spark):
    # unicode + embedded newline round-trips byte-exactly through the
    # envelope (JSON escaping matches JSON.stringify)
    line = 'GET /héllo?q=日本語 200 "-" "Mözilla\\n/5.0"'
    out = firehose_ec2_transform(_envelope(spark, line, record_id="u1")).collect()
    decoded = base64.b64decode(out[0].data).decode()
    assert decoded == _js_stringify({"logs": line})
    assert json.loads(decoded)["logs"] == line
