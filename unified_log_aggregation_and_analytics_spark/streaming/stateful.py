"""Custom stateful streaming operators (applyInPandasWithState).

The reference's pipeline has no custom state (Firehose is stateless
per record), but the analytics surface it delegates to OpenSearch
includes alerting-style views no single window primitive expresses:
"error burst" detection needs a per-key running counter that survives
across micro-batches and emits only on state *transitions*
(ok -> alerting, alerting -> ok). That is exactly the
``applyInPandasWithState`` contract: grouped state + Arrow-batched
user logic + timeout-driven finalization.

Scale notes: state lives in the state store keyed by the group —
per-key bytes are a handful of counters, so 10^9 keys is a few GB
spread across executors (use RocksDB state store in production).
The Python hook sees one Arrow batch per key per micro-batch; no
per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ALERT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("transition", StringType()),  # 'alert' | 'recover'
        StructField("n_errors_in_state", LongType()),
        StructField("batch_errors", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("alerting", IntegerType()),
        StructField("total_errors", LongType()),
    ]
)


def error_burst_alerts(
    df: DataFrame,
    threshold: int = 3,
    timeout: str = "ProcessingTimeTimeout",
    recover_after_ms: int = 60_000,
) -> DataFrame:
    """Per-source error-burst detector: emits a row only when a source
    crosses ``threshold`` errors in one micro-batch (-> 'alert') or
    quiets down after alerting (-> 'recover'). State (alerting flag +
    lifetime error count) persists across micro-batches.

    Recovery fires two ways: a zero-error batch *containing rows* for
    the key, or — because a crashed source stops sending anything at
    all — a processing-time timeout of ``recover_after_ms`` with no
    rows. Without the timeout path an absent key's state is sticky
    forever (the function is only invoked for keys present in the
    batch), so the default is ``ProcessingTimeTimeout``; pass
    ``timeout="NoTimeout"`` to disable timer-driven recovery.

    Trigger interaction: a pending processing-time timer keeps an
    ``availableNow`` run alive until it fires (up to
    ``recover_after_ms`` after the last batch). For drive-N-batches
    test flows use ``NoTimeout``; continuous triggers are unaffected.

    Input needs columns (source, level); output follows ALERT_SCHEMA.
    """
    use_timer = timeout == "ProcessingTimeTimeout"

    def detect(key, pdfs, state: GroupState):
        import pandas as pd

        source = key[0]
        rows = []
        if use_timer and state.hasTimedOut:
            # No rows for this key within the horizon: a silent source
            # is as recovered as a quiet one.
            alerting, total = state.get if state.exists else (0, 0)
            if alerting:
                rows.append((source, "recover", total, 0))
            state.update((0, total))
        else:
            batch_errors = 0
            for pdf in pdfs:
                batch_errors += int((pdf["level"] == "error").sum())
            alerting, total = state.get if state.exists else (0, 0)
            total += batch_errors
            if batch_errors >= threshold and not alerting:
                alerting = 1
                rows.append((source, "alert", total, batch_errors))
            elif batch_errors == 0 and alerting:
                alerting = 0
                rows.append((source, "recover", total, batch_errors))
            state.update((alerting, total))
            if use_timer:
                # Timeout is cleared on every invocation; re-arm so the
                # recover timer is always counting from the last batch.
                state.setTimeoutDuration(recover_after_ms)

        yield pd.DataFrame(rows, columns=[f.name for f in ALERT_SCHEMA.fields])

    return df.groupBy("source").applyInPandasWithState(
        detect,
        outputStructType=ALERT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )
