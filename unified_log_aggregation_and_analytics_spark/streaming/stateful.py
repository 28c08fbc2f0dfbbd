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


# --------------------------------------------------------------------
# Streaming heavy hitters: per-shard Misra-Gries state across batches.
# --------------------------------------------------------------------

HH_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("k", StringType()),
        StructField("est", LongType()),
        StructField("shard_n", LongType()),
    ]
)

from pyspark.sql.types import ArrayType  # noqa: E402

_HH_STATE_SCHEMA = StructType(
    [
        StructField("keys", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("n", LongType()),
    ]
)


def heavy_hitters_stream(
    df: DataFrame,
    key_col: str = "k",
    capacity: int = 64,
    n_shards: int = 16,
    chunk: int = 4096,
) -> DataFrame:
    """Streaming Misra-Gries heavy hitters: the batch summary
    (operators/sketches.py misra_gries_summary) lifted into
    applyInPandasWithState — per-shard counter state (at most
    ``capacity`` keys + the cumulative row count) persists across
    micro-batches, so the top-talker board is continuously maintained
    without ever holding per-key exact counts.

    Guarantees are the batch operator's, applied to the shard's
    WHOLE HISTORY (merging MG summaries batch-by-batch preserves the
    n/(capacity+1) error bound — the mergeable-summaries result).
    Each batch emits the shard's full current summary; downstream
    takes the latest batch per shard (or unions shards — keys are
    hash-disjoint across shards by construction).

    State bytes per shard: capacity keys + counts — KBs, bounded
    regardless of stream cardinality; exactly what a 100 TB/day
    top-talkers pipeline can afford."""
    import pandas as pd

    from pyspark.sql import functions as F

    keyed = df.filter(F.col(key_col).isNotNull()).select(
        # null keys excluded — the batch summary's contract
        # (operators/sketches.py misra_gries_summary), mirrored
        F.col(key_col).cast("string").alias("k"),
        F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
    )

    def update(key, pdfs, state: GroupState):
        shard = int(key[0])
        if state.exists:
            keys, counts, n = state.get
            cdict = dict(zip(keys, map(int, counts)))
            n = int(n)
        else:
            cdict, n = {}, 0
        from unified_log_aggregation_and_analytics_spark.operators.sketches import mg_update

        for pdf in pdfs:
            arr = pdf["k"].to_numpy()
            n += len(arr)
            # the decrement rule is the SHARED helper — batch and
            # streaming must evict identically or the documented
            # equivalence (and both error bounds) silently breaks
            mg_update(cdict, arr, capacity, chunk)
        state.update((list(cdict.keys()), [int(c) for c in cdict.values()], n))
        yield pd.DataFrame(
            {
                "shard": shard,
                "k": list(cdict.keys()),
                "est": [int(c) for c in cdict.values()],
                "shard_n": n,
            }
        )

    return keyed.groupBy("shard").applyInPandasWithState(
        update,
        HH_SCHEMA,
        _HH_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
