"""Trigger-scale probe for the manifest-fenced corpus sink: does
per-trigger cost stay bounded as committed batches accumulate?

The 100 TB streaming concern is not one batch's plan — it is the
SLOPE: every trigger anti-joins against the fingerprint sidecar
(rows grow with corpus size, files and batch partitions grow with
trigger count) and lists the marker directory. If per-trigger wall
time grows super-linearly with trigger ordinal, a 60 s-trigger
deployment eventually cannot keep up; if compaction resets the file
count, the steady state is the documented compact-then-continue
cadence.

Method: N micro-batches of B docs each through corpus_ingest_batch
(exact dedup path — the every-trigger cost; near-dup adds sidecars
with identical growth shape), recording wall time per trigger.
Halfway through, compact_sidecars folds the fp sidecar; the probe
reports mean trigger time in windows before/after so the file-count
effect is visible, plus marker-listing time at the end.

Usage: python tools/probe_fence_triggers.py [n_triggers] [docs_per]
(defaults 120 x 200). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SPARK_GRAFT_PROBE_DIR", "/tmp/fence_triggers")


def main() -> None:
    n_triggers = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    docs_per = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from unified_log_aggregation_and_analytics_spark.streaming import fence
    from unified_log_aggregation_and_analytics_spark.streaming.corpus import (
        compact_sidecars,
        corpus_ingest_batch,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("fence_triggers")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = (
        spark.read.parquet(os.path.join(SRC, "documents.parquet"))
        .select("doc_id", "text", "lang", "source", "n_chars")
        .limit(n_triggers * docs_per)
        .collect()
    )
    shutil.rmtree(WORK, ignore_errors=True)
    table = os.path.join(WORK, "corpus")
    rejected = os.path.join(WORK, "rejected")

    root = fence.fence_root(table)

    def marker_stats() -> tuple[float, int, int]:
        """(listing ms, committed count, marker FILE count)."""
        m0 = time.monotonic()
        ids = fence.committed_batches(spark, root)
        ms = round((time.monotonic() - m0) * 1000, 1)
        files = len(fence.list_dir_names(spark, root))
        return ms, len(ids), files

    times: list[float] = []
    compact_at = n_triggers // 2
    compact_sec = None
    pre_rollup = post_rollup = None
    for t in range(n_triggers):
        batch = spark.createDataFrame(
            docs[t * docs_per : (t + 1) * docs_per],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        if t == compact_at:
            # marker listing BEFORE maintenance: one file per trigger
            pre_rollup = marker_stats()
            c0 = time.monotonic()
            compact_sidecars(spark, table)  # also rolls up markers
            compact_sec = round(time.monotonic() - c0, 2)
            # AFTER: one _upto_ rollup replaces the singles
            post_rollup = marker_stats()
        t0 = time.monotonic()
        corpus_ingest_batch(batch, table, rejected, batch_id=t)
        times.append(time.monotonic() - t0)

    def window(lo: int, hi: int) -> float:
        xs = sorted(times[lo:hi])
        return round(sum(xs) / len(xs), 3)

    # end-of-run maintenance: rollup alone (no data compaction), then
    # the steady-state listing a month-long deployment would pay
    fence.rollup_markers(spark, root)
    final = marker_stats()

    w = max(n_triggers // 6, 1)
    out = {
        "n_triggers": n_triggers,
        "docs_per_trigger": docs_per,
        "mean_first_window_s": window(1, 1 + w),  # skip cold trigger 0
        "mean_pre_compact_s": window(compact_at - w, compact_at),
        "mean_post_compact_s": window(compact_at, compact_at + w),
        "mean_last_window_s": window(n_triggers - w, n_triggers),
        "compact_sec": compact_sec,
        "pre_rollup": {
            "marker_ms": pre_rollup[0],
            "committed": pre_rollup[1],
            "marker_files": pre_rollup[2],
        },
        "post_rollup": {
            "marker_ms": post_rollup[0],
            "committed": post_rollup[1],
            "marker_files": post_rollup[2],
        },
        "final_after_rollup": {
            "marker_ms": final[0],
            "committed": final[1],
            "marker_files": final[2],
        },
        "corpus_rows": fence.fenced_read(spark, table, root).count(),
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
