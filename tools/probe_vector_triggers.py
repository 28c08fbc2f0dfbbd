"""Trigger-scale probe for the streaming IVF index: probe latency as
fenced delta batches accumulate, and merge_index_delta as the valve.

The delta union in ann_index._index_rows adds one scan branch per
probe whose file count grows with triggers-since-merge (each batch
appends one file per touched cell under its _commit_batch dir). This
probe measures ivf_probe latency at checkpoints while N micro-batches
stream in, then after a merge — the steady state is the documented
merge cadence, mirroring the corpus sink's compact-then-continue
(tools/probe_fence_triggers.py).

Usage: python tools/probe_vector_triggers.py [n_triggers] [vecs_per]
[merge_every] [mode] (defaults 80 x 250 x 0 x merge, dim 64,
16 cells). merge_every > 0 exercises the run_vector_pipeline CADENCE
policy (maybe_merge_delta after every ingest, firing each
merge_every committed batches) — the probe then shows latency
bounded by the cadence instead of drifting with triggers-since-merge;
0 reproduces the r8 manual-merge measurement. mode: 'merge' (base
rewrite) or 'compact' (marker-native delta fold, the object-store
path). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = os.environ.get("SPARK_GRAFT_PROBE_DIR", "/tmp/vector_triggers")


def main() -> None:
    n_triggers = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    vecs_per = int(sys.argv[2]) if len(sys.argv) > 2 else 250
    merge_every = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    mode = sys.argv[4] if len(sys.argv) > 4 else "merge"
    dim, n_cells = 64, 16

    from pyspark.sql import SparkSession

    from unified_log_aggregation_and_analytics_spark.operators.ann_index import (
        build_ivf_index,
        ivf_probe,
        merge_index_delta,
    )
    from unified_log_aggregation_and_analytics_spark.streaming.vectors import (
        maybe_merge_delta,
        vector_ingest_batch,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("vector_triggers")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(7)
    base = rng.standard_normal((2000, dim)).astype(np.float64)
    schema = "vec_id long, embedding array<float>"
    build_ivf_index(
        spark.createDataFrame(
            [(i, [float(x) for x in base[i]]) for i in range(len(base))], schema
        ),
        os.path.join(WORK, "ivf"),
        n_centroids=n_cells,
    )
    index = os.path.join(WORK, "ivf")
    rej = os.path.join(WORK, "rej")
    q = [float(x) for x in base[0]]

    def probe_sec(n: int = 3) -> float:
        runs = []
        for _ in range(n):
            t0 = time.monotonic()
            ivf_probe(spark, index, q, k=10).collect()
            runs.append(time.monotonic() - t0)
        return round(min(runs), 3)

    shutil.rmtree(WORK, ignore_errors=True)
    build_ivf_index(
        spark.createDataFrame(
            [(i, [float(x) for x in base[i]]) for i in range(len(base))], schema
        ),
        index,
        n_centroids=n_cells,
    )

    out = {
        "n_triggers": n_triggers,
        "vecs_per_trigger": vecs_per,
        "merge_every": merge_every,
        "mode": mode,
    }
    out["probe_base_only_s"] = probe_sec()

    next_id = len(base)
    checkpoints = sorted({n_triggers // 4, n_triggers // 2, n_triggers})
    probes = {}
    ingest_times = []
    merges = 0
    merge_total_sec = 0.0
    for t in range(n_triggers):
        vecs = rng.standard_normal((vecs_per, dim)).astype(np.float64)
        batch = spark.createDataFrame(
            [
                (next_id + i, [float(x) for x in vecs[i]])
                for i in range(vecs_per)
            ],
            schema,
        )
        next_id += vecs_per
        t0 = time.monotonic()
        vector_ingest_batch(batch, index, rej, batch_id=t)
        ingest_times.append(time.monotonic() - t0)
        if merge_every > 0:
            m0 = time.monotonic()
            if maybe_merge_delta(spark, index, merge_every, mode=mode):
                merges += 1
                merge_total_sec += time.monotonic() - m0
        if (t + 1) in checkpoints:
            probes[f"probe_at_{t + 1}_batches_s"] = probe_sec()
    out.update(probes)
    if merge_every > 0:
        out["cadence_merges"] = merges
        out["cadence_merge_total_sec"] = round(merge_total_sec, 2)
    w = max(n_triggers // 6, 1)
    xs = sorted(ingest_times[1 : 1 + w])
    out["ingest_mean_first_window_s"] = round(sum(xs) / len(xs), 3)
    xs = sorted(ingest_times[-w:])
    out["ingest_mean_last_window_s"] = round(sum(xs) / len(xs), 3)

    if mode == "merge":
        t0 = time.monotonic()
        merged = merge_index_delta(spark, index)
        out["merge_sec"] = round(time.monotonic() - t0, 2)
        out["merged_batches"] = merged
    out["probe_after_merge_s"] = probe_sec()
    out["rows_visible"] = int(
        __import__(
            "unified_log_aggregation_and_analytics_spark.operators.ann_index",
            fromlist=["_index_rows"],
        )._index_rows(spark, index).count()
    )
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
