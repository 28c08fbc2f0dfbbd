"""50x-scale probe of run_media_pipeline's ingest-time ``transform``
hook (r10 addition, previously measured only at e2e-test scale — a
handful of payloads). Question: does normalize-before-gate add more
than the map-only resize cost as batches scale, i.e. does the hook
perturb the fenced ingest's per-trigger profile?

Protocol: N micro-batches of B 16x16 PPM images each (default
10 x 1000 = 10,000 payloads, ~50x the e2e test's 4-row batches)
through the SAME pipeline twice on one host — once with
``transform=resize_media(8, 8, on_exotic='null')``, once without —
availableNow drains per batch so per-trigger wall time is observable.
Prints one JSON line: per-trigger times for both runs, totals, and
the ingest accounting. Stored counts legitimately DIFFER between the
sides: dedup operates on the NORMALIZED payloads by design
(normalize-before-gate), and 8x8 dHashes collapse more near-dups than
16x16 ones — the conservation check is per side instead: every input
row is stored, counted duplicate, or dead-lettered.

Usage: python tools/probe_media_transform_50x.py [n_batches] [rows_per]
Run on an idle host (shares local[32]).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = os.environ.get("SPARK_GRAFT_PROBE_DIR", "/tmp/media_transform_50x")


def _ppm(group: int, member: int, width: int = 16, height: int = 16) -> bytes:
    # the test fixture's closed form (tests/test_media_stream.py):
    # same-group members near-dup, groups differ
    npx = width * height * 3
    i = np.arange(npx, dtype=np.int64)
    px = (group * 37 + 3 * i * i + 11 * i) % 256
    if member:
        lo = (member * 61) % (npx - 12)
        px = px.copy()
        px[lo : lo + 12] = 255 - px[lo : lo + 12]
    return f"P6\n{width} {height}\n255\n".encode() + px.astype(np.uint8).tobytes()


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    rows_per = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    from pyspark.sql import SparkSession

    from unified_log_aggregation_and_analytics_spark.operators import (
        multimodal as MM,
    )
    from unified_log_aggregation_and_analytics_spark.streaming import media as SM

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("media_transform_50x")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run_side(tag: str, transform):
        root = os.path.join(WORK, tag)
        shutil.rmtree(root, ignore_errors=True)
        src = os.path.join(root, "incoming")
        os.makedirs(src)
        times = []
        base = 0
        for b in range(n_batches):
            rows = [
                (
                    base + r,
                    "image",
                    _ppm((base + r) // 4, (base + r) % 4),
                    "image/x-portable-pixmap",
                    None,
                    None,
                    None,
                )
                for r in range(rows_per)
            ]
            base += rows_per
            spark.createDataFrame(rows, MM.MEDIA_SCHEMA).coalesce(4).write.mode(
                "append"
            ).parquet(src)
            t0 = time.monotonic()
            res = SM.run_media_pipeline(
                spark,
                src,
                os.path.join(root, "table"),
                os.path.join(root, "rejected"),
                os.path.join(root, "ckpt"),
                max_hamming=3,
                transform=transform,
            )
            res.query.awaitTermination(600)
            times.append(round(time.monotonic() - t0, 3))
        from pyspark.sql import functions as F

        stored = spark.read.parquet(os.path.join(root, "table"))
        n_stored = stored.count()
        widths = [r.width for r in stored.select("width").distinct().collect()]
        m = spark.read.parquet(os.path.join(root, "table") + "_metrics")
        acct = {
            r.outcome: r.n
            for r in m.groupBy("outcome").agg(F.sum("n").alias("n")).collect()
        }
        return times, n_stored, widths, acct

    t_plain, n_plain, w_plain, a_plain = run_side("plain", None)
    t_resize, n_resize, w_resize, a_resize = run_side(
        "resize", lambda df: MM.resize_media(df, 8, 8, on_exotic="null")
    )

    total_rows = n_batches * rows_per
    out = {
        "probe": "media_transform_50x",
        "n_batches": n_batches,
        "rows_per": rows_per,
        "plain": {"per_trigger": t_plain, "total": round(sum(t_plain), 3),
                  "stored": n_plain, "widths": w_plain, "accounting": a_plain},
        "resize": {"per_trigger": t_resize, "total": round(sum(t_resize), 3),
                   "stored": n_resize, "widths": w_resize, "accounting": a_resize},
        "conserved": all(
            sum(a.values()) == total_rows and a.get("ingested", 0) == n
            for a, n in ((a_plain, n_plain), (a_resize, n_resize))
        ),
        "overhead_x": round(sum(t_resize) / max(sum(t_plain), 1e-9), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
