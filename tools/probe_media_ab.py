"""Same-host A/B timing for one eager catalog entry (default
multimodal_ingest_report) — the protocol the r7 verdict prescribed for
unexplained single-entry bench moves: fresh session, one unmeasured
warmup, then min/median of N eager runs (build + noop write inside the
clock, exactly bench.py's EAGER protocol).

The r8 question this answers: multimodal_ingest_report moved
1.41 -> 2.01 s (+43%) in the headline bench with NO plan-affecting
commit touching it (the entry is pure batch — it never touches the
fence the r8 round rewrote). Run this script twice back-to-back on an
idle host — once from the current tree, once from a worktree of the
prior round's commit — and compare the mins: equal mins = the bench
move was session-state variance, not code.

Usage: python tools/probe_media_ab.py [entry] [n_runs]
Prints one JSON line with all run times.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    entry = sys.argv[1] if len(sys.argv) > 1 else "multimodal_ingest_report"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("media_ab")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    def run() -> float:
        t0 = time.monotonic()
        qs[entry](spark, SRC).write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    run()  # warmup (codegen compile, Python worker spawn)
    times = [round(run(), 3) for _ in range(n_runs)]
    out = {
        "entry": entry,
        "sf_dir": SRC,
        "tree": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "runs": times,
        "min_s": min(times),
        "median_s": sorted(times)[len(times) // 2],
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
