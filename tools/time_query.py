"""Isolated per-query timing: noop sink, one warmup, min/median of N.

    python tools/time_query.py [--n 5] [--sf-dir DIR] query [query ...]

Follows bench.py's protocol (same eager-rebuild rule) but isolates a
handful of entries so a before/after comparison is not polluted by the
rest of the suite (guide §1.4).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unified_log_aggregation_and_analytics_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import bench
    import __spark_entry__ as entrymod

    qs = dict(entrymod.queries())
    spark = get_spark("time-query")
    out = {}
    for name in args.queries:
        eager = name in bench.EAGER_QUERIES
        df = None if eager else qs[name](spark, args.sf_dir)

        def run():
            d = qs[name](spark, args.sf_dir) if eager else df
            d.write.format("noop").mode("overwrite").save()

        run()  # warmup (codegen compile)
        runs = []
        for _ in range(args.n):
            t0 = time.time()
            run()
            runs.append(time.time() - t0)
        out[name] = {
            "min": round(min(runs), 3),
            "median": round(statistics.median(runs), 3),
            "runs": [round(r, 3) for r in runs],
        }
        spark.catalog.clearCache()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
