"""Capture .explain('formatted') output for bench/catalog queries.

Writes plans/<round>/<query>_<tag>.txt for each named query (default:
every BENCH_QUERIES entry). Usage:

    python tools/capture_plans.py --tag before [--round r14] [query ...]

Eager-by-contract entries still only have their PLAN captured here —
construction-time jobs run (they must, to build the frame), but the
file records the final frame's physical plan, which is what the
optimization evidence needs.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unified_log_aggregation_and_analytics_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True, help="suffix: before/after")
    ap.add_argument("--round", default="r14")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="*", help="query names (default: bench headline list)")
    args = ap.parse_args()

    import bench
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = args.queries or bench.BENCH_QUERIES
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", args.round)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture-plans")
    for name in names:
        try:
            df = qs[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001 — record the failure in the artifact
            plan = f"ERROR building {name}: {e}\n"
        path = os.path.join(out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
