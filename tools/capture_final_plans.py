"""Capture the AQE FINAL (isFinalPlan=true) physical plan for queries.

The r14 shuffled-hash-join change is a pure AQE runtime rewrite
(`spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold`): the static
plan — what `capture_plans.py` records — is identical before and after
by design. The observable difference is the adaptively executed plan,
so this tool EXECUTES each query through the noop sink and then records
`explain("formatted")`, which at that point shows the final adaptive
plan with any SortMergeJoin -> ShuffledHashJoin rewrites applied.

Usage:
    SPARK_GRAFT_SHJ_MAP_THRESHOLD=0 python tools/capture_final_plans.py \
        --tag finalplan_before tpch_q2
    python tools/capture_final_plans.py --tag finalplan_after tpch_q2
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unified_log_aggregation_and_analytics_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--round", default="r14")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.round,
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture-final-plans")
    for name in args.queries:
        df = qs[name](spark, args.sf_dir)
        # Execute the df's OWN QueryExecution (a noop write would wrap
        # the plan in a write command with a separate execution, leaving
        # this one lazy and the AQE rewrites unresolved). These are
        # aggregate/top-k queries with small results.
        df.collect()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
