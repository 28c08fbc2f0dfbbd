"""Capture the SCORE-PASS plans for the approx curriculum/token-budget
entries, with and without the r14 `_spread` round-robin repartition.

Both declared queries materialize their ordered frame through a
localCheckpoint inside the operator, so the declared query's final
physical plan cannot show the `_spread` change — the checkpoint
boundary replaces everything upstream with `Scan ExistingRDD`. The
frame the change affects is the score pass feeding that checkpoint:
this tool captures its plan in both forms so the added Exchange (and
the one-split parquet scan under it) is on record.

Writes plans/r14/<entry>_scorepass_{before,after}.txt.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from unified_log_aggregation_and_analytics_spark.session import get_spark
from unified_log_aggregation_and_analytics_spark.catalog_llm import _spread, _t
from unified_log_aggregation_and_analytics_spark.operators.text import quality_score


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
    )
    spark = get_spark("capture-scorepass-plans")

    def tb_score_pass(docs):
        # mirrors docs_token_budget_approx's projection (catalog_llm.py)
        toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        ttr_raw = F.size(F.array_distinct(F.split(F.col("text"), " "))).cast(
            "double"
        ) / F.size(F.split(F.col("text"), " "))
        return docs.select(
            "doc_id", F.size(toks).alias("n_tokens"), ttr_raw.alias("_ttr_raw")
        )

    captures = {
        "docs_curriculum_order_approx_scorepass_before": quality_score(
            _t(spark, sf_dir, "documents")
        ),
        "docs_curriculum_order_approx_scorepass_after": quality_score(
            _spread(_t(spark, sf_dir, "documents"))
        ),
        "docs_token_budget_approx_scorepass_before": tb_score_pass(
            _t(spark, sf_dir, "documents")
        ),
        "docs_token_budget_approx_scorepass_after": tb_score_pass(
            _spread(_t(spark, sf_dir, "documents"))
        ),
    }
    for name, df in captures.items():
        path = os.path.join(out_dir, f"{name}.txt")
        with open(path, "w") as f:
            f.write(_plan(df))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
