"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query on sf0.001 (smoke check, rows > 0)
queries()     -> one callable per implemented operator (SURVEY.md §2)
oracle_sql()  -> DuckDB-equivalent SQL per query (correctness gate)

The catalog itself lives in
unified_log_aggregation_and_analytics_spark/catalog*.py — importing
those modules populates the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Importing the catalog modules registers every query.
import unified_log_aggregation_and_analytics_spark.catalog as _catalog
import unified_log_aggregation_and_analytics_spark.catalog_logs  # noqa: F401
import unified_log_aggregation_and_analytics_spark.catalog_llm  # noqa: F401

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: hourly error-event histogram over the unified event
    stream — the Discover date-histogram path (Q3+Q6+Q8+Q9) the
    reference delegates to OpenSearch Dashboards (README.md:295-314).
    """
    from pyspark.sql import functions as F

    from unified_log_aggregation_and_analytics_spark.operators import relational as R
    from unified_log_aggregation_and_analytics_spark.sources.batch import load_table

    ev = load_table(spark, "events", _SMOKE_SF_DIR)
    errors = ev.filter(F.col("event_type") == "error")
    return R.date_histogram(errors, "hour").orderBy(F.col("bucket"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark_fn for name, spec in _catalog.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in _catalog.QUERIES.items()
        if spec.oracle is not None
    }
