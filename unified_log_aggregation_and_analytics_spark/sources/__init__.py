"""Sources: batch + streaming readers (SURVEY.md §2.1, S1-S7)."""

from unified_log_aggregation_and_analytics_spark.sources.batch import (
    load_table,
    load_tables,
    register_testdata_views,
)
from unified_log_aggregation_and_analytics_spark.sources.logs import (
    read_text_logs,
    read_json_logs,
    stream_text_logs,
    stream_json_logs,
)

__all__ = [
    "load_table",
    "load_tables",
    "register_testdata_views",
    "read_text_logs",
    "read_json_logs",
    "stream_text_logs",
    "stream_json_logs",
]
