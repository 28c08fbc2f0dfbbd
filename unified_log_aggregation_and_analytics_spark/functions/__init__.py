"""Scalar-function layer (SURVEY.md §2.5): log parsing + vector math."""

from unified_log_aggregation_and_analytics_spark.functions.apache_log import (
    APACHE_COMBINED_RE,
    parse_apache_combined,
    parse_lambda_record_line,
)
from unified_log_aggregation_and_analytics_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
)

__all__ = [
    "APACHE_COMBINED_RE",
    "parse_apache_combined",
    "parse_lambda_record_line",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
