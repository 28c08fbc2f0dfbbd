"""PySpark-native unified log aggregation & analytics engine.

A from-scratch re-expression of the capabilities of
aws-samples/unified-log-aggregation-and-analytics (reference at
/root/reference, read-only): four log producers -> Firehose delivery
streams -> per-source daily-rotated OpenSearch indices, plus the
Discover/Dashboards analytics surface — rebuilt Spark-first:

- ingestion  = Structured Streaming file/rate sources (sources/)
- transforms = DataFrame column expressions (operators/transforms.py),
  byte-faithful Firehose-envelope compat in operators/compat.py
- delivery   = foreachBatch -> partitioned Parquet sink with a
  dead-letter split (streaming/pipeline.py)
- analytics  = the Q1-Q18 relational surface (operators/relational.py)
- LLM-data-pipeline extensions: dedup, similarity search, text
  analysis, multimodal columns (operators/{dedup,similarity,text,
  multimodal}.py)

Design notes for 100 TB scale live in each module's docstring; the
cross-cutting rules: declarative DataFrame plans only (Catalyst does
pushdown/pruning), broadcast small dims, partition by (source,
log_date) to reproduce the reference's daily index rotation as
partition pruning (reference README.md:30), Pandas UDFs only where
built-ins genuinely cannot express the semantics.
"""

from unified_log_aggregation_and_analytics_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
