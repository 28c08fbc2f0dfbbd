"""Streaming LLM-corpus ingestion — the document-side twin of the log
pipeline (streaming/pipeline.py): documents arrive continuously, each
micro-batch is quality-filtered, fingerprint-deduplicated against
everything already ingested, and appended to a mixture-aware
partitioned corpus with a dead-letter path for rejects.

Mirrors the reference's ingestion shape
(/root/reference/lib/common/utils.ts:44-81 — buffered delivery,
FailedDocumentsOnly backup) applied to training-corpus ingest instead
of log delivery: the DLQ carries the *reason* (the first failed
quality rule), and the sink partitions by the mixture stratum (lang)
so downstream mixture sampling (operators/sampling.py mixture_sample)
partition-prunes per-stratum quotas instead of scanning the corpus.

Cross-batch dedup at 100 TB: the naive design (anti-join each delta
against the corpus) re-reads the corpus text per trigger. Instead the
sink maintains a FINGERPRINT SIDECAR — a parquet table holding only
``(fp, fp_bucket)``, ~16 bytes/row, partitioned by
``fp_bucket = pmod(fp, N_FP_BUCKETS)`` — and each delta anti-joins
against the sidecar alone: read cost scales with |corpus| * 16 B (and
partition-prunes to the delta's buckets), never with corpus text
bytes, and the join shuffles on the uniform hash bucket. This is the
same persisted-artifact pattern as the token/ANN indexes
(operators/ann_index.py): assignment is a pure function (xxhash64 of
the normalized text), so append never rewrites base state.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unified_log_aggregation_and_analytics_spark.operators.text import quality_filter

N_FP_BUCKETS = 64


def _fp_sidecar_path(table_path: str) -> str:
    return f"{table_path}_fingerprints"


def doc_fingerprint(text_col: str = "text") -> F.Column:
    """Content fingerprint for exact dedup: xxhash64 of the
    whitespace-normalized text (JVM-side, codegen). The md5 twin used
    by the batch-analog oracle (catalog_llm.docs_corpus_ingest) is
    value-equivalent for dedup purposes: both collapse exactly the
    rows with identical normalized text."""
    return F.xxhash64(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))


def corpus_ingest_batch(
    batch_df: DataFrame,
    table_path: str,
    rejected_path: str,
    stratum_col: str = "lang",
) -> None:
    """Ingest ONE micro-batch of documents:

    1. quality verdicts (operators/text.py quality_filter — C4/Gopher
       rules, first-failed-rule reporting);
    2. rejects -> ``rejected_path`` with ``_error`` = the failed rule
       (the log pipeline's DLQ shape, pipeline.py dlq_split);
    3. survivors dedup within the batch (keep min doc_id per
       fingerprint) and against the sidecar (anti-join on
       ``(fp_bucket, fp)`` — reads fingerprints, never corpus text);
    4. new docs append to ``table_path`` partitioned by the mixture
       stratum; their fingerprints append to the sidecar.

    Persisted like dlq_split: verdicts + fingerprints are computed
    once, then feed three writes (table, DLQ, sidecar)."""
    spark = batch_df.sparkSession
    scored = (
        batch_df.join(
            quality_filter(batch_df).select("doc_id", "verdict", "kept"), "doc_id"
        )
        .withColumn("fp", doc_fingerprint())
        .withColumn("fp_bucket", F.pmod(F.col("fp"), F.lit(N_FP_BUCKETS)))
    )
    scored.persist()
    try:
        (
            scored.filter(~F.col("kept"))
            .drop("kept", "fp", "fp_bucket")
            .withColumnRenamed("verdict", "_error")
            .write.mode("append")
            .parquet(rejected_path)
        )
        kept = scored.filter(F.col("kept")).drop("kept", "verdict")
        # within-batch dedup: min doc_id per fingerprint, one shuffle on
        # the uniform fp key (same plan family as dedup_exact)
        first = kept.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
        kept = kept.join(first, ["fp", "doc_id"])
        # cross-batch dedup: anti-join against the fingerprint sidecar
        # only — never the corpus. First trigger: no sidecar yet.
        sidecar = _fp_sidecar_path(table_path)
        try:
            seen = spark.read.parquet(sidecar)
            buckets = [r[0] for r in kept.select("fp_bucket").distinct().collect()]
            seen = seen.filter(F.col("fp_bucket").isin(buckets))
            kept = kept.join(seen, ["fp_bucket", "fp"], "left_anti")
        except Exception:
            pass  # sidecar absent: nothing ingested yet
        kept.persist()
        try:
            (
                kept.drop("fp", "fp_bucket")
                .write.mode("append")
                .partitionBy(stratum_col)
                .parquet(table_path)
            )
            (
                kept.select("fp", "fp_bucket")
                .write.mode("append")
                .partitionBy("fp_bucket")
                .parquet(sidecar)
            )
        finally:
            kept.unpersist()
    finally:
        scored.unpersist()


@dataclass
class CorpusPipelineResult:
    query: object  # StreamingQuery

    def await_done(self) -> None:
        self.query.awaitTermination()


def run_corpus_pipeline(
    docs_stream: DataFrame,
    table_path: str,
    rejected_path: str,
    checkpoint: str,
    stratum_col: str = "lang",
    trigger: dict | None = None,
) -> CorpusPipelineResult:
    """Wire the corpus ingest end-to-end: readStream of documents ->
    foreachBatch(corpus_ingest_batch). Trigger defaults to the
    reference's 60 s buffering hint (utils.ts:46); tests pass
    ``availableNow=True``. Exactly-once story is the same as the log
    pipeline: the checkpoint replays an interrupted batch, and the
    fingerprint sidecar makes the replayed append idempotent for the
    corpus table (duplicate fingerprints from a torn batch anti-join
    away on retry)."""
    trigger = trigger or {"processingTime": "60 seconds"}

    def handle(batch_df: DataFrame, _batch_id: int) -> None:
        corpus_ingest_batch(batch_df, table_path, rejected_path, stratum_col)

    q = (
        docs_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(**trigger)
        .start()
    )
    return CorpusPipelineResult(q)


def ingest_report(
    docs: DataFrame, dedup_fp: F.Column | None = None
) -> DataFrame:
    """Batch analog of the full ingest routing — the oracle-checkable
    certificate the streaming path is tested against: every document
    is routed to exactly one outcome,

    - ``rejected:<rule>`` — failed that quality rule,
    - ``duplicate``     — kept, but another kept doc with the same
      fingerprint has a lower doc_id,
    - ``ingested``      — written to the corpus,

    and the report is ``(lang, outcome, n_docs)`` — per-stratum ingest
    accounting, the mixture view an operator watches.

    Plan shape: quality rules are one repetition aggregation + a
    doc_id join back; dedup rank is one window over the uniform
    fingerprint key; the rollup is a two-column hash agg. Three
    shuffles at corpus scale, none on skewed keys."""
    from pyspark.sql import Window

    if dedup_fp is None:
        dedup_fp = F.md5(
            F.regexp_replace(F.trim(F.col("text")), r"\s+", " ").cast("binary")
        )
    scored = docs.join(
        quality_filter(docs).select("doc_id", "verdict", "kept"), "doc_id"
    )
    # partition on (fp, kept): the dedup rank competes among KEPT docs
    # only — a rejected doc sharing the fingerprint must not steal
    # rank 1 from the kept copy that actually gets ingested
    w = Window.partitionBy(dedup_fp, F.col("kept")).orderBy("doc_id")
    routed = scored.withColumn(
        "outcome",
        F.when(~F.col("kept"), F.concat(F.lit("rejected:"), F.col("verdict"))).otherwise(
            F.when(F.row_number().over(w) == 1, F.lit("ingested")).otherwise(
                F.lit("duplicate")
            )
        ),
    )
    return routed.groupBy("lang", "outcome").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
