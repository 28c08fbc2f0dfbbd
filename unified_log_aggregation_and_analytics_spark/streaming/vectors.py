"""Streaming vector-index maintenance — continuous embedding ingest
into the persisted IVF index (operators/ann_index.py), completing the
streaming family: logs (pipeline.py), text corpus (corpus.py), media
(media.py), semantic dedup (semantic.py), and HERE the searchable ANN
index itself. This is the reference's continuous-indexing contract
(Firehose -> daily OpenSearch index, README.md:30) applied to
vectors: every micro-batch of embeddings becomes immediately
probe-able, no rebuild.

Per micro-batch:

1. GATE — schema/dimension check against the index's persisted
   dimension (manifest): wrong-width or null vectors dead-letter with
   ``_error`` (the decode-gate pattern of streaming/media.py);
2. DEDUP — ids already in the index (or duplicated within the batch)
   drop via an id-sidecar anti-join — ``(vec_id, id_bucket)`` rows,
   ~16 B each, partition-pruned, the corpus vectors are never
   re-read (the fingerprint-sidecar pattern of corpus.py);
3. APPEND — survivors assign against the FROZEN centroid artifact
   (one Arrow GEMM over the delta, ann_index.append_ivf_index) and
   land in the per-cell partitions, immediately visible to
   ivf_probe;
4. METRICS — per-batch outcome counts append to ``<path>_metrics``
   as the completion marker (K5 parity, observe()-style accounting).

Delivery is at-least-once with the same bounded-duplication window as
corpus.py: a batch replayed after completing its id-sidecar append is
idempotent (its ids anti-join away); a failure between the index
append and the sidecar append re-appends those rows on replay — the
metrics marker fences torn batches, and a transactional table format
is the documented upgrade path.

At 100 TB: frozen-quantizer appends are the only sane online policy
(recomputing centroids per trigger would reshuffle every existing
assignment); centroid drift under heavy append is an explicit rebuild
decision driven by the manifest's append/build ratio.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_ID_BUCKETS = 64


def _id_sidecar_path(index_path: str) -> str:
    return f"{index_path}_ids"


def vector_ingest_batch(
    batch_df: DataFrame,
    index_path: str,
    rejected_path: str,
    batch_id: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    meta_cols: tuple[str, ...] = (),
) -> None:
    """Ingest ONE micro-batch of embeddings into the persisted IVF
    index (see module docstring for the gate -> dedup -> append ->
    metrics contract). The index must already exist
    (ann_index.build_ivf_index) — the quantizer is frozen at build
    time, which is what makes streaming appends deterministic."""
    from unified_log_aggregation_and_analytics_spark.operators.ann_index import (
        append_ivf_index,
        manifest_dim,
    )

    spark = batch_df.sparkSession
    dim = manifest_dim(index_path)
    if dim is None:
        # pre-manifest index: derive the width from the centroid artifact
        from unified_log_aggregation_and_analytics_spark.operators.ann_index import (
            load_centroids,
        )

        dim = int(load_centroids(spark, index_path, vec_col).shape[1])

    ok = F.col(vec_col).isNotNull() & (F.size(vec_col) == F.lit(dim))
    gated = batch_df.withColumn("_ok", ok)
    gated.persist()
    try:
        (
            gated.filter(~F.col("_ok"))
            .drop("_ok")
            .withColumn("_error", F.lit("bad_dimension"))
            .write.mode("append")
            .parquet(rejected_path)
        )
        kept = gated.filter(F.col("_ok")).drop("_ok")
        # within-batch dedup: deterministic keep-min on the id itself
        # (ids are the identity here; content dedup is semantic.py's job)
        kept = kept.dropDuplicates([id_col])
        sidecar = _id_sidecar_path(index_path)
        try:
            seen = spark.read.parquet(sidecar).select(id_col)
            kept = kept.join(seen, id_col, "left_anti")
        except Exception:
            pass  # first trigger: nothing ingested yet
        # SEVER LINEAGE before the sidecar append below — kept's plan
        # reads the sidecar (the anti-join), and appending to that
        # path would recache the plan against post-append state (the
        # corpus.py WRITE ORDER incident class).
        kept = kept.localCheckpoint()
        n_in = gated.count()
        n_kept = kept.count()
        n_bad = gated.filter(~F.col("_ok")).count()
        if n_kept:
            append_ivf_index(
                kept, index_path, vec_col=vec_col, id_col=id_col, meta_cols=meta_cols
            )
        (
            kept.select(
                id_col,
                F.pmod(F.xxhash64(F.col(id_col)), F.lit(N_ID_BUCKETS)).alias(
                    "id_bucket"
                ),
            )
            .write.mode("append")
            .partitionBy("id_bucket")
            .parquet(sidecar)
        )
        if batch_id is not None:
            rows = [
                (int(batch_id), "ingested", n_kept),
                (int(batch_id), "duplicate", n_in - n_bad - n_kept),
                (int(batch_id), "rejected:bad_dimension", n_bad),
            ]
            spark.createDataFrame(
                rows, "batch_id long, outcome string, n long"
            ).write.mode("append").parquet(f"{index_path}_metrics")
    finally:
        gated.unpersist()


@dataclass
class VectorPipelineResult:
    query: object  # StreamingQuery


def run_vector_pipeline(
    vec_stream: DataFrame,
    index_path: str,
    rejected_path: str,
    checkpoint: str,
    trigger: dict | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    meta_cols: tuple[str, ...] = (),
) -> VectorPipelineResult:
    """readStream of embeddings -> foreachBatch(vector_ingest_batch):
    the continuously-probe-able vector index. Trigger defaults to the
    reference's 60 s buffering hint; tests pass availableNow."""
    trigger = trigger or {"processingTime": "60 seconds"}

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        vector_ingest_batch(
            batch_df,
            index_path,
            rejected_path,
            batch_id=batch_id,
            vec_col=vec_col,
            id_col=id_col,
            meta_cols=meta_cols,
        )

    q = (
        vec_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(**trigger)
        .start()
    )
    return VectorPipelineResult(q)
