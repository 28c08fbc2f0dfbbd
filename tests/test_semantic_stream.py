"""Streaming semantic dedup (streaming/semantic.py): online SemDeDup
over an embedding stream — within-batch keep-min, cross-batch drop vs
the cell sidecar, DLQ routing, metrics completion marker."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from unified_log_aggregation_and_analytics_spark.streaming import semantic as SS

# two well-separated unit directions; cells assign cleanly
C0 = [1.0, 0.0, 0.0, 0.0]
C1 = [0.0, 1.0, 0.0, 0.0]
CENTROIDS = np.asarray([C0, C1], dtype=np.float64)


def _rows(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _run(spark, src, tmp):
    res = SS.run_semantic_pipeline(
        spark,
        str(src),
        str(tmp / "sem_table"),
        str(tmp / "sem_rejected"),
        str(tmp / "sem_ckpt"),
        CENTROIDS,
        threshold=0.95,
        trigger={"availableNow": True},
    )
    res.query.awaitTermination(120)
    return res


def test_semantic_pipeline_two_batches(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()

    # batch 1: one vector per cell + a within-batch near-dup of id 1
    batch1 = [
        (1, [0.99, 0.01, 0.0, 0.0]),
        (2, [0.02, 0.97, 0.0, 0.0]),
        (3, [0.98, 0.02, 0.0, 0.0]),  # cos(1,3) ~ 1 -> dropped (keep-min)
    ]
    _rows(spark, batch1).write.mode("append").parquet(str(src))
    _run(spark, src, tmp_path)

    table = str(tmp_path / "sem_table")
    ingested = {r.vec_id for r in spark.read.parquet(table).collect()}
    assert ingested == {1, 2}

    # sidecar rows track the corpus exactly
    cells = spark.read.parquet(table + "_cells")
    assert {r.vec_id for r in cells.collect()} == {1, 2}

    # batch 2: a cross-batch near-dup of id 1, a near-dup PAIR (keep
    # min), and a genuinely novel direction in cell 1
    batch2 = [
        (10, [0.985, 0.015, 0.0, 0.0]),  # ~ id 1 -> cross-batch drop
        (11, [0.0, 0.1, 0.99, 0.0]),     # novel (cell argmax -> cell 1)
        (12, [0.0, 0.95, 0.05, 0.0]),    # ~ id 2 -> cross-batch drop
        (13, [0.0, 0.09, 0.992, 0.0]),   # ~ id 11 -> within-batch drop
    ]
    _rows(spark, batch2).write.mode("append").parquet(str(src))
    _run(spark, src, tmp_path)

    ingested = {r.vec_id for r in spark.read.parquet(table).collect()}
    assert ingested == {1, 2, 11}

    rejected = spark.read.parquet(str(tmp_path / "sem_rejected"))
    rej = {r.vec_id: r._error for r in rejected.collect()}
    assert rej == {
        3: "semantic_duplicate",
        10: "semantic_duplicate",
        12: "semantic_duplicate",
        13: "semantic_duplicate",
    }

    # sidecar count == corpus count after a cross-batch near-dup batch
    assert spark.read.parquet(table + "_cells").count() == 3

    # metrics completion marker per batch
    metrics = {
        (r.batch_id, r.outcome): r.n
        for r in spark.read.parquet(table + "_metrics").collect()
    }
    assert metrics[(0, "ingested")] == 2 and metrics[(0, "semantic_duplicate")] == 1
    assert metrics[(1, "ingested")] == 1 and metrics[(1, "semantic_duplicate")] == 3

    # compaction preserves content AND the fenced layout: a
    # post-compaction ingest must still read the sidecar through the
    # fence (the regression class: compacting away the _commit_batch
    # column breaks every later batch's cross-batch dedup)
    SS.compact_cell_sidecar(spark, table)
    assert spark.read.parquet(table + "_cells").count() == 3
    batch3 = [
        (20, [0.987, 0.013, 0.0, 0.0]),  # ~ id 1 -> cross-batch drop
        (21, [0.0, 0.0, 0.0, 0.99]),     # novel direction
    ]
    _rows(spark, batch3).write.mode("append").parquet(str(src))
    _run(spark, src, tmp_path)
    ingested = {r.vec_id for r in spark.read.parquet(table).collect()}
    assert ingested == {1, 2, 11, 21}


def test_semantic_stream_agrees_with_batch_on_chain_free_input(spark, tmp_path):
    """On chain-free data (similarity is transitive within groups and
    batch-1 rows carry smaller ids), the streaming survivors equal the
    batch semantic_dedup survivors — the policy-agreement contract."""
    from unified_log_aggregation_and_analytics_spark.operators.dedup import semantic_dedup

    b1 = [(1, [0.99, 0.01, 0.0, 0.0]), (2, [0.02, 0.97, 0.0, 0.0])]
    b2 = [(10, [0.985, 0.015, 0.0, 0.0]), (11, [0.0, 0.1, 0.99, 0.0])]
    src = tmp_path / "in2"
    src.mkdir()
    _rows(spark, b1).write.mode("append").parquet(str(src))
    _run(spark, src, tmp_path)
    _rows(spark, b2).write.mode("append").parquet(str(src))
    _run(spark, src, tmp_path)
    stream_ids = {
        r.vec_id for r in spark.read.parquet(str(tmp_path / "sem_table")).collect()
    }
    batch_ids = {
        r.vec_id
        for r in semantic_dedup(
            _rows(spark, b1 + b2), CENTROIDS, threshold=0.95
        ).collect()
    }
    assert stream_ids == batch_ids


def test_semantic_ingest_empty_batch_is_noop(spark, tmp_path):
    """An idle-trigger empty micro-batch must no-op cleanly (no
    crash, no rows, sidecar untouched) — the empty-delta failure mode
    the index-append paths guard against."""
    b1 = [(1, [0.99, 0.01, 0.0, 0.0])]
    table = str(tmp_path / "t")
    SS.semantic_ingest_batch(
        _rows(spark, b1), table, str(tmp_path / "r"), CENTROIDS,
        threshold=0.95, batch_id=0,
    )
    empty = _rows(spark, b1).limit(0)
    SS.semantic_ingest_batch(
        empty, table, str(tmp_path / "r"), CENTROIDS, threshold=0.95, batch_id=1,
    )
    assert spark.read.parquet(table).count() == 1
    assert spark.read.parquet(table + "_cells").count() == 1
    metrics = {
        (r.batch_id, r.outcome): r.n
        for r in spark.read.parquet(table + "_metrics").collect()
    }
    assert metrics[(1, "ingested")] == 0


def test_semantic_torn_batch_replay_no_duplicates(spark, tmp_path, monkeypatch):
    """Kill-between-appends e2e for the manifest-fenced commit
    (streaming/fence.py): the batch dies after the table append but
    before the cell-sidecar append (the r7 torn-batch window). The
    torn rows must be invisible (no marker), the replay must REPLACE
    them — zero duplicate vec_ids in the committed table — and a
    replay of the committed batch must no-op."""
    import pytest

    from unified_log_aggregation_and_analytics_spark.streaming import fence

    table = str(tmp_path / "t")
    rej = str(tmp_path / "r")
    b1 = [(1, [0.99, 0.01, 0.0, 0.0]), (2, [0.02, 0.97, 0.0, 0.0])]
    SS.semantic_ingest_batch(
        _rows(spark, b1), table, rej, CENTROIDS, threshold=0.95, batch_id=0
    )

    real_append = fence.fenced_append

    def killed_at_cells(df, path, batch_id, partition_cols=()):
        if path.endswith("_cells"):
            raise RuntimeError("simulated kill between table and sidecar appends")
        return real_append(df, path, batch_id, partition_cols)

    b2 = [
        (10, [0.985, 0.015, 0.0, 0.0]),  # ~ id 1 -> cross-batch drop
        (11, [0.0, 0.1, 0.99, 0.0]),     # novel
    ]
    monkeypatch.setattr(fence, "fenced_append", killed_at_cells)
    with pytest.raises(RuntimeError, match="simulated kill"):
        SS.semantic_ingest_batch(
            _rows(spark, b2), table, rej, CENTROIDS, threshold=0.95, batch_id=1
        )
    monkeypatch.undo()

    root = fence.fence_root(table)
    assert not fence.is_committed(spark, root, 1)
    # torn table rows invisible through the fence
    assert {
        r.vec_id for r in fence.fenced_read(spark, table, root).collect()
    } == {1, 2}

    # replay recomputes and replaces; routing identical
    SS.semantic_ingest_batch(
        _rows(spark, b2), table, rej, CENTROIDS, threshold=0.95, batch_id=1
    )
    visible = fence.fenced_read(spark, table, root)
    assert {r.vec_id for r in visible.collect()} == {1, 2, 11}
    assert visible.groupBy("vec_id").count().filter("count > 1").count() == 0
    # committed replay: exact no-op
    SS.semantic_ingest_batch(
        _rows(spark, b2), table, rej, CENTROIDS, threshold=0.95, batch_id=1
    )
    assert fence.fenced_read(spark, table, root).count() == 3
