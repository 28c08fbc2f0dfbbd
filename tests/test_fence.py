"""Unit contract of the manifest fence (streaming/fence.py): fenced
reads return EXACTLY the committed batches' rows under every marker
topology — no markers, a contiguous range (the BETWEEN fast path),
holes (the isin path), and a torn tail — and the append mode
selection replaces torn output without ever touching other batches.
The pipeline-level kill/replay e2es live with their pipelines; this
file pins the primitive they all compose.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from unified_log_aggregation_and_analytics_spark.streaming import fence


def _write(spark, path, bid, vals, partition_cols=()):
    df = spark.createDataFrame([(bid * 100 + v,) for v in vals], "v long")
    if partition_cols:
        df = df.withColumn("b", F.pmod(F.col("v"), F.lit(4)))
    fence.fenced_append(df, path, bid, partition_cols)


def _visible(spark, path, root):
    df = fence.fenced_read(spark, path, root)
    return set() if df is None else {r["v"] for r in df.collect()}


def test_fenced_read_exact_committed_subsets(spark, tmp_path):
    path = str(tmp_path / "t")
    root = str(tmp_path / "t_commits")

    # nothing on disk: None, not an empty frame or an error
    assert fence.fenced_read(spark, path, root) is None

    for bid in range(5):
        _write(spark, path, bid, [1, 2, 3])

    # data present, no markers: everything invisible
    assert _visible(spark, path, root) == set()
    assert fence.committed_batches(spark, root) == []

    # holes (0, 2, 4) -> the isin branch must return exactly those
    for bid in (0, 2, 4):
        fence.mark_committed(spark, root, bid)
    want = {b * 100 + v for b in (0, 2, 4) for v in (1, 2, 3)}
    assert _visible(spark, path, root) == want

    # closing the holes -> contiguous range, the BETWEEN fast path
    for bid in (1, 3):
        fence.mark_committed(spark, root, bid)
    want = {b * 100 + v for b in range(5) for v in (1, 2, 3)}
    assert _visible(spark, path, root) == want

    # a torn tail batch (data, no marker) stays invisible
    _write(spark, path, 5, [7])
    assert _visible(spark, path, root) == want
    assert not fence.is_committed(spark, root, 5)


def test_fenced_append_replay_replaces_only_its_own_batch(spark, tmp_path):
    """A replay over a torn attempt dynamic-overwrites ONLY its own
    batch partitions; committed neighbors are untouched byte-for-byte,
    including nested domain partitions."""
    path = str(tmp_path / "t")
    root = str(tmp_path / "t_commits")

    _write(spark, path, 0, [1, 2, 3, 4], ("b",))
    fence.mark_committed(spark, root, 0)
    files_b0 = sorted(
        str(p) for p in Path(path).glob("_commit_batch=0/**/*.parquet")
    )

    # torn attempt for batch 1 wrote PART of the batch (a kill
    # mid-write always leaves a subset of the deterministic full
    # partition set — that determinism is the fence's stated
    # contract); the replay writes the full batch and must REPLACE
    # the torn partition, not merge with it
    _write(spark, path, 1, [7], ("b",))          # torn: only b=3
    _write(spark, path, 1, [7, 8], ("b",))       # replay: dir exists -> overwrite
    fence.mark_committed(spark, root, 1)

    got = _visible(spark, path, root)
    assert got == {1, 2, 3, 4, 107, 108}, got
    # exactly one file under the replayed partition: replaced, not merged
    b3 = list(Path(path).glob("_commit_batch=1/b=3/*.parquet"))
    assert len(b3) == 1, b3
    # batch 0's files were not rewritten
    assert files_b0 == sorted(
        str(p) for p in Path(path).glob("_commit_batch=0/**/*.parquet")
    )


def test_compact_fenced_flat_and_partitioned(spark, tmp_path):
    """compact_fenced folds committed rows under the max committed
    batch id (marker already exists — readable with no marker
    surgery), drops torn partitions, and preserves row content in
    both the flat and the domain-partitioned layouts."""
    for layout, part_cols, part_col in (
        ("flat", (), None),
        ("part", ("b",), "b"),
    ):
        path = str(tmp_path / f"t_{layout}")
        root = str(tmp_path / f"t_{layout}_commits")
        for bid in range(3):
            _write(spark, path, bid, [1, 2, 3, 4], part_cols)
            fence.mark_committed(spark, root, bid)
        _write(spark, path, 9, [42], part_cols)  # torn, never marked
        before = _visible(spark, path, root)
        fence.compact_fenced(spark, path, root, part_col)
        assert _visible(spark, path, root) == before
        dirs = [p.name for p in Path(path).glob("_commit_batch=*")]
        assert dirs == ["_commit_batch=2"], dirs
        if layout == "flat":
            assert len(list(Path(path).glob("_commit_batch=2/*.parquet"))) == 1
