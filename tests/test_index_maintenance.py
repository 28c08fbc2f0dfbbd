"""Incremental index maintenance (VERDICT r3 item 2): append-mode
ingest for the persisted LSH/IVF/token indexes must be probe-
equivalent to a fresh full rebuild, manifests must record lineage,
and compaction must fold small files without changing results.

The scale claim under test: a delta ingest touches O(|delta|) rows
(frozen planes / frozen centroids / delta-only postings), never the
base index, so daily refresh at 100 TB is an append + periodic
compaction instead of a full rebuild.
"""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from unified_log_aggregation_and_analytics_spark.operators import ann_index as A
from unified_log_aggregation_and_analytics_spark.operators import relational as R
from unified_log_aggregation_and_analytics_spark.sources.batch import load_table

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, "embeddings", SF_DIR).filter(F.col("vec_id") != 0)


@pytest.fixture(scope="module")
def qvec(spark):
    row = (
        load_table(spark, "embeddings", SF_DIR)
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row[0]]


def test_lsh_append_equals_full_build(spark, emb, qvec, tmp_path_factory):
    full = str(tmp_path_factory.mktemp("lsh_full"))
    inc = str(tmp_path_factory.mktemp("lsh_inc"))
    base = emb.filter(F.col("vec_id") % 2 == 1)
    delta = emb.filter(F.col("vec_id") % 2 == 0)

    A.build_lsh_index(emb, full, n_bits=8, seed=42)
    A.build_lsh_index(base, inc, n_bits=8, seed=42)
    A.append_lsh_index(delta, inc, n_bits=8, seed=42)

    got = _rows(A.lsh_probe(spark, inc, qvec, k=10, multiprobe_bits=1))
    want = _rows(A.lsh_probe(spark, full, qvec, k=10, multiprobe_bits=1))
    assert got == want and len(got) == 10

    ops = [v["op"] for v in A.read_manifest(inc)]
    assert ops == ["build", "append"]
    n_base, n_delta = base.count(), delta.count()
    assert [v["rows"] for v in A.read_manifest(inc)] == [n_base, n_delta]


def test_lsh_append_is_delta_sized(spark, emb, tmp_path_factory):
    """The append must not rewrite base rows: base files survive
    byte-identical (same paths, same sizes) after the append."""
    inc = str(tmp_path_factory.mktemp("lsh_delta"))
    base = emb.filter(F.col("vec_id") % 2 == 1)
    delta = emb.filter(F.col("vec_id") % 2 == 0)
    A.build_lsh_index(base, inc, n_bits=8, seed=42)
    table = Path(inc) / "table"
    before = {
        str(p.relative_to(table)): p.stat().st_size
        for p in table.rglob("*.parquet")
    }
    A.append_lsh_index(delta, inc, n_bits=8, seed=42)
    after = {
        str(p.relative_to(table)): p.stat().st_size
        for p in table.rglob("*.parquet")
    }
    assert set(before) <= set(after)
    assert all(after[f] == sz for f, sz in before.items())
    assert len(after) > len(before)


def test_lsh_append_empty_delta_is_noop(spark, emb, qvec, tmp_path_factory):
    """ADVICE r4: an idle-trigger EMPTY delta must not crash (the old
    dim derivation ran first() on the delta). dim now comes from the
    build manifest; probe results are unchanged."""
    inc = str(tmp_path_factory.mktemp("lsh_empty"))
    A.build_lsh_index(emb, inc, n_bits=8, seed=42)
    want = _rows(A.lsh_probe(spark, inc, qvec, k=10, multiprobe_bits=1))
    A.append_lsh_index(emb.filter(F.lit(False)), inc, n_bits=8, seed=42)
    got = _rows(A.lsh_probe(spark, inc, qvec, k=10, multiprobe_bits=1))
    assert got == want
    manifest = A.read_manifest(inc)
    assert [v["op"] for v in manifest] == ["build", "append"]
    assert manifest[-1]["rows"] == 0
    assert manifest[0]["dim"] == 64


def test_compact_preserves_probe_and_folds_files(spark, emb, qvec, tmp_path_factory):
    inc = str(tmp_path_factory.mktemp("lsh_compact"))
    base = emb.filter(F.col("vec_id") % 2 == 1)
    delta = emb.filter(F.col("vec_id") % 2 == 0)
    A.build_lsh_index(base, inc, n_bits=8, seed=42)
    A.append_lsh_index(delta, inc, n_bits=8, seed=42)
    want = _rows(A.lsh_probe(spark, inc, qvec, k=10, multiprobe_bits=1))

    A.compact_index(spark, inc, part_col="bucket", files_per_partition=1)

    got = _rows(A.lsh_probe(spark, inc, qvec, k=10, multiprobe_bits=1))
    assert got == want
    table = Path(inc) / "table"
    for bucket_dir in table.glob("bucket=*"):
        assert len(list(bucket_dir.glob("*.parquet"))) == 1
    assert [v["op"] for v in A.read_manifest(inc)] == ["build", "append", "compact"]
    total = spark.read.parquet(str(table)).count()
    assert A.read_manifest(inc)[-1]["rows"] == total == emb.count()


def test_ivf_append_equals_full_build(spark, emb, qvec, tmp_path_factory):
    """Base holds the 16 lowest-id vectors (the deterministic centroid
    seeds), so the frozen persisted centroids equal a fresh full
    build's — the precondition append_ivf_index documents."""
    full = str(tmp_path_factory.mktemp("ivf_full"))
    inc = str(tmp_path_factory.mktemp("ivf_inc"))
    base = emb.filter(F.col("vec_id") <= 40)
    delta = emb.filter(F.col("vec_id") > 40)

    A.build_ivf_index(emb, full, n_centroids=16)
    A.build_ivf_index(base, inc, n_centroids=16)
    A.append_ivf_index(delta, inc)

    got = _rows(A.ivf_probe(spark, inc, qvec, k=10, n_probe=4))
    want = _rows(A.ivf_probe(spark, full, qvec, k=10, n_probe=4))
    assert got == want and len(got) == 10
    assert [v["op"] for v in A.read_manifest(inc)] == ["build", "append"]


def test_token_index_append_equals_full_build(spark):
    docs = load_table(spark, "documents", SF_DIR)
    base = docs.filter(F.col("doc_id") % 2 == 1)
    delta = docs.filter(F.col("doc_id") % 2 == 0)
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for name in ("tok_mnt_full", "tok_mnt_inc"):
        for suffix in ("", "_doclen", "_stats"):
            spark.sql(f"DROP TABLE IF EXISTS {name}{suffix}")
            leftover = Path(wh) / (name + suffix).lower()
            if leftover.exists():
                shutil.rmtree(leftover)

    R.build_token_index_table(docs, "tok_mnt_full")
    R.build_token_index_table(base, "tok_mnt_inc")
    R.append_token_index_table(delta, "tok_mnt_inc")

    terms = ["merge", "spark", "vector"]
    got = _rows(R.bm25_search_indexed(spark, "tok_mnt_inc", terms, k=10))
    want = _rows(R.bm25_search_indexed(spark, "tok_mnt_full", terms, k=10))
    assert got == want and len(got) == 10

    # scalars refreshed from the doclen table, not stale base values
    s_full = spark.table("tok_mnt_full_stats").first()
    s_inc = spark.table("tok_mnt_inc_stats").first()
    assert s_inc["n_docs"] == s_full["n_docs"]
    assert abs(s_inc["avg_dl"] - s_full["avg_dl"]) < 1e-9


def test_ivf_filtered_probe_pushdown_and_correctness(spark, emb, qvec, tmp_path_factory):
    """Filtered vector search: meta_cols carries label into the index
    rows; a candidate_filter probe (a) returns only matching-label
    results, (b) pushes the predicate into the parquet scan
    (PushedFilters), (c) equals brute-force cosine over the
    label-filtered slice of exactly the probed cells, and (d) raising
    n_probe to all cells equals the fully-exact filtered top-k."""
    import io
    from contextlib import redirect_stdout

    from unified_log_aggregation_and_analytics_spark.operators.similarity import (
        knn_brute_force,
    )

    path = str(tmp_path_factory.mktemp("ivf_meta"))
    A.build_ivf_index(emb, path, n_centroids=8, meta_cols=("label",))

    flt = F.col("label") == 3
    got = A.ivf_probe(spark, path, qvec, k=5, n_probe=3, candidate_filter=flt)
    rows = got.collect()
    assert rows, "filtered probe returned nothing"
    labels = {
        r.label
        for r in got.join(emb.select("vec_id", "label"), "vec_id").collect()
    }
    assert labels == {3}, f"non-matching labels leaked: {labels}"

    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "label" in plan.split("PushedFilters")[1][:200]

    # exact within probed cells: replicate the probe's cell choice
    idx = spark.read.parquet(f"{path}/table")
    import numpy as np

    cents = A.load_centroids(spark, path)
    norm = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    q = np.asarray(qvec) / np.linalg.norm(qvec)
    cells = [int(c) for c in (norm @ q).argsort()[::-1][:3]]
    want = knn_brute_force(
        idx.filter(F.col("cell").isin(cells)).filter(flt), qvec, k=5
    )
    assert _rows(got) == _rows(want)

    # probing every cell = exact filtered kNN over the whole corpus
    all_probe = A.ivf_probe(
        spark, path, qvec, k=5, n_probe=8, candidate_filter=flt
    )
    exact = knn_brute_force(emb.filter(flt), qvec, k=5)
    assert _rows(all_probe) == _rows(exact)


def test_lsh_filtered_probe(spark, emb, qvec, tmp_path_factory):
    """LSH filtered search mirrors the IVF contract: meta_cols rows,
    candidate_filter in the pruned scan, matching-label results only,
    and append with meta preserved keeps the filter working."""
    path = str(tmp_path_factory.mktemp("lsh_meta"))
    base = emb.filter(F.col("vec_id") % 2 == 1)
    delta = emb.filter(F.col("vec_id") % 2 == 0)
    A.build_lsh_index(base, path, n_bits=6, seed=42, meta_cols=("label",))
    A.append_lsh_index(delta, path, n_bits=6, seed=42, meta_cols=("label",))

    flt = F.col("label") == 3
    got = A.lsh_probe(
        spark, path, qvec, k=5, n_bits=6, multiprobe_bits=2, candidate_filter=flt
    )
    rows = got.collect()
    assert rows, "filtered LSH probe returned nothing"
    labels = {
        r.label
        for r in got.join(emb.select("vec_id", "label"), "vec_id").collect()
    }
    assert labels == {3}, f"non-matching labels leaked: {labels}"


def test_compact_index_preserves_merge_journal(spark, tmp_path):
    """compact_index must carry the ``_merged_through`` journal across
    its directory swap: without it, compacting inside
    merge_index_delta's crash-after-swap/before-cleanup window resets
    the journal to -1 and the already-merged delta partitions become
    visible AGAIN in _index_rows (double-counted probes) and get
    re-merged permanently by the next merge."""
    import shutil

    import numpy as np
    from pyspark.sql import types as T

    from unified_log_aggregation_and_analytics_spark.operators import (
        ann_index as A,
    )
    from unified_log_aggregation_and_analytics_spark.streaming.vectors import (
        vector_ingest_batch,
    )

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    rng = np.random.default_rng(7)
    vecs = [[float(x) for x in row] for row in rng.normal(size=(20, 8))]
    index = str(tmp_path / "ivf")
    A.build_ivf_index(
        spark.createDataFrame([(i, vecs[i]) for i in range(10)], schema),
        index,
        n_centroids=4,
    )
    vector_ingest_batch(
        spark.createDataFrame([(i, vecs[i]) for i in range(10, 20)], schema),
        index,
        str(tmp_path / "rej"),
        batch_id=0,
    )
    # snapshot the delta dir, merge, then restore the snapshot — the
    # exact state a kill between merge's swap and its lazy cleanup
    # leaves behind (journal says merged, delta partition still on
    # disk)
    delta = A._delta_path(index)
    shutil.copytree(delta, str(tmp_path / "delta_snapshot"))
    assert A.merge_index_delta(spark, index) == 1
    assert A._merged_through(index) == 0
    shutil.rmtree(delta, ignore_errors=True)
    shutil.copytree(str(tmp_path / "delta_snapshot"), delta)
    assert A._index_rows(spark, index).count() == 20  # journal shields it

    A.compact_index(spark, index, part_col="cell")
    assert A._merged_through(index) == 0, "journal lost in compaction swap"
    assert A._index_rows(spark, index).count() == 20  # still no double count


def test_compact_index_delta_object_store_path(spark, tmp_path):
    """Marker-native delta maintenance (compact_index_delta): folds
    the committed delta prefix into one negative partition with NO
    rename and NO base rewrite — visible rows and probe results
    unchanged, delta directory count bounded, later batches keep
    flowing, and the merge/compact protocols exclude each other
    loudly in both directions."""
    from pathlib import Path

    import numpy as np
    from pyspark.sql import types as T

    from unified_log_aggregation_and_analytics_spark.operators import (
        ann_index as A,
    )
    from unified_log_aggregation_and_analytics_spark.streaming.vectors import (
        maybe_merge_delta,
        vector_ingest_batch,
    )

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    rng = np.random.default_rng(13)
    vecs = [[float(x) for x in row] for row in rng.normal(size=(50, 8))]
    index = str(tmp_path / "ivf")
    rej = str(tmp_path / "rej")
    A.build_ivf_index(
        spark.createDataFrame([(i, vecs[i]) for i in range(10)], schema),
        index,
        n_centroids=4,
    )
    for b in range(3):
        lo, hi = 10 + b * 10, 20 + b * 10
        vector_ingest_batch(
            spark.createDataFrame([(i, vecs[i]) for i in range(lo, hi)], schema),
            index,
            rej,
            batch_id=b,
        )
    q = vecs[2]
    before = [r["vec_id"] for r in A.ivf_probe(spark, index, q, k=5).collect()]

    # cadence below threshold: no-op; at threshold: folds all 3
    assert maybe_merge_delta(spark, index, merge_every=4, mode="compact") == 0
    assert maybe_merge_delta(spark, index, merge_every=3, mode="compact") == 3
    dirs = sorted(
        p.name for p in Path(A._delta_path(index)).glob("_commit_batch=*")
    )
    assert dirs == ["_commit_batch=-1"], dirs
    assert A._index_rows(spark, index).count() == 40
    after = [r["vec_id"] for r in A.ivf_probe(spark, index, q, k=5).collect()]
    assert before == after

    # protocols exclude each other, loudly
    with pytest.raises(ValueError, match="compact_index_delta"):
        A.merge_index_delta(spark, index)

    # stream keeps flowing; a second compaction folds the new batch
    vector_ingest_batch(
        spark.createDataFrame([(i, vecs[i]) for i in range(40, 50)], schema),
        index,
        rej,
        batch_id=3,
    )
    assert A._index_rows(spark, index).count() == 50
    A.compact_index_delta(spark, index)
    dirs = sorted(
        p.name for p in Path(A._delta_path(index)).glob("_commit_batch=*")
    )
    assert dirs == ["_commit_batch=-2"], dirs
    assert A._index_rows(spark, index).count() == 50

    # reverse guard: a merged index refuses delta compaction
    index2 = str(tmp_path / "ivf2")
    A.build_ivf_index(
        spark.createDataFrame([(i, vecs[i]) for i in range(10)], schema),
        index2,
        n_centroids=4,
    )
    vector_ingest_batch(
        spark.createDataFrame([(i, vecs[i]) for i in range(10, 20)], schema),
        index2,
        str(tmp_path / "rej2"),
        batch_id=0,
    )
    assert A.merge_index_delta(spark, index2) == 1
    with pytest.raises(ValueError, match="merge_index_delta"):
        A.compact_index_delta(spark, index2)


def test_index_probe_as_of_snapshot(spark, emb, qvec, tmp_path):
    """Snapshot probes over the streaming-maintained IVF index (r11):
    a probe pinned to as_of_batch N ignores delta batches committed
    after N (the reproducible-training-run contract applied to vector
    search); an unpinned probe sees them; and a snapshot older than
    the merge horizon raises loudly after merge_index_delta folds the
    delta into the base."""
    from unified_log_aggregation_and_analytics_spark.streaming import fence

    base = emb.filter(F.col("vec_id") <= 300)
    d1 = emb.filter((F.col("vec_id") > 300) & (F.col("vec_id") <= 400))
    d2 = emb.filter(F.col("vec_id") > 400)
    path = str(tmp_path / "ivf_asof")
    A.build_ivf_index(base, path, n_centroids=8)
    root = fence.fence_root(path)

    A.append_ivf_index_fenced(d1, path, batch_id=0)
    fence.mark_committed(spark, root, 0)
    pinned = {r.vec_id for r in A.ivf_probe(
        spark, path, qvec, k=50, n_probe=8, as_of_batch=0
    ).collect()}

    A.append_ivf_index_fenced(d2, path, batch_id=1)
    fence.mark_committed(spark, root, 1)
    d2_ids = {r.vec_id for r in d2.select("vec_id").collect()}

    again = {r.vec_id for r in A.ivf_probe(
        spark, path, qvec, k=50, n_probe=8, as_of_batch=0
    ).collect()}
    assert again == pinned
    assert not (again & d2_ids), "pinned probe leaked post-snapshot rows"
    unpinned = {r.vec_id for r in A.ivf_probe(
        spark, path, qvec, k=50, n_probe=8
    ).collect()}
    assert unpinned & d2_ids, "unpinned probe should see the new batch"

    A.merge_index_delta(spark, path)
    with pytest.raises(ValueError, match="merge horizon"):
        A.ivf_probe(spark, path, qvec, k=5, n_probe=8, as_of_batch=0).collect()
    after = {r.vec_id for r in A.ivf_probe(
        spark, path, qvec, k=50, n_probe=8, as_of_batch=1
    ).collect()}
    assert after == unpinned


def test_snapshot_rejects_post_pin_unfenced_append(spark, emb, qvec, tmp_path):
    """r12 (ADVICE): unfenced appends write straight into the base
    table with no per-batch lineage, so a pinned probe would silently
    see rows appended AFTER its snapshot point. Each unfenced append
    now records the fence position it happened at; a pin older than
    that position raises, a pin at-or-newer still works, and an
    append that predates any fenced delta (fence_pos=-1) never blocks
    a pin."""
    from unified_log_aggregation_and_analytics_spark.streaming import fence

    base = emb.filter(F.col("vec_id") <= 300)
    pre = emb.filter((F.col("vec_id") > 300) & (F.col("vec_id") <= 350))
    d1 = emb.filter((F.col("vec_id") > 350) & (F.col("vec_id") <= 400))
    d2 = emb.filter((F.col("vec_id") > 400) & (F.col("vec_id") <= 450))
    post = emb.filter(F.col("vec_id") > 450)
    path = str(tmp_path / "ivf_unfenced_pin")
    A.build_ivf_index(base, path, n_centroids=8)
    root = fence.fence_root(path)

    # Unfenced append BEFORE any fenced delta: fence_pos=-1, any pin ok.
    A.append_ivf_index(pre, path)
    manifest = A.read_manifest(path)
    assert manifest[-1]["op"] == "append" and manifest[-1]["fence_pos"] == -1

    A.append_ivf_index_fenced(d1, path, batch_id=0)
    fence.mark_committed(spark, root, 0)
    A.append_ivf_index_fenced(d2, path, batch_id=1)
    fence.mark_committed(spark, root, 1)

    # Pin at batch 1 is sound: the only unfenced append predates it.
    pinned = A.ivf_probe(spark, path, qvec, k=50, n_probe=8, as_of_batch=1)
    assert pinned.count() > 0

    # Unfenced append AFTER batch 1 committed: fence_pos=1. Pins older
    # than that position are now unsound and must raise; a pin at the
    # recorded position (or newer) remains legal.
    A.append_ivf_index(post, path)
    assert A.read_manifest(path)[-1]["fence_pos"] == 1
    with pytest.raises(ValueError, match="UNFENCED append"):
        A.ivf_probe(spark, path, qvec, k=5, n_probe=8, as_of_batch=0).collect()
    post_ids = {r.vec_id for r in post.select("vec_id").collect()}
    at_pos = {r.vec_id for r in A.ivf_probe(
        spark, path, qvec, k=500, n_probe=8, as_of_batch=1
    ).collect()}
    assert post_ids <= at_pos


def test_prefix_index_append_equals_rebuild(spark, emb, qvec, tmp_path):
    """Dimension-split prefix index (r12): base build over half the
    corpus + append of the other half must probe identically to a
    fresh full build (the split is a pure projection — nothing frozen
    to drift), and the manifest records build dim/prefix_dim plus the
    append's fence position."""
    base = emb.filter(F.col("vec_id") <= 300)
    delta = emb.filter(F.col("vec_id") > 300)
    p1 = str(tmp_path / "pfx_incr")
    p2 = str(tmp_path / "pfx_full")
    A.build_prefix_index(base, p1, prefix_dim=16)
    A.append_prefix_index(delta, p1)
    A.build_prefix_index(emb, p2, prefix_dim=16)
    got = A.prefix_refine_probe(spark, p1, qvec, k=10, shortlist=50).collect()
    want = A.prefix_refine_probe(spark, p2, qvec, k=10, shortlist=50).collect()
    assert got == want
    m = A.read_manifest(p1)
    assert [e["op"] for e in m] == ["build", "append"]
    assert m[0]["dim"] == 64 and m[0]["prefix_dim"] == 16
    assert m[1]["fence_pos"] == -1
    assert A.manifest_prefix_dim(p1) == 16


def test_rotated_prefix_index_append_equals_rebuild(spark, emb, qvec, tmp_path):
    """Rotated-prefix index (r12): probes over base build + frozen-
    rotation append equal a fresh full build USING THE SAME rotation
    (the frozen-artifact contract — a fresh build over the grown
    corpus would derive a DIFFERENT rotation, which is the documented
    rebuild decision, not a bug); index probe equals the scan-time
    rotated path bit-for-bit; coarse stage reads only (id, rot)."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    import numpy as np

    from unified_log_aggregation_and_analytics_spark.operators import similarity as S

    base = emb.filter(F.col("vec_id") <= 300)
    delta = emb.filter(F.col("vec_id") > 300)
    R = S.power_pca_rotation(base, n_components=32, iters=16)
    p1 = str(tmp_path / "rot_incr")
    p2 = str(tmp_path / "rot_full")
    A.build_rotated_prefix_index(base, p1, R)
    A.append_rotated_prefix_index(delta, p1)
    A.build_rotated_prefix_index(emb, p2, R)
    got = A.rotated_prefix_probe(spark, p1, qvec, k=10, shortlist=50).collect()
    want = A.rotated_prefix_probe(spark, p2, qvec, k=10, shortlist=50).collect()
    assert got == want
    scan = S.knn_prefix_refine_rotated(emb, qvec, R, k=10, shortlist=50).collect()
    assert got == scan, "index probe != rotated scan path"
    assert np.array_equal(A.load_rotation(spark, p1), R)

    idx = A._index_rows(spark, p1)
    q_rot = F.array(*[F.lit(float(x)) for x in
                      np.round(np.asarray(qvec) @ R.T, 6)])
    from unified_log_aggregation_and_analytics_spark.functions.vectors import (
        cosine_similarity,
    )
    coarse = idx.select(
        "vec_id",
        F.round(cosine_similarity(F.col("rot"), q_rot, dim=32), 6).alias("s"),
    ).orderBy(F.col("s").desc(), "vec_id").limit(50)
    buf = io.StringIO()
    with redirect_stdout(buf):
        coarse.explain("formatted")
    rs = [l for l in buf.getvalue().splitlines() if "ReadSchema" in l][0]
    assert "rot" in rs and "embedding" not in rs, rs


def test_prefix_refine_probe_rejects_wrong_query_dim(spark, emb, qvec, tmp_path):
    """ADVICE r12: prefix_refine_probe validates the query length
    against the manifest-recorded build dim (mirroring
    rotated_prefix_probe) instead of emitting null/garbage cosines."""
    path = str(tmp_path / "pfx_dim")
    A.build_prefix_index(emb, path, prefix_dim=16)
    with pytest.raises(ValueError, match="query dim"):
        A.prefix_refine_probe(spark, path, qvec[:32], k=5)


def _rm_warehouse_dir(spark, table: str) -> None:
    """Remove a leftover managed-table directory from a previous
    pytest session (in-memory catalog forgets the table; its files
    survive and block saveAsTable)."""
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(Path(wh) / table.lower(), ignore_errors=True)


def test_token_index_fenced_asof_lifecycle(spark, tmp_path):
    """Fenced token-index maintenance (r13): (1) the pinned probe
    equals a fresh full build over exactly the pinned doc set, (2) an
    unpinned probe sees every committed batch, (3) a TORN delta batch
    (data written, no marker) is invisible to both, (4) a replay of a
    committed batch is a no-op (is_committed short-circuit)."""
    from unified_log_aggregation_and_analytics_spark.streaming import fence

    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    terms = ["merge", "spark", "vector"]
    base = docs.filter(F.col("doc_id") % 2 == 1)
    d0 = docs.filter(F.col("doc_id") % 4 == 0)
    d1 = docs.filter(F.col("doc_id") % 4 == 2)

    name = "tok_asof_test"
    for s in ("", "_doclen", "_stats"):
        for t in (name, f"{name}_pin", f"{name}_all"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{s}")
            _rm_warehouse_dir(spark, f"{t}{s}")
    delta = str(tmp_path / "tok_delta")
    R.build_token_index_table(base, name)
    R.append_token_index_fenced(d0, name, delta, 0)
    R.append_token_index_fenced(d1, name, delta, 1)

    # (1) pin at batch 0 == fresh build over base + d0
    R.build_token_index_table(base.unionByName(d0), f"{name}_pin")
    want_pin = R.bm25_search_indexed(spark, f"{name}_pin", terms, k=10).collect()
    got_pin = R.bm25_search_indexed_asof(
        spark, name, delta, terms, k=10, as_of_batch=0
    ).collect()
    assert got_pin == want_pin

    # (2) unpinned == fresh build over everything
    R.build_token_index_table(base.unionByName(d0).unionByName(d1), f"{name}_all")
    want_all = R.bm25_search_indexed(spark, f"{name}_all", terms, k=10).collect()
    got_all = R.bm25_search_indexed_asof(spark, name, delta, terms, k=10).collect()
    assert got_all == want_all
    assert got_all != got_pin  # the later batch actually moves scores

    # (3) torn batch: data lands, marker does not -> invisible
    extra = docs.filter(F.col("doc_id") % 4 == 3).limit(50)
    toks = extra.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    fence.fenced_append(
        toks.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("tf")),
        f"{delta}/postings",
        2,
    )
    torn = R.bm25_search_indexed_asof(spark, name, delta, terms, k=10).collect()
    assert torn == want_all

    # (4) committed replay is a no-op (would double postings otherwise)
    R.append_token_index_fenced(d0, name, delta, 0)
    again = R.bm25_search_indexed_asof(
        spark, name, delta, terms, k=10, as_of_batch=0
    ).collect()
    assert again == want_pin


def test_token_index_merge_journal(spark, tmp_path):
    """merge_token_index_delta (r13): folding committed deltas into a
    versioned base is result-invisible (unpinned probe identical
    before/after, with the folded delta files still on disk — the
    journal excludes them, no double count), a pin AT the horizon
    still answers, a pin BELOW the horizon raises (lineage destroyed),
    and batches committed AFTER the merge union as usual."""
    from unified_log_aggregation_and_analytics_spark.operators.relational import (
        _resolve_token_base,
        merge_token_index_delta,
    )

    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    terms = ["merge", "spark", "vector"]
    base = docs.filter(F.col("doc_id") % 2 == 1)
    d0 = docs.filter(F.col("doc_id") % 4 == 0)
    d1 = docs.filter(F.col("doc_id") % 4 == 2)

    name = "tok_merge_test"
    for s in ("", "_doclen", "_stats"):
        for t in (name, f"{name}__m0", f"{name}__m1"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{s}")
            _rm_warehouse_dir(spark, f"{t}{s}")
    delta = str(tmp_path / "tok_delta_m")
    R.build_token_index_table(base, name)
    R.append_token_index_fenced(d0, name, delta, 0)

    before = R.bm25_search_indexed_asof(spark, name, delta, terms, k=10).collect()
    assert merge_token_index_delta(spark, name, delta) == 1
    phys, mt = _resolve_token_base(spark, name, delta)
    assert phys == f"{name}__m0" and mt == 0
    after = R.bm25_search_indexed_asof(spark, name, delta, terms, k=10).collect()
    assert after == before  # delta files still on disk, excluded by journal
    at_pin = R.bm25_search_indexed_asof(
        spark, name, delta, terms, k=10, as_of_batch=0
    ).collect()
    assert at_pin == before
    import pytest as _pt

    with _pt.raises(ValueError, match="merge horizon"):
        R.bm25_search_indexed_asof(
            spark, name, delta, terms, k=10, as_of_batch=-1
        ).collect()

    # post-merge streaming continues: batch 1 appends, unions over the
    # merged base; a second merge folds it and drops the old version
    R.append_token_index_fenced(d1, name, delta, 1)
    live = R.bm25_search_indexed_asof(spark, name, delta, terms, k=10).collect()
    assert merge_token_index_delta(spark, name, delta) == 1
    assert (
        R.bm25_search_indexed_asof(spark, name, delta, terms, k=10).collect()
        == live
    )
    phys2, mt2 = _resolve_token_base(spark, name, delta)
    assert phys2 == f"{name}__m1" and mt2 == 1
    assert not spark.catalog.tableExists(f"{name}__m0")
    assert merge_token_index_delta(spark, name, delta) == 0  # idempotent
