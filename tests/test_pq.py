"""Product quantization (operators/pq.py): encode-path parity,
packing, training quality/determinism, and ADC recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from unified_log_aggregation_and_analytics_spark.operators import pq as PQ
from unified_log_aggregation_and_analytics_spark.sources.batch import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, "embeddings", SF).filter(F.col("vec_id") != 0).cache()


@pytest.fixture(scope="module")
def seeded_cb():
    return PQ.seeded_pq_codebooks(64, m=4, codes=8, seed=42)


def test_encode_paths_agree(spark, emb, seeded_cb):
    """The Arrow GEMM encoder and the JVM expression encoder assign
    identical codes — the production path inherits the certification
    path's oracle evidence."""
    jvm = {
        r.vec_id: list(r.codes)
        for r in emb.select(
            "vec_id", PQ.pq_code_expr("embedding", seeded_cb).alias("codes")
        ).collect()
    }
    gemm = {r.vec_id: list(r.pq_codes) for r in PQ.pq_encode(emb, seeded_cb).collect()}
    assert jvm == gemm


def test_binary_packing_roundtrip(spark, emb, seeded_cb):
    """pq_code is the m-byte packed form of pq_codes."""
    for r in PQ.pq_encode(emb, seeded_cb).limit(50).collect():
        assert list(r.pq_code) == list(r.pq_codes)
        assert len(r.pq_code) == 4


def test_encode_matches_numpy_reference(spark, emb, seeded_cb):
    """Codes equal a straight numpy argmin over squared L2 distances
    (no -2xc trick) — pins the GEMM rearrangement."""
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").limit(25).collect()
    got = {r.vec_id: list(r.pq_codes) for r in PQ.pq_encode(emb, seeded_cb).collect()}
    for r in rows:
        v = np.asarray(list(r.embedding), dtype=np.float64)
        for mi in range(4):
            sub = v[mi * 16 : (mi + 1) * 16]
            d = ((sub[None, :] - seeded_cb[mi]) ** 2).sum(axis=1)
            assert got[r.vec_id][mi] == int(d.argmin())


def test_training_reduces_reconstruction_error(spark, emb, seeded_cb):
    """Lloyd iterations must not hurt: trained codebooks reconstruct
    at most the seeded error (they start from the seeded init), and
    retraining is deterministic (rounded means)."""
    trained = PQ.train_pq_codebooks(emb, 64, m=4, codes=8, n_iter=2)
    again = PQ.train_pq_codebooks(emb, 64, m=4, codes=8, n_iter=2)
    assert np.array_equal(trained, again)
    e_seed = PQ.pq_reconstruction_error(emb, seeded_cb).first()
    e_train = PQ.pq_reconstruction_error(emb, trained).first()
    assert e_train.mean_sq_err < e_seed.mean_sq_err
    assert e_train.n_vectors == e_seed.n_vectors == emb.count()


def test_ivfpq_index_build_probe_append(spark, emb, tmp_path):
    """The persisted IVF-PQ index: (a) stores ONLY codes — no float
    vector column survives into the table; (b) probes with a
    partition-pruned scan (PartitionFilters on cell); (c) probe
    results overlap the exact L2 top-k; (d) appending a delta with
    frozen quantizers adds exactly the delta rows and makes the new
    ids findable; (e) the manifest records build then append."""
    import io
    from contextlib import redirect_stdout

    from unified_log_aggregation_and_analytics_spark.operators import ann_index as A

    base = emb.filter(F.col("vec_id") <= 300)
    delta = emb.filter(F.col("vec_id") > 300)
    path = str(tmp_path / "ivfpq")
    A.build_ivfpq_index(base, path, n_centroids=8, m=4, codes=8)

    idx = spark.read.parquet(f"{path}/table")
    assert set(idx.columns) == {"vec_id", "pq_codes", "pq_code", "cell"}
    n_base = base.count()
    assert idx.count() == n_base

    rows = base.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    M = np.stack([np.asarray(list(r.embedding), dtype=np.float64) for r in rows])
    q = M[0]
    qid = int(ids[0])
    d = ((M - q[None, :]) ** 2).sum(axis=1)
    exact = [int(ids[i]) for i in np.argsort(d, kind="stable") if int(ids[i]) != qid][:10]

    probe = A.ivfpq_probe(spark, path, list(q), k=10, n_probe=4)
    buf = io.StringIO()
    with redirect_stdout(buf):
        probe.explain("formatted")
    assert "PartitionFilters" in buf.getvalue()
    got = [r.vec_id for r in probe.collect() if r.vec_id != qid]
    overlap = len(set(exact) & set(got)) / 10
    assert overlap >= 0.2, f"IVF-PQ recall {overlap} below floor"

    A.append_ivfpq_index(delta, path)
    idx2 = spark.read.parquet(f"{path}/table")
    assert idx2.count() == n_base + delta.count()
    dq = delta.select("embedding").first()[0]
    hits = {r.vec_id for r in A.ivfpq_probe(spark, path, list(dq), k=5, n_probe=8).collect()}
    assert hits & {r.vec_id for r in delta.select("vec_id").collect()}, (
        "appended ids not findable"
    )
    ops = [v["op"] for v in A.read_manifest(path)]
    assert ops == ["build", "append"]


def test_adc_recall_vs_exact(spark, emb):
    """ADC top-10 over trained 4x8 codes (12 bits/vector!) must still
    overlap the exact squared-L2 top-10 — the coarse-quantization
    recall floor; and the ADC distances are monotone in rank."""
    trained = PQ.train_pq_codebooks(emb, 64, m=4, codes=8, n_iter=2)
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    M = np.stack([np.asarray(list(r.embedding), dtype=np.float64) for r in rows])
    q = M[0]  # use the first corpus vector as the probe
    qid = int(ids[0])
    d = ((M - q[None, :]) ** 2).sum(axis=1)
    order = np.argsort(d, kind="stable")
    exact = [int(ids[i]) for i in order if int(ids[i]) != qid][:10]

    codes_df = PQ.pq_encode(emb.filter(F.col("vec_id") != qid), trained)
    got = PQ.pq_adc_topk(codes_df, trained, list(q), k=10).collect()
    dists = [r.adc_dist for r in got]
    assert dists == sorted(dists)
    recall = len(set(exact) & {r.vec_id for r in got}) / 10
    assert recall >= 0.2, f"ADC recall {recall} below floor"


def test_sq8_adc_matches_numpy_reference(spark, emb):
    """SQ8 ADC top-10 equals a straight numpy replay of per-vector
    255-level range quantization + asymmetric reconstruction L2 —
    pins code assignment (floor(x+0.5) half-ties), the (min, scale)
    dequant arithmetic, and the rank/tie order."""
    from unified_log_aggregation_and_analytics_spark.operators import similarity as S

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    M = np.stack([np.asarray(list(r.embedding), dtype=np.float64) for r in rows])
    q = M[0]
    qid = int(ids[0])
    keep = ids != qid
    ids, M = ids[keep], M[keep]
    mn = M.min(axis=1, keepdims=True)
    sc = (M.max(axis=1, keepdims=True) - mn) / 255.0
    codes = np.where(sc == 0, 0.0, np.floor((M - mn) / np.where(sc == 0, 1.0, sc) + 0.5))
    recon = mn + codes * sc
    d = np.round(((q[None, :] - recon) ** 2).sum(axis=1), 6)
    order = sorted(range(len(ids)), key=lambda i: (d[i], int(ids[i])))[:10]
    want = [(int(ids[i]), float(d[i])) for i in order]

    got = S.sq8_adc_topk(emb.filter(F.col("vec_id") != qid), list(q), k=10).collect()
    assert [(r.vec_id, r.adc_dist) for r in got] == pytest.approx(want)


def test_sq8_recall_vs_exact(spark, emb):
    """255 levels per vector is nearly lossless — the SQ8 top-10 must
    recover at least 8 of the exact squared-L2 top-10 (in practice
    all 10); distances are monotone in rank."""
    from unified_log_aggregation_and_analytics_spark.operators import similarity as S

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    M = np.stack([np.asarray(list(r.embedding), dtype=np.float64) for r in rows])
    q = M[0]
    qid = int(ids[0])
    d = ((M - q[None, :]) ** 2).sum(axis=1)
    order = np.argsort(d, kind="stable")
    exact = [int(ids[i]) for i in order if int(ids[i]) != qid][:10]

    got = S.sq8_adc_topk(emb.filter(F.col("vec_id") != qid), list(q), k=10).collect()
    dists = [r.adc_dist for r in got]
    assert dists == sorted(dists)
    recall = len(set(exact) & {r.vec_id for r in got}) / 10
    assert recall >= 0.8, f"SQ8 recall {recall} below floor"


def test_sq8_index_build_probe_append(spark, emb, tmp_path):
    """Persisted SQ8 path: build -> probe equals the scan-time
    sq8_adc_topk exactly; the stored schema is codes-only (no float
    vectors); the binary column is the byte-packed codes array; and an
    append (data-independent quantizer — no frozen model) makes the
    new rows visible to the next probe."""
    from unified_log_aggregation_and_analytics_spark.operators import (
        ann_index as A,
        similarity as S,
    )

    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    q = [float(x) for x in rows[0].embedding]
    qid = int(rows[0].vec_id)
    corpus = emb.filter(F.col("vec_id") != qid)
    head = corpus.filter(F.col("vec_id") % 2 == 0)
    tail = corpus.filter(F.col("vec_id") % 2 != 0)

    path = str(tmp_path / "sq8")
    A.build_sq8_index(head, path)
    stored = spark.read.parquet(f"{path}/table")
    # r12: binary-only on disk — no array<int> column doubling bytes
    assert sorted(stored.columns) == ["mn", "sc", "sq8_code", "vec_id"]
    from unified_log_aggregation_and_analytics_spark.operators.similarity import (
        sq8_unpack,
    )

    for r in (
        stored.withColumn("codes", sq8_unpack("sq8_code", 64)).limit(20).collect()
    ):
        assert list(r.sq8_code) == list(r.codes), "in-plan unpack != raw bytes"
        assert all(0 <= c <= 255 for c in r.codes)

    got_head = A.sq8_probe(spark, path, q, k=10).collect()
    want_head = S.sq8_adc_topk(head, q, k=10).collect()
    assert [(r.vec_id, r.adc_dist) for r in got_head] == [
        (r.vec_id, r.adc_dist) for r in want_head
    ]

    A.append_sq8_index(tail, path)
    got_all = A.sq8_probe(spark, path, q, k=10).collect()
    want_all = S.sq8_adc_topk(corpus, q, k=10).collect()
    assert [(r.vec_id, r.adc_dist) for r in got_all] == [
        (r.vec_id, r.adc_dist) for r in want_all
    ]


def test_ivfsq8_index_build_probe(spark, emb, tmp_path):
    """Composed IVF+SQ8: (a) the table stores cell-partitioned codes,
    no float vectors; (b) the probe scan is partition-pruned
    (PartitionFilters on cell); (c) probe results equal the scan-time
    sq8_adc_topk restricted to the probed cells' members — cell
    pruning and SQ8 scoring compose without changing either; (d)
    recall vs exact L2 clears the IVF floor."""
    import io
    from contextlib import redirect_stdout

    from unified_log_aggregation_and_analytics_spark.operators import (
        ann_index as A,
        similarity as S,
    )

    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    q = [float(x) for x in rows[0].embedding]
    qid = int(rows[0].vec_id)
    corpus = emb.filter(F.col("vec_id") != qid)
    path = str(tmp_path / "ivfsq8")
    A.build_ivfsq8_index(corpus, path, n_centroids=8)

    idx = spark.read.parquet(f"{path}/table")
    assert set(idx.columns) == {"vec_id", "mn", "sc", "sq8_code", "cell"}
    assert idx.count() == corpus.count()

    probe = A.ivfsq8_probe(spark, path, q, k=10, n_probe=3)
    buf = io.StringIO()
    with redirect_stdout(buf):
        probe.explain("formatted")
    assert "PartitionFilters" in buf.getvalue()
    got = [(r.vec_id, r.adc_dist) for r in probe.collect()]

    # replay: same centroids ranking driver-side, then scan-time SQ8
    # over exactly the probed cells' members
    centroids = S.deterministic_centroids(corpus, 8)
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    qv = np.asarray(q, dtype=np.float64)
    qn = qv / np.linalg.norm(qv)
    cells = [int(c) for c in (cn @ qn).argsort()[::-1][:3]]
    assigned = S.ivf_assign(corpus.select("vec_id", "embedding"), centroids)
    members = assigned.filter(F.col("cell").isin(cells)).drop("cell")
    want = [(r.vec_id, r.adc_dist) for r in S.sq8_adc_topk(members, q, k=10).collect()]
    assert got == want

    M = np.stack([np.asarray(list(r.embedding), dtype=np.float64) for r in rows[1:]])
    ids = [int(r.vec_id) for r in rows[1:]]
    d = ((M - np.asarray(q)[None, :]) ** 2).sum(axis=1)
    exact = [ids[i] for i in np.argsort(d, kind="stable")][:10]
    recall = len(set(exact) & {g[0] for g in got}) / 10
    assert recall >= 0.2, f"IVF-SQ8 recall {recall} below floor"


def test_ivfsq8_append_and_wrong_append_guard(spark, emb, tmp_path):
    """IVF-SQ8 appends: a delta assigned against the FROZEN centroids
    lands in the cell partitions and is findable by the next probe;
    manifest records build then append; and append_sq8_index on a
    cell-partitioned path fails loudly instead of writing unassigned
    rows that cell-pruned probes would silently never see."""
    from unified_log_aggregation_and_analytics_spark.operators import ann_index as A

    base = emb.filter(F.col("vec_id") <= 300)
    delta = emb.filter(F.col("vec_id") > 300)
    path = str(tmp_path / "ivfsq8a")
    A.build_ivfsq8_index(base, path, n_centroids=8)

    with pytest.raises(ValueError, match="append_ivfsq8_index"):
        A.append_sq8_index(delta, path)

    A.append_ivfsq8_index(delta, path)
    idx = spark.read.parquet(f"{path}/table")
    assert idx.count() == base.count() + delta.count()
    assert idx.filter(F.col("cell").isNull()).count() == 0
    dq = [float(x) for x in delta.select("embedding").first()[0]]
    hits = {r.vec_id for r in A.ivfsq8_probe(spark, path, dq, k=5, n_probe=8).collect()}
    assert hits & {r.vec_id for r in delta.select("vec_id").collect()}
    assert [v["op"] for v in A.read_manifest(path)] == ["build", "append"]


def test_sq8_probe_batch_matches_single_probes(spark, emb, tmp_path):
    """Batch SQ8 retrieval equals Q independent single-query scans
    over the same codes (same fold, same tie order), and exclude_ids
    drops the query vectors from every candidate set."""
    from unified_log_aggregation_and_analytics_spark.operators import (
        ann_index as A,
        similarity as S,
    )

    rows = emb.select("vec_id", "embedding").orderBy("vec_id").limit(3).collect()
    queries = [(int(r.vec_id), [float(x) for x in r.embedding]) for r in rows]
    qids = tuple(q[0] for q in queries)
    path = str(tmp_path / "sq8b")
    A.build_sq8_index(emb, path)

    got = A.sq8_probe_batch(spark, path, queries, k=5, exclude_ids=qids).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_id, []).append((r.vec_id, r.adc_dist))
    cand = emb.filter(~F.col("vec_id").isin(list(qids)))
    for qid, vec in queries:
        want = [(r.vec_id, r.adc_dist)
                for r in S.sq8_adc_topk(cand, vec, k=5).collect()]
        assert by_q[qid] == want
        assert not ({v for v, _ in by_q[qid]} & set(qids))


def test_sq8_probe_batch_empty_queries_raises_clearly(spark, emb, tmp_path):
    """ADVICE r12: an empty queries list on a pre-manifest index must
    raise a clear ValueError, not a TypeError from dim=None
    arithmetic inside sq8_unpack; on a manifest index it returns an
    empty frame."""
    import os
    import shutil

    from unified_log_aggregation_and_analytics_spark.operators import ann_index as A

    path = str(tmp_path / "sq8e")
    A.build_sq8_index(emb, path)
    assert A.sq8_probe_batch(spark, path, [], k=5).count() == 0
    # Simulate a pre-manifest index (older builds recorded no manifest)
    os.unlink(os.path.join(path, "_manifest.jsonl"))
    assert A.manifest_dim(path) is None
    with pytest.raises(ValueError, match="pre-manifest"):
        A.sq8_probe_batch(spark, path, [], k=5)


def test_opq_beats_pq_on_anisotropic_corpus(spark):
    """OPQ mechanism pin (r13, verdict item 4): on a corpus whose
    variance concentrates in ONE PQ subspace (dims 0-3 carry all the
    signal at 4 distinct scales, the rest is near-zero noise),
    trained plain PQ must cover the whole 4-d signal with the 8 codes
    of subspace 0 (its other three code tables quantize noise), while
    the OPQ rotation + round-robin eigenvalue allocation deals the 4
    signal directions one per subspace — 8 quantization levels PER
    signal dimension, 8^4 effective cells vs 8. Trained-OPQ recall@10
    must strictly beat trained-PQ recall@10. (On the driver tables'
    near-flat spectrum the two tie by theory — knn_opq_adc_seeded's
    docstring; THIS corpus is where the rotation's contribution is
    measurable.)"""
    from unified_log_aggregation_and_analytics_spark.operators import (
        similarity as S,
    )

    rng = np.random.default_rng(7)
    n, dim, m = 400, 64, 4
    X = np.zeros((n, dim))
    X[:, :4] = rng.standard_normal((n, 4)) * np.asarray([1.0, 1.2, 1.4, 1.6])
    X[:, 4:] = rng.standard_normal((n, 60)) * 0.01
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).cache()
    qv = [float(x) for x in X[0]]
    corpus = df.filter(F.col("vec_id") != 0)
    exact = {r.vec_id for r in PQ.l2_topk(corpus, qv, k=10).collect()}

    cb_pq = PQ.train_pq_codebooks(corpus, dim, m=m, codes=8, n_iter=2)
    pq10 = {
        r.vec_id
        for r in PQ.pq_adc_topk(
            PQ.pq_encode(corpus, cb_pq), cb_pq, qv, k=10
        ).collect()
    }

    R = S.power_pca_rotation(corpus, n_components=dim, iters=16)
    r_opq = R[PQ.opq_interleave_perm(dim, m)]
    proj = S.rotate_project(corpus, r_opq).select(
        "vec_id", F.col("rot").alias("embedding")
    )
    cb_opq = PQ.train_pq_codebooks(proj, dim, m=m, codes=8, n_iter=2)
    rq = [float(x) for x in np.round(np.asarray(qv) @ r_opq.T, 6)]
    opq10 = {
        r.vec_id
        for r in PQ.pq_adc_topk(
            PQ.pq_encode(proj, cb_opq), cb_opq, rq, k=10
        ).collect()
    }

    pq_recall = len(pq10 & exact) / 10.0
    opq_recall = len(opq10 & exact) / 10.0
    assert opq_recall > pq_recall, (pq_recall, opq_recall)


def test_opq_interleave_perm_shape():
    """The allocation permutation is a bijection that deals
    variance-descending components round-robin: subspace mi holds
    components mi, mi+m, mi+2m, ... (hand-checked for dim 8 / m 2)."""
    assert PQ.opq_interleave_perm(8, 2) == [0, 2, 4, 6, 1, 3, 5, 7]
    p = PQ.opq_interleave_perm(64, 4)
    assert sorted(p) == list(range(64))
    assert p[:3] == [0, 4, 8] and p[16:18] == [1, 5]
    with pytest.raises(ValueError, match="not divisible"):
        PQ.opq_interleave_perm(10, 4)


def test_opq_index_scan_parity_and_append(spark, emb, tmp_path):
    """Persisted OPQ index (r13): (1) the probe equals the scan-time
    seeded OPQ pipeline exactly (index ≡ scan — shared projection and
    encode code); (2) base build + append probes identically to a
    fresh full build (frozen rotation + codebooks); (3) wrong query
    dim and non-full-rank rotations raise."""
    from unified_log_aggregation_and_analytics_spark.operators import (
        ann_index as A,
        similarity as S,
    )

    corpus = emb.filter(F.col("vec_id") > 1)
    qrow = emb.select("embedding").first()
    qv = [float(x) for x in qrow[0]]
    R = S.power_pca_rotation(corpus, n_components=64, iters=16)
    r_opq = R[PQ.opq_interleave_perm(64, 4)]

    # scan-time reference
    cb = PQ.seeded_pq_codebooks(64, m=4, codes=8, seed=42)
    proj = S.rotate_project(corpus, r_opq)
    codes_df = proj.select("vec_id", PQ.pq_code_expr("rot", cb).alias("pq_codes"))
    rq = [float(x) for x in np.round(np.asarray(qv) @ r_opq.T, 6)]
    want = [tuple(r) for r in PQ.pq_adc_topk(codes_df, cb, rq, k=10).collect()]

    p1 = str(tmp_path / "opq_full")
    A.build_opq_index(corpus, p1, r_opq)
    got = [tuple(r) for r in A.opq_probe(spark, p1, qv, k=10).collect()]
    assert got == want

    p2 = str(tmp_path / "opq_incr")
    half = corpus.filter(F.col("vec_id") <= 300)
    rest = corpus.filter(F.col("vec_id") > 300)
    A.build_opq_index(half, p2, r_opq)
    A.append_opq_index(rest, p2)
    got2 = [tuple(r) for r in A.opq_probe(spark, p2, qv, k=10).collect()]
    assert got2 == want
    assert [e["op"] for e in A.read_manifest(p2)] == ["build", "append"]

    with pytest.raises(ValueError, match="query dim"):
        A.opq_probe(spark, p1, qv[:32], k=5)
    with pytest.raises(ValueError, match="full-rank"):
        A.build_opq_index(corpus, str(tmp_path / "opq_bad"), r_opq[:32])


def test_ivfopq_allcells_equals_flat_opq_and_append(spark, emb, tmp_path):
    """IVF-OPQ composition (r14): (1) probing ALL cells removes the
    coarse level entirely, so the result must equal the flat OPQ index
    over the same rotation/codebooks — the composition adds pruning,
    never different arithmetic; (2) with n_probe=4 the result is the
    all-cells result filtered to probed cells (subset, same scores);
    (3) base build + append probes identically to a fresh full build
    (frozen rotation, centroids, codebooks); (4) guards raise."""
    from unified_log_aggregation_and_analytics_spark.operators import (
        ann_index as A,
        similarity as S,
    )

    corpus = emb.filter(F.col("vec_id") > 1)
    qv = [float(x) for x in emb.select("embedding").first()[0]]
    R = S.power_pca_rotation(corpus, n_components=64, iters=16)
    r_opq = R[PQ.opq_interleave_perm(64, 4)]

    flat = str(tmp_path / "opq_flat")
    A.build_opq_index(corpus, flat, r_opq)
    want = [tuple(r) for r in A.opq_probe(spark, flat, qv, k=10).collect()]

    p1 = str(tmp_path / "ivfopq")
    A.build_ivfopq_index(corpus, p1, r_opq, n_centroids=8)
    got_all = [
        tuple(r) for r in A.ivfopq_probe(spark, p1, qv, k=10, n_probe=8).collect()
    ]
    assert got_all == want

    pruned = A.ivfopq_probe(spark, p1, qv, k=10, n_probe=3).collect()
    all_scores = dict(want)
    assert 0 < len(pruned) <= 10
    for r in pruned:
        assert r.adc_dist == all_scores.get(r.vec_id, r.adc_dist)

    p2 = str(tmp_path / "ivfopq_incr")
    half = corpus.filter(F.col("vec_id") <= 300)
    rest = corpus.filter(F.col("vec_id") > 300)
    A.build_ivfopq_index(half, p2, r_opq, n_centroids=8)
    A.append_ivfopq_index(rest, p2)
    got2 = [
        tuple(r) for r in A.ivfopq_probe(spark, p2, qv, k=10, n_probe=8).collect()
    ]
    assert got2 == want
    assert [e["op"] for e in A.read_manifest(p2)] == ["build", "append"]

    with pytest.raises(ValueError, match="query dim"):
        A.ivfopq_probe(spark, p1, qv[:32], k=5)
    with pytest.raises(ValueError, match="full-rank"):
        A.build_ivfopq_index(corpus, str(tmp_path / "bad"), r_opq[:32])


def test_ivfopq_hand_replay_tiny(spark, tmp_path):
    """Hand pin (r14, the per-entry discipline): an 8-vector dim-4
    corpus, a PERMUTATION rotation (orthonormal, trivially checkable),
    m=2/codes=2/2 cells — every stage (projection, cell argmax, probe
    ranking, per-subspace code argmin, ADC sums, tie order) replayed
    in plain Python floats, independent of both Spark and DuckDB."""
    from unified_log_aggregation_and_analytics_spark.operators import ann_index as A

    # rotation = cyclic coordinate shift (x0,x1,x2,x3) -> (x1,x2,x3,x0)
    R = np.zeros((4, 4))
    for i in range(4):
        R[i, (i + 1) % 4] = 1.0
    vecs = {
        1: [1.0, 0.0, 0.25, 0.0],
        2: [0.0, 1.0, 0.0, 0.25],
        3: [0.9, 0.1, 0.2, 0.0],
        4: [0.1, 0.8, 0.0, 0.3],
        5: [0.5, 0.5, 0.1, 0.1],
        6: [0.2, 0.7, 0.1, 0.2],
        7: [0.8, 0.0, 0.3, 0.1],
        8: [0.3, 0.3, 0.2, 0.2],
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "tiny")
    A.build_ivfopq_index(df, path, R, n_centroids=2, m=2, codes=2)
    qv = [0.85, 0.05, 0.25, 0.05]
    got = [
        (r.vec_id, r.adc_dist)
        for r in A.ivfopq_probe(spark, path, qv, k=8, n_probe=1).collect()
    ]

    # ---- plain-Python replay ----
    cb = PQ.seeded_pq_codebooks(4, m=2, codes=2, seed=42)
    rot = {i: [round(x, 6) for x in (np.asarray(v) @ R.T)] for i, v in vecs.items()}
    rq = [round(x, 6) for x in (np.asarray(qv) @ R.T)]
    cents = [rot[1], rot[2]]  # two lowest-id rotated vectors

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = (sum(x * x for x in a) ** 0.5) * (sum(y * y for y in b) ** 0.5)
        return num / den

    # probe cell: argmax cosine(centroid, rq), ties -> higher ordinal
    sims = [cos(c, rq) for c in cents]
    probe_cell = max(range(2), key=lambda i: (sims[i], i))
    exp = []
    for i, rv in rot.items():
        cell = max(range(2), key=lambda c: (cos(cents[c], rv), -c))
        if cell != probe_cell:
            continue
        dist = 0.0
        for mi in range(2):
            sub = rv[mi * 2 : mi * 2 + 2]
            best = min(
                range(2),
                key=lambda ci: (
                    sum((s - w) ** 2 for s, w in zip(sub, cb[mi, ci])),
                    ci,
                ),
            )
            dist += sum((rq[mi * 2 + j] - cb[mi, best][j]) ** 2 for j in range(2))
        exp.append((i, round(dist, 6)))
    exp.sort(key=lambda t: (t[1], t[0]))
    assert got == exp and len(exp) > 0


def test_ivfopq_beats_or_ties_ivfpq_on_anisotropic_corpus(spark):
    """Trained IVF-OPQ vs trained IVF-PQ at identical code size and
    identical probe width on the anisotropic corpus of
    test_opq_beats_pq_on_anisotropic_corpus: the rotation deals the
    4-dim signal one direction per subspace, so recall@10 must be
    strictly higher (the flat-OPQ gain surviving the coarse level)."""
    from unified_log_aggregation_and_analytics_spark.operators import (
        ann_index as A,
        similarity as S,
    )
    import tempfile

    rng = np.random.default_rng(7)
    n, dim, m = 400, 64, 4
    X = np.zeros((n, dim))
    X[:, :4] = rng.standard_normal((n, 4)) * np.asarray([1.0, 1.2, 1.4, 1.6])
    X[:, 4:] = rng.standard_normal((n, 60)) * 0.01
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).cache()
    qv = [float(x) for x in X[0]]
    corpus = df.filter(F.col("vec_id") != 0)
    exact = {r.vec_id for r in PQ.l2_topk(corpus, qv, k=10).collect()}

    with tempfile.TemporaryDirectory() as td:
        A.build_ivfpq_index(corpus, f"{td}/ivfpq", n_centroids=16, m=m, codes=8,
                            train_iters=2)
        pq10 = {
            r.vec_id
            for r in A.ivfpq_probe(spark, f"{td}/ivfpq", qv, k=10, n_probe=4).collect()
        }
        R = S.power_pca_rotation(corpus, n_components=dim, iters=16)
        A.build_ivfopq_index(
            corpus, f"{td}/ivfopq", R[PQ.opq_interleave_perm(dim, m)],
            n_centroids=16, m=m, codes=8, train_iters=2,
        )
        opq10 = {
            r.vec_id
            for r in A.ivfopq_probe(
                spark, f"{td}/ivfopq", qv, k=10, n_probe=4
            ).collect()
        }
    pq_recall = len(pq10 & exact) / 10.0
    opq_recall = len(opq10 & exact) / 10.0
    assert opq_recall > pq_recall, (pq_recall, opq_recall)
