"""Streaming LLM-corpus ingestion e2e (streaming/corpus.py): the
document-side twin of the log pipeline. Across multiple micro-batches
the sink + DLQ + fingerprint sidecar must reproduce EXACTLY the
routing the oracle-checked batch analog (`docs_corpus_ingest`)
computes — including a duplicate that arrives in a LATER batch than
its original, which only the sidecar can catch.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from unified_log_aggregation_and_analytics_spark.sources.batch import load_table
from unified_log_aggregation_and_analytics_spark.streaming.corpus import (
    corpus_ingest_batch,
    ingest_report,
    run_corpus_pipeline,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, "documents", SF_DIR)


def _write_batches(docs_pdf, src_dir: Path, n_batches: int = 3) -> None:
    """Split documents round-robin into n_batches json files; file
    order (b00, b01, ...) is the micro-batch order under
    maxFilesPerTrigger=1."""
    for b in range(n_batches):
        part = docs_pdf[docs_pdf["doc_id"] % n_batches == b]
        lines = part.to_json(orient="records", lines=True)
        (src_dir / f"b{b:02d}.json").write_text(lines)


def test_corpus_pipeline_end_to_end(spark, docs, tmp_path):
    """Multi-batch streaming ingest: sink partitioned by lang, DLQ
    carries the failed rule, sidecar holds one fingerprint per
    ingested doc, and (ingested + rejected + dropped-duplicates)
    reconciles exactly with the batch-analog report."""
    n_docs = 120
    pdf = (
        docs.filter(F.col("doc_id") < n_docs)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .toPandas()
    )
    # plant a cross-batch duplicate: a KEPT doc's text re-ingested
    # under the next id — consecutive ids always land in different
    # round-robin batches (mod 3), so only the fingerprint sidecar
    # can drop the copy
    from unified_log_aggregation_and_analytics_spark.operators.text import (
        quality_filter,
    )

    kept_ids = {
        r[0]
        for r in quality_filter(docs.filter(F.col("doc_id") < n_docs - 1))
        .filter(F.col("kept"))
        .select("doc_id")
        .collect()
    }
    d = min(kept_ids)
    dup_src = pdf[pdf["doc_id"] == d].iloc[0]
    pdf.loc[pdf["doc_id"] == d + 1, "text"] = dup_src["text"]
    pdf.loc[pdf["doc_id"] == d + 1, "lang"] = dup_src["lang"]

    src_dir = tmp_path / "incoming"
    src_dir.mkdir()
    _write_batches(pdf, src_dir, n_batches=3)

    table = str(tmp_path / "corpus")
    rejected = str(tmp_path / "rejected")
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(src_dir))
    )
    res = run_corpus_pipeline(
        stream, table, rejected, str(tmp_path / "ckpt"), trigger={"availableNow": True}
    )
    res.await_done()

    # batch-analog truth over the SAME (duplicate-planted) corpus
    batch_docs = spark.createDataFrame(pdf)
    report = {
        (r["lang"], r["outcome"]): r["n_docs"]
        for r in ingest_report(batch_docs).collect()
    }
    want_ingested = sum(n for (_, o), n in report.items() if o == "ingested")
    want_rejected = sum(n for (_, o), n in report.items() if o.startswith("rejected:"))
    want_dups = sum(n for (_, o), n in report.items() if o == "duplicate")
    assert want_dups >= 1  # the planted duplicate is live

    ingested = spark.read.parquet(table)
    assert ingested.count() == want_ingested
    # the planted cross-batch duplicate pair yields exactly one survivor
    ids = {r[0] for r in ingested.select("doc_id").collect()}
    assert len(ids & {d, d + 1}) == 1
    # mixture-aware layout: one directory per stratum
    langs = {r[0] for r in ingested.select("lang").distinct().collect()}
    # fenced layout (r8): batch partitions lead, stratum dirs nested
    on_disk = {p.name.split("=")[1] for p in Path(table).glob("_commit_batch=*/lang=*")}
    assert on_disk == langs

    rej = spark.read.parquet(rejected)
    assert rej.count() == want_rejected
    got_rej = {
        (r["lang"], "rejected:" + r["_error"]): r["n"]
        for r in rej.groupBy("lang", "_error").agg(F.count("*").alias("n")).collect()
    }
    assert got_rej == {k: v for k, v in report.items() if k[1].startswith("rejected:")}

    # sidecar: exactly one fingerprint per ingested doc, bucket-partitioned
    sidecar = spark.read.parquet(table + "_fingerprints")
    assert sidecar.count() == want_ingested
    assert sidecar.select("fp").distinct().count() == want_ingested
    # flat sidecar layout (r8): ONE coalesced file per batch partition
    fp_files = list(Path(table + "_fingerprints").glob("_commit_batch=*/*.parquet"))
    assert len(fp_files) >= 1
    per_batch = {}
    for f in fp_files:
        per_batch.setdefault(f.parent.name, []).append(f)
    assert all(len(v) == 1 for v in per_batch.values()), per_batch

    # per-stratum ingest accounting matches the oracle-checked analog
    got_ingested = {
        (r["lang"], "ingested"): r["n"]
        for r in ingested.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert got_ingested == {k: v for k, v in report.items() if k[1] == "ingested"}


def test_corpus_ingest_idempotent_replay(spark, docs, tmp_path):
    """Exactly-once story: replaying a micro-batch (the checkpoint
    recovery path) must not double-ingest — the sidecar anti-join
    makes the corpus append idempotent."""
    pdf_docs = docs.filter(F.col("doc_id") < 60)
    table = str(tmp_path / "corpus")
    rejected = str(tmp_path / "rejected")
    corpus_ingest_batch(pdf_docs, table, rejected)
    n1 = spark.read.parquet(table).count()
    side1 = spark.read.parquet(table + "_fingerprints").count()
    corpus_ingest_batch(pdf_docs, table, rejected)  # torn-batch replay
    assert spark.read.parquet(table).count() == n1
    assert spark.read.parquet(table + "_fingerprints").count() == side1


def test_corpus_ingest_report_matches_manual(spark, docs):
    """The routing partition is total and disjoint: every doc lands in
    exactly one outcome, and outcome totals sum to the corpus."""
    sub = docs.filter(F.col("doc_id") < 200)
    rep = ingest_report(sub).collect()
    assert sum(r["n_docs"] for r in rep) == sub.count()
    outcomes = {r["outcome"] for r in rep}
    assert "ingested" in outcomes
    assert all(
        o == "ingested" or o == "duplicate" or o.startswith("rejected:")
        for o in outcomes
    )


def _kept_docs_pdf(spark, docs, n, lo=0):
    """First n docs with doc_id >= lo that pass the quality filter."""
    from unified_log_aggregation_and_analytics_spark.operators.text import (
        quality_filter,
    )

    sub = docs.filter(F.col("doc_id") >= lo)
    kept = (
        quality_filter(sub)
        .filter(F.col("kept"))
        .select("doc_id")
        .orderBy("doc_id")
        .limit(n)
    )
    return (
        sub.join(kept, "doc_id")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .toPandas()
    )


def test_corpus_near_dup_cross_batch(spark, docs, tmp_path):
    """near_dup=True: a slightly-edited copy of an ALREADY-INGESTED
    document (different exact fingerprint, high shingle Jaccard) is
    caught by the band+signature sidecars in a LATER batch and
    dead-lettered as near_duplicate; an unrelated doc in the same
    batch ingests normally."""
    table = str(tmp_path / "corpus")
    rejected = str(tmp_path / "rejected")
    base = _kept_docs_pdf(spark, docs, 30)
    corpus_ingest_batch(
        spark.createDataFrame(base), table, rejected, near_dup=True
    )
    n1 = spark.read.parquet(table).count()
    assert n1 > 0

    victim = base.iloc[0]
    unrelated = _kept_docs_pdf(spark, docs, 1, lo=400).iloc[0]
    batch2 = base.iloc[0:0].copy()
    batch2.loc[0] = [
        9001,
        victim["text"] + " appended trailing tokens",
        victim["lang"],
        victim["source"],
        victim["n_chars"],
    ]
    batch2.loc[1] = [
        9002,
        unrelated["text"],
        unrelated["lang"],
        unrelated["source"],
        unrelated["n_chars"],
    ]
    corpus_ingest_batch(
        spark.createDataFrame(batch2), table, rejected, near_dup=True
    )

    rej = spark.read.parquet(rejected)
    nd = {r["doc_id"] for r in rej.filter(F.col("_error") == "near_duplicate").collect()}
    assert 9001 in nd and 9002 not in nd
    ids = {r[0] for r in spark.read.parquet(table).select("doc_id").collect()}
    assert 9002 in ids and 9001 not in ids
    # sidecars carry only survivors: one sig row per ingested doc
    sigs = spark.read.parquet(table + "_minhash_sigs")
    assert sigs.count() == len(ids)
    assert len(list(Path(table + "_minhash_bands").glob("_commit_batch=*/*.parquet"))) >= 1


def test_corpus_near_dup_sidecars_complete_after_cross_batch(spark, docs, tmp_path):
    """Regression (ADVICE r4 high): the band/sig sidecar appends used
    to invalidate the persisted `kept` plan, so the later fp-sidecar
    and token-index appends recomputed `kept` against a band sidecar
    already containing this batch's own rows — self-pairs verified at
    est_jaccard 1.0 and silently dropped survivors' fingerprints.
    After any batch with cross-batch candidates: fp-sidecar count must
    equal corpus count, and a later EXACT duplicate of a survivor must
    route as 'duplicate' (fp anti-join), never 'near_duplicate'."""
    table = str(tmp_path / "corpus")
    rejected = str(tmp_path / "rejected")
    base = _kept_docs_pdf(spark, docs, 2)
    corpus_ingest_batch(spark.createDataFrame(base), table, rejected, near_dup=True)

    # batch 2: one near-dup of an ingested doc (cross-batch candidate
    # traffic) + one genuinely new survivor. The survivor's doc_id is
    # chosen so its sig-bucket collides with the victim's — the stale
    # `obuckets` pruning list of the pre-fix plan — which is exactly
    # the state where the recomputed `kept` verified a self-pair and
    # dropped the survivor's fingerprint.
    victim = base.iloc[0]
    victim_bucket = (
        spark.range(int(victim["doc_id"]), int(victim["doc_id"]) + 1)
        .select(F.pmod(F.xxhash64("id"), F.lit(64)).alias("b"))
        .first()[0]
    )
    collide_id = (
        spark.range(9210, 50000)
        .filter(F.pmod(F.xxhash64("id"), F.lit(64)) == victim_bucket)
        .orderBy("id")
        .first()[0]
    )
    fresh = _kept_docs_pdf(spark, docs, 1, lo=300).iloc[0]
    b2 = base.iloc[0:0].copy()
    b2.loc[0] = [
        9201,
        victim["text"] + " trailing tail tokens",
        victim["lang"],
        victim["source"],
        victim["n_chars"],
    ]
    b2.loc[1] = [
        int(collide_id),
        fresh["text"],
        fresh["lang"],
        fresh["source"],
        fresh["n_chars"],
    ]
    corpus_ingest_batch(spark.createDataFrame(b2), table, rejected, near_dup=True)

    n_corpus = spark.read.parquet(table).count()
    assert spark.read.parquet(table + "_fingerprints").count() == n_corpus
    assert spark.read.parquet(table + "_minhash_sigs").count() == n_corpus
    assert int(collide_id) in {
        r[0] for r in spark.read.parquet(table).select("doc_id").collect()
    }

    # batch 3: EXACT duplicate of the batch-2 survivor — must be
    # caught by the fp sidecar (outcome 'duplicate' = dropped without
    # a DLQ near_duplicate row), which only works if its fingerprint
    # was recorded
    b3 = base.iloc[0:0].copy()
    b3.loc[0] = [
        9301,
        fresh["text"],
        fresh["lang"],
        fresh["source"],
        fresh["n_chars"],
    ]
    corpus_ingest_batch(spark.createDataFrame(b3), table, rejected, near_dup=True)
    assert spark.read.parquet(table).count() == n_corpus
    rej_nd = {
        r["doc_id"]
        for r in spark.read.parquet(rejected)
        .filter(F.col("_error") == "near_duplicate")
        .collect()
    }
    assert 9301 not in rej_nd, "exact dup misrouted as near_duplicate"


def test_corpus_near_dup_within_batch(spark, docs, tmp_path):
    """near_dup=True: two near-identical docs arriving in the SAME
    batch collapse to the lower id; the higher id dead-letters."""
    table = str(tmp_path / "corpus")
    rejected = str(tmp_path / "rejected")
    base = _kept_docs_pdf(spark, docs, 5)
    victim = base.iloc[0]
    twin = base.iloc[0:0].copy()
    twin.loc[0] = [
        9100,
        victim["text"],
        victim["lang"],
        victim["source"],
        victim["n_chars"],
    ]
    twin.loc[1] = [
        9101,
        victim["text"] + " tail edit",
        victim["lang"],
        victim["source"],
        victim["n_chars"],
    ]
    corpus_ingest_batch(
        spark.createDataFrame(twin), table, rejected, near_dup=True
    )
    ids = {r[0] for r in spark.read.parquet(table).select("doc_id").collect()}
    assert ids == {9100}
    rej = spark.read.parquet(rejected)
    nd = {r["doc_id"] for r in rej.filter(F.col("_error") == "near_duplicate").collect()}
    assert nd == {9101}


def test_corpus_near_dup_replay_idempotent(spark, docs, tmp_path):
    """Checkpoint-replay idempotence extends to the near-dup sidecars:
    re-running a batch adds nothing to the corpus, the fingerprint
    sidecar, or the band/sig sidecars (the fp anti-join empties the
    replayed batch before any near-dup work)."""
    table = str(tmp_path / "corpus")
    rejected = str(tmp_path / "rejected")
    base = _kept_docs_pdf(spark, docs, 20)
    bdf = spark.createDataFrame(base)
    corpus_ingest_batch(bdf, table, rejected, near_dup=True)
    counts = {
        p: spark.read.parquet(table + p).count()
        for p in ("", "_fingerprints", "_minhash_sigs", "_minhash_bands")
    }
    corpus_ingest_batch(bdf, table, rejected, near_dup=True)  # replay
    for p, n in counts.items():
        assert spark.read.parquet(table + p).count() == n, p


def test_corpus_metrics_reconcile(spark, docs, tmp_path):
    """K5 parity for the corpus side: per-batch outcome metrics sum to
    exactly the outcomes on disk — ingested rows, DLQ rows per rule,
    and the dedup drops — across all micro-batches."""
    pdf = (
        docs.filter(F.col("doc_id") < 90)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .toPandas()
    )
    src_dir = tmp_path / "incoming"
    src_dir.mkdir()
    _write_batches(pdf, src_dir, n_batches=3)
    table = str(tmp_path / "corpus")
    rejected = str(tmp_path / "rejected")
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(src_dir))
    )
    run_corpus_pipeline(
        stream, table, rejected, str(tmp_path / "ckpt"), trigger={"availableNow": True}
    ).await_done()

    metrics = spark.read.parquet(table + "_metrics")
    assert metrics.select("batch_id").distinct().count() == 3
    per_outcome = {
        r["outcome"]: r["total"]
        for r in metrics.groupBy("outcome").agg(F.sum("n").alias("total")).collect()
    }
    assert per_outcome["ingested"] == spark.read.parquet(table).count()
    rej = spark.read.parquet(rejected)
    for r in rej.groupBy("_error").agg(F.count("*").alias("n")).collect():
        assert per_outcome["rejected:" + r["_error"]] == r["n"]
    assert sum(per_outcome.values()) == len(pdf)


def test_corpus_metrics_cost_one_extra_job(spark, docs, tmp_path):
    """Per-batch accounting rides the write jobs as observe()
    aggregates, so enabling ``batch_id`` costs exactly ONE extra
    Spark job — the metrics-table append — never dedicated .count()
    actions (round-5 verdict item: 3-4 count jobs per trigger)."""
    bdf = docs.filter(F.col("doc_id") < 60).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    bdf = bdf.localCheckpoint()  # freeze input lineage across runs
    tracker = spark.sparkContext.statusTracker()
    spark.range(1).count()  # seed: guarantee a known job id exists

    def jobs(run_id: str, batch_id):
        before = max(tracker.getJobIdsForGroup(None))
        corpus_ingest_batch(
            bdf,
            str(tmp_path / f"corpus_{run_id}"),
            str(tmp_path / f"rej_{run_id}"),
            near_dup=True,
            batch_id=batch_id,
        )
        return max(tracker.getJobIdsForGroup(None)) - before

    base = jobs("plain", None)
    with_metrics = jobs("metered", 0)
    assert with_metrics == base + 1, (
        f"metrics must add exactly the metrics-append job: "
        f"{base} jobs plain vs {with_metrics} with batch_id"
    )


def test_corpus_metrics_empty_batch_zero_rows(spark, docs, tmp_path):
    """observe() on an empty micro-batch must report zeros, not hang
    (Observation.get blocks until an action fills it — the write job
    still runs for an empty frame)."""
    table = str(tmp_path / "corpus")
    empty = docs.filter(F.col("doc_id") < 0)
    corpus_ingest_batch(empty, table, str(tmp_path / "rej"), near_dup=True, batch_id=3)
    m = {
        r["outcome"]: r["n"]
        for r in spark.read.parquet(table + "_metrics").collect()
    }
    assert m == {"ingested": 0, "near_duplicate": 0, "duplicate": 0}


def test_corpus_ingest_empty_batch_is_noop(spark, docs, tmp_path):
    """An empty micro-batch (idle trigger) must not crash or disturb
    state; a later real batch ingests normally."""
    table = str(tmp_path / "corpus")
    rejected = str(tmp_path / "rejected")
    empty = docs.filter(F.col("doc_id") < 0)
    corpus_ingest_batch(empty, table, rejected, near_dup=True)
    real = docs.filter(F.col("doc_id") < 40)
    corpus_ingest_batch(real, table, rejected, near_dup=True)
    assert spark.read.parquet(table).count() > 0
    corpus_ingest_batch(empty, table, rejected, near_dup=True)  # idle again
    n = spark.read.parquet(table).count()
    assert n == spark.read.parquet(table + "_fingerprints").count()


def test_compact_sidecars_preserves_dedup(spark, docs, tmp_path):
    """Sidecar compaction folds per-batch small files to one per
    partition without changing any routing decision: a replayed and a
    genuinely-new batch behave identically after compaction."""
    from unified_log_aggregation_and_analytics_spark.streaming.corpus import (
        compact_sidecars,
    )

    table = str(tmp_path / "corpus")
    rejected = str(tmp_path / "rejected")
    b1 = _kept_docs_pdf(spark, docs, 15)
    b2 = _kept_docs_pdf(spark, docs, 15, lo=200)
    corpus_ingest_batch(spark.createDataFrame(b1), table, rejected, near_dup=True)
    corpus_ingest_batch(spark.createDataFrame(b2), table, rejected, near_dup=True)

    fp_dir = Path(table + "_fingerprints")
    n_before = spark.read.parquet(str(fp_dir)).count()
    # fenced layout: two batches -> two _commit_batch partitions
    assert len(list(fp_dir.glob("_commit_batch=*"))) == 2

    compact_sidecars(spark, table)

    # folded into ONE committed batch partition with ONE file
    assert len(list(fp_dir.glob("_commit_batch=*"))) == 1
    assert len(list(fp_dir.glob("_commit_batch=*/*.parquet"))) == 1
    for side in ("_minhash_bands", "_minhash_sigs"):
        assert len(list(Path(table + side).glob("_commit_batch=*/*.parquet"))) == 1
    assert spark.read.parquet(str(fp_dir)).count() == n_before

    # replay of batch 1 still fully deduped; a near-dup of an ingested
    # doc is still caught through the compacted band/sig sidecars
    n_table = spark.read.parquet(table).count()
    corpus_ingest_batch(spark.createDataFrame(b1), table, rejected, near_dup=True)
    assert spark.read.parquet(table).count() == n_table
    victim = b1.iloc[0]
    nd = b1.iloc[0:0].copy()
    nd.loc[0] = [
        9500,
        victim["text"] + " tail tokens",
        victim["lang"],
        victim["source"],
        victim["n_chars"],
    ]
    corpus_ingest_batch(spark.createDataFrame(nd), table, rejected, near_dup=True)
    rej = spark.read.parquet(rejected)
    assert 9500 in {
        r["doc_id"] for r in rej.filter(F.col("_error") == "near_duplicate").collect()
    }


def test_streaming_maintained_token_index(spark, docs, tmp_path):
    """The reference's core loop as Spark: continuously-ingested
    documents stay SEARCHABLE — each micro-batch appends its survivors
    into the persisted inverted index, and after the run, BM25 over
    the streaming-maintained index is value-identical to an index
    built from scratch over the final corpus."""
    import shutil
    from urllib.parse import urlparse

    from unified_log_aggregation_and_analytics_spark.operators import (
        relational as R,
    )

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for name in ("tok_stream_idx", "tok_stream_ref"):
        for suffix in ("", "_doclen", "_stats"):
            spark.sql(f"DROP TABLE IF EXISTS {name}{suffix}")
            leftover = Path(wh) / (name + suffix).lower()
            if leftover.exists():
                shutil.rmtree(leftover)

    pdf = (
        docs.filter(F.col("doc_id") < 90)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .toPandas()
    )
    src_dir = tmp_path / "incoming"
    src_dir.mkdir()
    _write_batches(pdf, src_dir, n_batches=3)
    table = str(tmp_path / "corpus")
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(src_dir))
    )
    run_corpus_pipeline(
        stream,
        table,
        str(tmp_path / "rejected"),
        str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
        token_index="tok_stream_idx",
    ).await_done()

    # reference index: fresh build over exactly the ingested corpus
    R.build_token_index_table(
        spark.read.parquet(table).select("doc_id", "text"), "tok_stream_ref"
    )
    terms = ["merge", "spark", "vector"]
    got = sorted(
        tuple(r) for r in R.bm25_search_indexed(spark, "tok_stream_idx", terms, k=10).collect()
    )
    want = sorted(
        tuple(r) for r in R.bm25_search_indexed(spark, "tok_stream_ref", terms, k=10).collect()
    )
    assert got == want and len(got) > 0


def test_streaming_vs_batch_banding_agreement(spark):
    """Quantifies how far the streaming near-dup S-curve (16 xxhash64
    minhashes, 4-hash bands) and the oracle-checked batch twin's
    (8 md5 minhashes, 2-hash bands — DuckDB-replayable) may diverge:
    on a 41-pair corpus spanning true Jaccard 0.18-0.97 at threshold
    0.6, routing must agree EXACTLY away from the threshold (J <= 0.35
    never flagged, J >= 0.85 always flagged, by BOTH paths) and on
    >= 26/41 pairs overall. Both hash families are deterministic, so
    the measurement is exact and stable; a parameter or kernel change
    that widens the divergence fails here."""
    from unified_log_aggregation_and_analytics_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signature,
    )

    rows, true_j = [], {}
    for i in range(41):
        m = 20 + i  # shared token prefix out of 60
        base = [f"p{i}w{j}" for j in range(60)]
        alt = base[:m] + [f"p{i}x{j}" for j in range(60 - m)]
        a_id, b_id = 1000 + 2 * i, 1001 + 2 * i
        rows += [(a_id, " ".join(base)), (b_id, " ".join(alt))]
        shared = max(m - 2, 0)  # trigram shingles shared
        true_j[b_id] = shared / (2 * 58 - shared)
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def flagged(num_hashes, band_size, hash_fn):
        sigs = minhash_signature(docs, num_hashes=num_hashes, hash_fn=hash_fn)
        pairs = minhash_lsh_candidates(
            sigs, num_hashes=num_hashes, band_size=band_size, band_hash_fn=hash_fn
        )
        mh = [f"mh{k}" for k in range(1, num_hashes + 1)]
        sa = sigs.select(
            F.col("doc_id").alias("id_a"), *[F.col(m).alias(m + "a") for m in mh]
        )
        sb = sigs.select(
            F.col("doc_id").alias("id_b"), *[F.col(m).alias(m + "b") for m in mh]
        )
        est = (
            pairs.join(sa, "id_a")
            .join(sb, "id_b")
            .withColumn(
                "ej",
                sum(
                    F.when(F.col(m + "a") == F.col(m + "b"), 1).otherwise(0)
                    for m in mh
                )
                / float(num_hashes),
            )
        )
        return {
            r["id_b"]
            for r in est.filter(F.col("ej") >= 0.6).select("id_b").distinct().collect()
        }

    stream_f = flagged(16, 4, "xxhash64")  # streaming path params
    batch_f = flagged(8, 2, "md5")  # oracle-twin params
    agree = sum((b in stream_f) == (b in batch_f) for b in true_j)
    assert agree >= 26, f"paths agree on only {agree}/41 pairs"
    for b, tj in true_j.items():
        if tj <= 0.35:
            assert b not in stream_f and b not in batch_f, (
                f"pair {b} (true J={tj:.2f}) flagged below the agreement band"
            )
        if tj >= 0.85:
            assert b in stream_f and b in batch_f, (
                f"pair {b} (true J={tj:.2f}) missed above the agreement band"
            )


def test_corpus_ingest_lm_fluency_gate(spark, tmp_path):
    """CCNet-style streaming fluency gate: a batch scored against the
    PERSISTED bigram LM routes low-fluency docs to the DLQ with
    verdict 'low_fluency', quality rules keep precedence, and the
    metrics rows account the new verdict exactly."""
    from unified_log_aggregation_and_analytics_spark.operators.text import (
        bigram_lm_score_indexed,
        train_bigram_lm,
    )

    vocab = [f"w{i}" for i in range(50)]
    train = spark.createDataFrame(
        [(i, " ".join(vocab)) for i in range(5)], ["doc_id", "text"]
    )
    lm_path = str(tmp_path / "lm")
    train_bigram_lm(train, lm_path)

    fluent = " ".join(vocab[:40])                      # bigrams all in-model
    gibberish = " ".join(f"g{i}" for i in range(40))   # bigrams all unseen
    batch = spark.createDataFrame(
        [(100, fluent, "en", "web", len(fluent)),
         (101, gibberish, "en", "web", len(gibberish)),
         (102, "tiny doc", "en", "web", 8)],           # fails too_short first
        ["doc_id", "text", "lang", "source", "n_chars"],
    )

    scores = {
        r["doc_id"]: r["avg_nll"]
        for r in bigram_lm_score_indexed(spark, batch, lm_path).collect()
    }
    assert scores[101] > scores[100]
    mid = (scores[100] + scores[101]) / 2

    table = str(tmp_path / "corpus")
    rejected = str(tmp_path / "rejected")
    corpus_ingest_batch(
        batch, table, rejected, batch_id=0,
        lm_model_path=lm_path, max_avg_nll=mid,
    )

    ingested = {r["doc_id"] for r in spark.read.parquet(table).collect()}
    assert ingested == {100}
    dlq = {r["doc_id"]: r["_error"] for r in spark.read.parquet(rejected).collect()}
    assert dlq == {101: "low_fluency", 102: "too_short"}

    metrics = {
        (r["outcome"]): r["n"]
        for r in spark.read.parquet(f"{table}_metrics").collect()
    }
    assert metrics["ingested"] == 1
    assert metrics["rejected:low_fluency"] == 1
    assert metrics["rejected:too_short"] == 1
    assert metrics.get("duplicate", 0) == 0


def test_corpus_torn_batch_replay_no_duplicates(spark, docs, tmp_path, monkeypatch):
    """Kill-between-appends e2e for the manifest-fenced commit: the
    batch dies after the corpus-table append but before the
    fingerprint-sidecar append. The torn rows are invisible (no
    marker); the replay recomputes the identical survivor set and
    replaces the torn partitions — no duplicate doc_ids in the
    committed corpus."""
    from unified_log_aggregation_and_analytics_spark.streaming import fence

    table = str(tmp_path / "corpus")
    rejected = str(tmp_path / "rejected")
    pdf = _kept_docs_pdf(spark, docs, 20)
    bdf = spark.createDataFrame(pdf)

    real_append = fence.fenced_append

    def killed_at_fp_sidecar(df, path, batch_id, partition_cols=()):
        if path.endswith("_fingerprints"):
            raise RuntimeError("simulated kill between table and sidecar appends")
        return real_append(df, path, batch_id, partition_cols)

    monkeypatch.setattr(fence, "fenced_append", killed_at_fp_sidecar)
    with pytest.raises(RuntimeError, match="simulated kill"):
        corpus_ingest_batch(bdf, table, rejected, batch_id=3)
    monkeypatch.undo()

    # torn table partition on disk, but not committed -> fenced read empty
    assert Path(table).joinpath("_commit_batch=3").is_dir()
    root = fence.fence_root(table)
    assert not fence.is_committed(spark, root, 3)
    assert fence.fenced_read(spark, table, root).count() == 0

    corpus_ingest_batch(bdf, table, rejected, batch_id=3)  # replay

    visible = fence.fenced_read(spark, table, root)
    n_docs = len(pdf)
    assert visible.count() == n_docs
    assert (
        visible.groupBy("doc_id").count().filter("count > 1").count() == 0
    ), "replayed torn batch duplicated corpus rows"
    # replay of the committed batch is a no-op
    corpus_ingest_batch(bdf, table, rejected, batch_id=3)
    assert fence.fenced_read(spark, table, root).count() == n_docs


def test_token_index_torn_replay_no_double_postings(spark, docs, tmp_path, monkeypatch):
    """The one non-fenced write in the corpus pipeline is the token
    INDEX append (bucketed saveAsTable). A batch that dies AFTER the
    index append but BEFORE the commit marker replays with the
    doc-granular idempotency guard: survivors anti-join the doclen
    table, so postings never double — BM25 over the replayed index is
    value-identical to a fresh build over the committed corpus."""
    import shutil
    from urllib.parse import urlparse

    from unified_log_aggregation_and_analytics_spark.operators import relational as R
    from unified_log_aggregation_and_analytics_spark.streaming import fence

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for name in ("tok_torn_idx", "tok_torn_ref"):
        for suffix in ("", "_doclen", "_stats"):
            spark.sql(f"DROP TABLE IF EXISTS {name}{suffix}")
            leftover = Path(wh) / (name + suffix).lower()
            if leftover.exists():
                shutil.rmtree(leftover)

    table = str(tmp_path / "corpus")
    rejected = str(tmp_path / "rejected")
    b1 = spark.createDataFrame(_kept_docs_pdf(spark, docs, 10))
    corpus_ingest_batch(b1, table, rejected, batch_id=0, token_index="tok_torn_idx")

    real_append = fence.fenced_append

    def killed_after_index(df, path, batch_id, partition_cols=()):
        # fp sidecar comes right after the token-index append
        if path.endswith("_fingerprints"):
            raise RuntimeError("simulated kill after token-index append")
        return real_append(df, path, batch_id, partition_cols)

    b2 = spark.createDataFrame(_kept_docs_pdf(spark, docs, 10, lo=200))
    monkeypatch.setattr(fence, "fenced_append", killed_after_index)
    with pytest.raises(RuntimeError, match="simulated kill"):
        corpus_ingest_batch(b2, table, rejected, batch_id=1, token_index="tok_torn_idx")
    monkeypatch.undo()

    # the torn attempt DID append batch-1 postings (that's the hazard)
    n_docs_after_torn = spark.table("tok_torn_idx_doclen").count()
    assert n_docs_after_torn == 20

    corpus_ingest_batch(b2, table, rejected, batch_id=1, token_index="tok_torn_idx")  # replay

    # doc-granular idempotency: one doclen row per doc, no doubled postings
    doclen = spark.table("tok_torn_idx_doclen")
    assert doclen.count() == 20
    assert doclen.select("doc_id").distinct().count() == 20
    dup_postings = (
        spark.table("tok_torn_idx")
        .groupBy("token", "doc_id")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dup_postings == 0, "torn replay doubled postings"

    # end-to-end: BM25 identical to a fresh index over the committed corpus
    committed = fence.fenced_read(spark, table, fence.fence_root(table))
    R.build_token_index_table(committed.select("doc_id", "text"), "tok_torn_ref")
    terms = ["merge", "spark", "vector"]
    got = sorted(
        tuple(r) for r in R.bm25_search_indexed(spark, "tok_torn_idx", terms, k=10).collect()
    )
    want = sorted(
        tuple(r) for r in R.bm25_search_indexed(spark, "tok_torn_ref", terms, k=10).collect()
    )
    assert got == want and len(got) > 0


def test_corpus_every_kill_point_replays_to_control_state(spark, docs, tmp_path, monkeypatch):
    """EXHAUSTIVE torn-batch sweep: kill the near-dup ingest at EVERY
    fenced write site in turn (reject, near-reject, table, sig, band,
    fp, metrics appends — and after the marker), replay, and require
    the final COMMITTED state (table rows, fp sidecar, metrics) to be
    byte-equal to a control run that was never killed. This is the
    fence's whole contract in one test: no write boundary anywhere in
    the batch may leak duplicates or lose rows under kill + replay."""
    from unified_log_aggregation_and_analytics_spark.streaming import fence

    b1 = spark.createDataFrame(_kept_docs_pdf(spark, docs, 12))
    pdf2 = _kept_docs_pdf(spark, docs, 12, lo=150)
    # make batch 2 interesting: an exact dup and a near-dup of batch 1
    base = _kept_docs_pdf(spark, docs, 2)
    pdf2.iloc[0, pdf2.columns.get_loc("text")] = base.iloc[0]["text"]
    toks = base.iloc[1]["text"].split()
    toks[3] = "zzzperturbed"
    pdf2.iloc[1, pdf2.columns.get_loc("text")] = " ".join(toks)
    b2 = spark.createDataFrame(pdf2)

    def run_to_dir(root_dir, kill_at=None):
        table = str(root_dir / "corpus")
        rejected = str(root_dir / "rejected")
        corpus_ingest_batch(b1, table, rejected, batch_id=0, near_dup=True)
        if kill_at is not None:
            calls = {"n": 0}
            real = fence.fenced_append

            def killer(df, path, batch_id, partition_cols=()):
                if calls["n"] == kill_at:
                    raise RuntimeError(f"kill at write {kill_at}")
                calls["n"] += 1
                return real(df, path, batch_id, partition_cols)

            monkeypatch.setattr(fence, "fenced_append", killer)
            try:
                corpus_ingest_batch(b2, table, rejected, batch_id=1, near_dup=True)
                killed = False
            except RuntimeError:
                killed = True
            finally:
                monkeypatch.undo()
            if not killed:
                return None  # kill site beyond this run's write count
        corpus_ingest_batch(b2, table, rejected, batch_id=1, near_dup=True)  # replay
        root = fence.fence_root(table)
        tbl = {
            tuple(r)
            for r in fence.fenced_read(spark, table, root)
            .select("doc_id", "text")
            .collect()
        }
        fps = sorted(
            r["fp"]
            for r in fence.fenced_read(spark, table + "_fingerprints", root).collect()
        )
        met = {
            (r["batch_id"], r["outcome"]): r["n"]
            for r in fence.fenced_read(spark, table + "_metrics", root).collect()
        }
        return tbl, fps, met

    control = run_to_dir(tmp_path / "control")
    assert control is not None and len(control[0]) > 12  # both batches landed
    site = 0
    exercised = 0
    while True:
        got = run_to_dir(tmp_path / f"kill{site}", kill_at=site)
        if got is None:
            break  # past the last write: batch completed uninterrupted
        assert got == control, f"kill at fenced write #{site} diverged"
        exercised += 1
        site += 1
    assert exercised >= 6, f"sweep exercised only {exercised} kill sites"

    # the last boundary: every append landed but the batch died before
    # its commit marker — the torn state is maximal yet still invisible
    d = tmp_path / "kill_marker"
    table = str(d / "corpus")
    rejected = str(d / "rejected")
    corpus_ingest_batch(b1, table, rejected, batch_id=0, near_dup=True)
    real_mark = fence.mark_committed

    def no_mark(spark_, root_, bid_):
        if int(bid_) == 1:
            raise RuntimeError("kill before marker")
        return real_mark(spark_, root_, bid_)

    monkeypatch.setattr(fence, "mark_committed", no_mark)
    with pytest.raises(RuntimeError, match="kill before marker"):
        corpus_ingest_batch(b2, table, rejected, batch_id=1, near_dup=True)
    monkeypatch.undo()
    root = fence.fence_root(table)
    assert not fence.is_committed(spark, root, 1)
    corpus_ingest_batch(b2, table, rejected, batch_id=1, near_dup=True)
    tbl = {
        tuple(r)
        for r in fence.fenced_read(spark, table, root).select("doc_id", "text").collect()
    }
    assert tbl == control[0], "marker-boundary kill diverged"


def test_streaming_fenced_token_index_asof(spark, docs, tmp_path):
    """Fenced streaming maintenance of the token index (r13): with
    ``token_index_delta`` set, post-first-batch survivors land as
    fenced per-batch deltas, so (1) the unpinned as-of probe over the
    live index equals a fresh build over the final corpus, and (2) a
    probe PINNED at the first delta batch equals a fresh build over
    exactly the corpus as of that batch — a training run's recorded
    pin replays its index under continued ingest."""
    import shutil
    from urllib.parse import urlparse

    from unified_log_aggregation_and_analytics_spark.operators import (
        relational as R,
    )
    from unified_log_aggregation_and_analytics_spark.streaming import fence

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for name in ("tok_fenced_idx", "tok_fenced_ref", "tok_fenced_pin"):
        for suffix in ("", "_doclen", "_stats"):
            spark.sql(f"DROP TABLE IF EXISTS {name}{suffix}")
            leftover = Path(wh) / (name + suffix).lower()
            if leftover.exists():
                shutil.rmtree(leftover)

    pdf = (
        docs.filter(F.col("doc_id") < 90)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .toPandas()
    )
    src_dir = tmp_path / "incoming"
    src_dir.mkdir()
    _write_batches(pdf, src_dir, n_batches=3)
    table = str(tmp_path / "corpus")
    delta = str(tmp_path / "tok_delta")
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(src_dir))
    )
    run_corpus_pipeline(
        stream,
        table,
        str(tmp_path / "rejected"),
        str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
        token_index="tok_fenced_idx",
        token_index_delta=delta,
    ).await_done()

    committed = fence.committed_batches(spark, fence.fence_root(delta))
    assert len(committed) == 2, committed  # batch 0 built the base

    terms = ["merge", "spark", "vector"]
    corpus = fence.fenced_read(spark, table, fence.fence_root(table))
    R.build_token_index_table(
        corpus.select("doc_id", "text"), "tok_fenced_ref"
    )
    want_all = R.bm25_search_indexed(spark, "tok_fenced_ref", terms, k=10).collect()
    got_all = R.bm25_search_indexed_asof(
        spark, "tok_fenced_idx", delta, terms, k=10
    ).collect()
    assert got_all == want_all and len(got_all) > 0

    # pin at the FIRST delta batch: equals a rebuild over the corpus
    # as of that batch (table batches <= pin+1: base batch + delta 1)
    pin = committed[0]
    as_of_corpus = fence.fenced_read(
        spark, table, fence.fence_root(table), keep_batch_col=True
    ).filter(F.col(fence.BATCH_COL) <= pin).drop(fence.BATCH_COL)
    R.build_token_index_table(
        as_of_corpus.select("doc_id", "text"), "tok_fenced_pin"
    )
    want_pin = R.bm25_search_indexed(spark, "tok_fenced_pin", terms, k=10).collect()
    got_pin = R.bm25_search_indexed_asof(
        spark, "tok_fenced_idx", delta, terms, k=10, as_of_batch=pin
    ).collect()
    assert got_pin == want_pin
    assert got_pin != got_all
