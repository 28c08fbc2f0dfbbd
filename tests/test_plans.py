"""Physical-plan quality guards: the properties that make these
queries scale — predicate pushdown, column pruning, broadcast dims,
no accidental cartesian products — asserted against .explain output so
a refactor can't silently regress them."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def _plan(spark, qs, name: str) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        qs[name](spark, SF).explain("formatted")
    return buf.getvalue()


def test_q01_filters_pushed_to_scan(spark, qs):
    plan = _plan(spark, qs, "q01_filter_predicates")
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(l_quantity,5" in plan
    assert "In(l_returnflag" in plan


def test_q04_column_pruning(spark, qs):
    plan = _plan(spark, qs, "q04_projection")
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    # only the four referenced columns are read, not the whole table
    for col in ("p_partkey", "p_brand", "p_type", "p_name"):
        assert col in read_schema
    assert "p_retailprice" not in read_schema


def _hinted_broadcast_count(spark, qs, name):
    """Count BroadcastHashJoins in the plan with auto-broadcast OFF —
    what remains is hint-driven shape, the plan the query would keep
    at 100 TB where no SF-growing side fits in memory."""
    import re

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, qs, name)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    return len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)), plan


def test_tpch_q3_no_sf_growing_broadcast(spark, qs):
    """Q3's only non-fact table is customer — O(rows/15), so nothing
    may be hint-broadcast: every join sort-merges at scale (AQE
    upgrades them at small SF)."""
    n, plan = _hinted_broadcast_count(spark, qs, "tpch_q3")
    assert n == 0, "q3 must not hint-broadcast any SF-growing table"
    assert "SortMergeJoin" in plan


def test_tpch_q5_broadcasts_constant_dims_only(spark, qs):
    """Q5 hints exactly nation (25 rows) and region (5 rows);
    customer and supplier joins must stay shuffle-planned."""
    n, plan = _hinted_broadcast_count(spark, qs, "tpch_q5")
    assert n == 2, "q5 may hint-broadcast only nation and region"
    assert "SortMergeJoin" in plan


def test_tpch_q18_broadcasts_qualifier_only(spark, qs):
    """Q18 hints exactly the HAVING-qualifier orderkey set (small by
    selectivity, not by SF); customer must stay shuffle-planned."""
    n, plan = _hinted_broadcast_count(spark, qs, "tpch_q18")
    assert n == 1, "q18 may hint-broadcast only the qualifier set"
    assert "SortMergeJoin" in plan


def test_tpch_q10_broadcasts_nation_only(spark, qs):
    """customer is O(rows/15) in TPC-H — a multi-TB side at 100 TB.
    Only the 25-row nation dim may broadcast; customer⋈orders must
    plan as a shuffle join. Auto-broadcast is disabled so the
    assertion reflects hint-driven plan shape, not tiny-SF file
    sizes."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, qs, "tpch_q10")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # formatted explain prints each node twice (tree + detail); count
    # unique "(id) Node" headers instead of raw substring hits
    import re

    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 1, (
        "only nation may broadcast"
    )
    assert "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan


def test_lsh_no_cartesian(spark, qs):
    plan = _plan(spark, qs, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_jaccard_group_then_pair(spark, qs):
    """The inverted-index jaccard reads the shingle stream once: no
    self-join at all — posting lists aggregate, pairs explode from
    them."""
    plan = _plan(spark, qs, "dedup_ngram_jaccard")
    assert "Join" not in plan
    assert "collect_set" in plan
    assert "CartesianProduct" not in plan


def test_topk_take_ordered(spark, qs):
    plan = _plan(spark, qs, "q10_topk_users")
    assert "TakeOrderedAndProject" in plan


def test_range_join_binned_no_nested_loop(spark, qs):
    """The binned range join must plan as an equi-join on (key, bin),
    never BroadcastNestedLoopJoin."""
    plan = _plan(spark, qs, "q13b_range_join_binned")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ann_index_probe_partition_pruned(spark, tmp_path):
    """The persisted ANN indexes must turn probes into partition-pruned
    reads: the scan node carries PartitionFilters on the bucket/cell
    partition column, and the pruned scan reads only the probed
    partitions — the property that makes the index an index."""
    from pyspark.sql import functions as F

    from unified_log_aggregation_and_analytics_spark.operators import ann_index as A
    from unified_log_aggregation_and_analytics_spark.operators.similarity import (
        ann_lsh_topk,
        knn_ivf,
    )
    from unified_log_aggregation_and_analytics_spark.sources.batch import load_table

    emb = load_table(spark, "embeddings", SF).filter(F.col("vec_id") != 0)
    qv = [
        float(x)
        for x in load_table(spark, "embeddings", SF)
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .first()[0]
    ]

    lsh_path = str(tmp_path / "lsh")
    A.build_lsh_index(emb, lsh_path)
    probe = A.lsh_probe(spark, lsh_path, qv, k=10)
    buf = io.StringIO()
    with redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "bucket" in plan
    # indexed result == scan-time result (same planes, same multiprobe)
    scan = ann_lsh_topk(emb, qv, k=10)
    assert probe.collect() == scan.collect()

    ivf_path = str(tmp_path / "ivf")
    A.build_ivf_index(emb, ivf_path, n_centroids=16)
    iprobe = A.ivf_probe(spark, ivf_path, qv, k=10, n_probe=4)
    buf = io.StringIO()
    with redirect_stdout(buf):
        iprobe.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "cell" in plan
    iscan = knn_ivf(emb, qv, k=10, n_probe=4)
    assert iprobe.collect() == iscan.collect()


# Entries allowed to plan a BroadcastNestedLoopJoin: each is a
# crossJoin(broadcast(<1-row scalar>)) — corpus stats or a single query
# vector — where BNLJ with a 1-row build side IS the right plan. Any
# other BNLJ (or any CartesianProduct anywhere) fails the sweep.
SCALAR_BROADCAST_OK = {
    "q02c_ranked_search",
    "q02e_indexed_bm25",
    "q02f_indexed_bm25_appended",  # same bm25_search_indexed plan as q02e
    "knn_cosine",
    "knn_batch",
    "text_tfidf_top",
    "ann_recall_report",  # composes knn_cosine's 1-row query broadcast
    "q02g_hybrid_rrf",  # composes bm25_search's 1-row corpus stats
    "text_lm_score",  # 1-row vocabulary-size scalar
    "docs_corpus_ingest_lm",  # composes the same 1-row V scalar
    "text_lm_score_indexed",  # same 1-row V scalar, read from the model
    "text_lm_heldout",  # same 1-row V scalar (external-lm branch)
    "docs_mixture_plan",  # 1-row (denom, budget) totals scalar over
    #   the per-source aggregate (sources, not corpus rows)
    "tpch_q22",  # 1-row (sum, count) balance-threshold scalar
    "tpch_q11",  # 1-row global-total threshold scalar
    "tpch_q15",  # 1-row max-revenue scalar
    "knn_graph_pagerank",  # 1-row node-count scalar per rank round
    "q07e_heavy_hitters",  # 1-row total-n threshold scalar (from the
    #   bounded persisted MG summary, not a corpus re-scan)
    "docs_dsir_sample",  # 1-row corpus/target gram-total scalars over
    #   the B-row bucket marginals of the persisted feature frame
    "q06e_significant_terms",  # 1-row fg/bg doc-total scalar
    "q02k_more_like_this",  # 1-row (n_docs, avg_dl) corpus scalars
    "q02w_rank_eval",  # same 1-row (n_docs, avg_dl) corpus scalars as
    #   bm25_search — one broadcast, all query terms share it
    "q10c_trending",  # 1-row latest-hour scalar over hour-x-type cells
    "q02o_percolate",  # match-all branch: build side = stored queries
    #   with EMPTY terms (vacuous AND fires on every doc) — a
    #   human-authored list, almost always empty
    "knn_hard_negatives",  # 20-row bounded anchor broadcast — the
    #   map-side Q x N scoring pass, same family as knn_batch; the
    #   label filter prunes inside the BNLJ's condition
    "knn_batch_sq8_indexed",  # 4-row bounded query broadcast over the
    #   codes table — the knn_batch shape on the compressed tier
    "text_ccnet_buckets",  # composes text_lm_score's whitelisted
    #   1-row vocabulary-size scalar
    "docs_doremi_mixture",  # 1-row EG-normalizer scalar over the
    #   k-row (k = #sources) checkpointed step frame; the LM-proxy
    #   construction runs eagerly at build (text_quality_train's
    #   feature-frame discipline) in text_lm_score's whitelisted shape
    "q02y_indexed_bm25_asof",  # the same 1-row (n_docs, avg_dl)
    #   corpus scalars as q02e, derived from the visible doclen union
    "q08j_auto_histogram",  # 1-row chosen-interval scalar (from the
    #   1-row span reduction) broadcast onto the bucketing pass
}

# Entries allowed >2 scans of one parquet file: filtered or map-only
# re-reads where the persisted-index/materialized variant is the scale
# path (documented in each docstring).
MULTI_SCAN_OK = {
    "q02c_ranked_search",
    "q13b_range_join_binned",
    "text_tfidf_top",
    # 4 scans = 2 references to the routing relation (final outcome join
    # + the near-dup branch) x the 2-scan quality subtree; the streaming
    # pipeline persists the routed batch (corpus_ingest_batch), so the
    # duplication exists only in this one-shot certificate plan
    "docs_corpus_ingest_nd",
    # composes bm25_search (q02c's whitelisted 3-scan shape); the
    # persisted-index variant (bm25_search_indexed) is the scale path
    "q02g_hybrid_rrf",
    # one-shot train+score certificate: the bigram/context/vocab count
    # subtrees each re-derive from the corpus in this single plan; at
    # scale the count tables are materialized once (like the persisted
    # token index) and scoring is the single vocabulary-keyed join
    "text_lm_score",
    # composes the tfidf seed-term extraction over bm25_search's
    # whitelisted shape; at scale both halves read the persisted
    # token index (tf/df/doclen/stats ARE the index tables)
    "q02k_more_like_this",
    # (r14: dedup_substring / dedup_substring_clean left this list —
    # the gh-window multiplicity rewrite reads the positioned-gram
    # stream once, so both are at <= 2 scans and the default cap
    # guards them)
    # 3 scans: corpus gram stream + the bench slice's gram set (a
    # filter of the same file standing in for the eval corpus — in
    # production a separate, MB-sized table) + the per-doc length
    # frame of the left join
    "dedup_contamination_spans",
    # composes text_lm_score's whitelisted one-shot LM plan into the
    # ingest-routing certificate; the streaming path scores against
    # the persisted model and persists the routed batch
    "docs_corpus_ingest_lm",
    # composes text_lm_score's whitelisted 3-scan one-shot LM plan,
    # plus the doc-lang join and the score join-back; the persisted-
    # model path (bigram_lm_score_indexed) is the scale form
    "text_ccnet_buckets",
    # text_lm_score's one-shot count-subtree shape with the corpus
    # split in two roles (train counts from even ids, scored stream =
    # odd ids) — 4 references to the one parquet file; the persisted
    # model (train_bigram_lm) is the scale form
    "text_lm_heldout",
    # composes bm25_search's whitelisted shape once for ALL query
    # terms (4 refs: tf feeds scoring + the per-term stats agg, dl
    # feeds the length norm + the corpus scalars); at scale tf/dl/
    # stats ARE the persisted token-index tables (bm25_search_indexed
    # form) and the plan is zero corpus scans
    "q02w_rank_eval",
}


def test_catalog_plan_sweep(spark, qs):
    """Every registered query's physical plan is screened for the
    anti-patterns that kill 100 TB runs: cartesian products, unintended
    nested-loop joins, and unbounded re-scans. The whitelists above are
    the deliberate exceptions; anything new fails here before it can
    regress silently."""
    import re
    from collections import Counter

    offenders = []
    for name, fn in qs.items():
        buf = io.StringIO()
        with redirect_stdout(buf):
            fn(spark, SF).explain("formatted")
        plan = buf.getvalue()
        if "CartesianProduct" in plan:
            offenders.append(f"{name}: CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in SCALAR_BROADCAST_OK:
            offenders.append(f"{name}: BroadcastNestedLoopJoin")
        scans = Counter(re.findall(r"(\w+)\.parquet", plan))
        worst = max(scans.values(), default=0)
        if worst > 2 and name not in MULTI_SCAN_OK:
            offenders.append(f"{name}: {worst} scans of one table")
    assert not offenders, "plan regressions: " + "; ".join(offenders)


def test_token_index_bucket_pruned(spark, qs):
    """The persisted token index must make term lookups bucket-pruned
    reads (SelectedBucketsCount << total) and reproduce the scan-time
    results exactly for both boolean and ranked search."""
    from pyspark.sql import functions as F

    from unified_log_aggregation_and_analytics_spark.operators import relational as R
    from unified_log_aggregation_and_analytics_spark.sources.batch import load_table

    spark.sql("DROP TABLE IF EXISTS tok_idx_plan_test")
    spark.sql("DROP TABLE IF EXISTS tok_idx_plan_test_doclen")
    spark.sql("DROP TABLE IF EXISTS tok_idx_plan_test_stats")
    docs = load_table(spark, "documents", SF)
    R.build_token_index_table(docs, "tok_idx_plan_test")
    try:
        # Engine sessions pin autoBucketedScan=false at build
        # (session.py) so the indexed read path never mutates session
        # state the user set — assert both the default and the
        # no-mutation contract around the call.
        key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
        assert spark.conf.get(key) == "false"
        postings = R.token_postings(spark, "tok_idx_plan_test", ["spark", "vector"])
        assert spark.conf.get(key) == "false"
        buf = io.StringIO()
        with redirect_stdout(buf):
            postings.explain("formatted")
        plan = buf.getvalue()
        assert "SelectedBucketsCount" in plan
        n_sel = int(plan.split("SelectedBucketsCount: ")[1].split(" out of")[0])
        assert n_sel <= 2  # two terms -> at most two buckets read

        indexed = R.token_index_table_search(
            spark, docs, "tok_idx_plan_test", ["spark", "vector"]
        )
        idx = R.build_token_index(docs)
        scan = R.token_index_search(docs, idx, ["spark", "vector"])
        assert sorted(r.doc_id for r in indexed.collect()) == sorted(
            r.doc_id for r in scan.collect()
        )

        ranked_idx = R.bm25_search_indexed(
            spark, "tok_idx_plan_test", ["merge", "spark", "vector"], k=10
        )
        ranked_scan = R.bm25_search(docs, ["merge", "spark", "vector"], k=10)
        assert ranked_idx.collect() == ranked_scan.collect()
    finally:
        spark.sql("DROP TABLE IF EXISTS tok_idx_plan_test")
        spark.sql("DROP TABLE IF EXISTS tok_idx_plan_test_doclen")
        spark.sql("DROP TABLE IF EXISTS tok_idx_plan_test_stats")


def test_bucketed_join_eliminates_shuffle(spark, tmp_path_factory):
    """Bucketing both join sides on the key pre-partitions data at
    write time: the join plans with NO Exchange on either side — the
    co-located-join strategy for repeated large-table joins at scale."""
    # default warehouse dir (spark.sql.warehouse.dir is static config);
    # tables are dropped in the finally block
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_cust")
    orders = spark.range(1000).selectExpr("id AS o_id", "id % 100 AS cust_id")
    cust = spark.range(100).selectExpr("id AS cust_id", "concat('c', id) AS name")
    orders.write.bucketBy(8, "cust_id").sortBy("cust_id").mode("overwrite").saveAsTable("b_orders")
    cust.write.bucketBy(8, "cust_id").sortBy("cust_id").mode("overwrite").saveAsTable("b_cust")
    try:
        # disable auto-broadcast so the join would otherwise shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(spark.table("b_cust"), "cust_id")
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing removed both shuffles
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_cust")


def test_write_range_sorted_layout_gives_disjoint_file_stats(spark, tmp_path):
    """The layout writer must produce files whose parquet min/max
    statistics are pairwise disjoint on the sort column — the property
    that lets a predicate skip whole files at scale."""
    import pyarrow.parquet as pq

    from unified_log_aggregation_and_analytics_spark.sources.batch import (
        load_table,
        write_range_sorted,
    )

    out = str(tmp_path / "orders_by_custkey")
    orders = load_table(spark, "orders", SF)
    write_range_sorted(orders, out, "o_custkey", n_ranges=4)

    ranges = []
    for f in sorted((tmp_path / "orders_by_custkey").glob("part-*.parquet")):
        md = pq.ParquetFile(str(f)).metadata
        idx = md.schema.names.index("o_custkey")
        los, his = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            los.append(st.min)
            his.append(st.max)
        ranges.append((min(los), max(his)))
    assert len(ranges) == 4
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next  # file key ranges never interleave

    # and a predicate on the sort column still reaches the scan
    import io as _io
    from contextlib import redirect_stdout as _rs

    from pyspark.sql import functions as F

    buf = _io.StringIO()
    with _rs(buf):
        spark.read.parquet(out).filter(F.col("o_custkey") < 100).explain("formatted")
    assert "PushedFilters: [IsNotNull(o_custkey), LessThan(o_custkey,100)]" in buf.getvalue()


def test_write_zordered_prunes_both_dimensions(spark, tmp_path):
    """Z-order certificate from the parquet footers: on a uniform
    (x, y) grid clustered into 16 files, a narrow predicate on EITHER
    column overlaps only a bounded fraction of files; the same data
    range-sorted on x alone leaves every file spanning y's full
    domain (no pruning on the second dimension)."""
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from unified_log_aggregation_and_analytics_spark.sources.batch import (
        write_range_sorted,
        write_zordered,
    )

    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"), (F.col("id") / 256).cast("long").alias("y")
    )

    def file_ranges(path, col):
        out = []
        for f in sorted(path.glob("part-*.parquet")):
            md = pq.ParquetFile(str(f)).metadata
            idx = md.schema.names.index(col)
            los, his = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                los.append(st.min)
                his.append(st.max)
            out.append((min(los), max(his)))
        return out

    def overlapping(ranges, lo, hi):
        return sum(1 for flo, fhi in ranges if fhi >= lo and flo <= hi)

    zpath = tmp_path / "zorder"
    write_zordered(grid, str(zpath), ["x", "y"], n_files=16)
    zx, zy = file_ranges(zpath, "x"), file_ranges(zpath, "y")
    assert len(zx) == 16
    # a 1/8-of-domain predicate on either dimension touches at most
    # half the files (the z-curve bound for 16 tiles is 4 of 16;
    # boundary effects allowed for)
    assert overlapping(zx, 0, 31) <= 8
    assert overlapping(zy, 0, 31) <= 8
    # correctness: layout changes bytes, never rows
    assert spark.read.parquet(str(zpath)).count() == 256 * 256

    rpath = tmp_path / "rsorted"
    write_range_sorted(grid, str(rpath), "x", n_ranges=16)
    ry = file_ranges(rpath, "y")
    # single-column sort: the unsorted dimension overlaps EVERY file
    assert overlapping(ry, 0, 31) == len(ry)


def test_bucketed_join_no_exchange(spark, qs):
    """The co-located bucketed join must plan with ZERO Exchange
    nodes once the broadcast shortcut is off (at fixture scale Spark
    rightly broadcasts the small side — the bucketing payoff is for
    two LARGE sides): bucketed scans satisfy the join's AND the
    downstream aggregation's required distribution, so nothing
    shuffles. The same query over plain parquet plans two shuffle
    exchanges — the contrast IS the certificate."""
    from unified_log_aggregation_and_analytics_spark.sources.batch import load_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, qs, "q11d_bucketed_join")
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan

        import pyspark.sql.functions as F

        o = load_table(spark, "orders", SF)
        c = load_table(spark, "customer", SF)
        unbucketed = (
            o.join(c, o["o_custkey"] == c["c_custkey"])
            .groupBy("c_custkey", "c_name")
            .agg(F.count(F.lit(1)).alias("n_orders"))
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            unbucketed.explain("formatted")
        unb = buf.getvalue()
        assert "Exchange" in unb and "hashpartitioning" in unb
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))


def test_tpch_completion_hints_constant_dims_only(spark, qs):
    """The eight queries completing the TPC-H suite may hint-broadcast
    only constant-size dims (nation 25 rows, region 5) — never
    supplier / customer / filtered part, which grow with SF. With
    auto-broadcast off, the surviving BroadcastHashJoins are exactly
    the hinted constant dims."""
    # Counts are physical-plan node counts: a hinted dim inside a
    # subtree that the query references twice (q2/q11 reuse their
    # aggregation input for a join-back) appears once per reference.
    expected = {
        "tpch_q2": 4,   # (nation + region into supplier) x 2 subtree refs
        "tpch_q8": 3,   # nation x2 roles + region
        "tpch_q9": 1,   # nation into supplier
        "tpch_q11": 2,  # nation filter into supplier, x 2 subtree refs
        "tpch_q15": 1,  # the 1-row scalar-max equality joins as a
                        # broadcast hash join — a 1-row build side
        "tpch_q16": 0,
        "tpch_q20": 1,  # nation semi-join
        "tpch_q21": 0,
    }
    import re

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    bad = []
    try:
        for name, want in expected.items():
            buf = io.StringIO()
            with redirect_stdout(buf):
                qs[name](spark, SF).explain("formatted")
            plan = buf.getvalue()
            got = len(re.findall(r"\(\d+\) BroadcastHashJoin", plan))
            if got != want:
                bad.append(f"{name}: {got} hinted broadcasts, want {want}")
            if "CartesianProduct" in plan:
                bad.append(f"{name}: CartesianProduct")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert not bad, "; ".join(bad)


def test_positional_index_bucket_pruned(spark):
    """Phrase resolution from the positional index must read only the
    phrase terms' buckets (one SelectedBucketsCount==1 scan per term),
    and equal the scan-time phrase count."""
    from unified_log_aggregation_and_analytics_spark.operators import relational as R
    from unified_log_aggregation_and_analytics_spark.sources.batch import load_table

    spark.sql("DROP TABLE IF EXISTS pos_idx_plan_test")
    docs = load_table(spark, "documents", SF)
    R.build_positional_index_table(docs, "pos_idx_plan_test")
    try:
        out = R.phrase_search_indexed(spark, docs, "pos_idx_plan_test", "fast table")
        buf = io.StringIO()
        with redirect_stdout(buf):
            out.explain("formatted")
        import re

        sels = [
            int(m)
            for m in re.findall(r"SelectedBucketsCount: (\d+) out of \d+", buf.getvalue())
        ]
        assert len(sels) == 2 and all(n == 1 for n in sels)  # one bucket per term
        scan = {
            (r.doc_id, r.n_matches)
            for r in R.phrase_search(docs, "fast table").collect()
        }
        idx = {(r.doc_id, r.n_matches) for r in out.collect()}
        assert idx == scan
    finally:
        spark.sql("DROP TABLE IF EXISTS pos_idx_plan_test")


def test_prefix_index_coarse_stage_reads_prefix_only(spark, tmp_path):
    """The dimension-split prefix index (r12) exists to cut coarse-
    stage scan IO: the stage-1 plan's ReadSchema must carry (vec_id,
    prefix) and NOT the rest column, and the full two-stage probe
    must equal the fused-column scan path bit-for-bit (index ≡
    scan)."""
    from pyspark.sql import functions as F

    from unified_log_aggregation_and_analytics_spark.functions.vectors import (
        cosine_similarity,
    )
    from unified_log_aggregation_and_analytics_spark.operators import ann_index as A
    from unified_log_aggregation_and_analytics_spark.operators.similarity import (
        knn_prefix_refine,
    )
    from unified_log_aggregation_and_analytics_spark.sources.batch import load_table

    emb = load_table(spark, "embeddings", SF).filter(F.col("vec_id") != 0)
    qv = [
        float(x)
        for x in load_table(spark, "embeddings", SF)
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .first()[0]
    ]
    path = str(tmp_path / "prefix16")
    A.build_prefix_index(emb, path, prefix_dim=16)

    # Rebuild exactly the coarse-stage frame the probe plans
    idx = A._index_rows(spark, path)
    q_pref = F.array(*[F.lit(float(x)) for x in qv[:16]])
    coarse = (
        idx.select(
            "vec_id",
            F.round(cosine_similarity(F.col("prefix"), q_pref, dim=16), 6).alias(
                "pref_sim"
            ),
        )
        .orderBy(F.col("pref_sim").desc(), "vec_id")
        .limit(50)
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        coarse.explain("formatted")
    read_schema = [
        l for l in buf.getvalue().splitlines() if "ReadSchema" in l
    ][0]
    assert "prefix" in read_schema and "vec_id" in read_schema
    assert "rest" not in read_schema, read_schema

    probe = A.prefix_refine_probe(spark, path, qv, k=10, shortlist=50)
    scan = knn_prefix_refine(emb, qv, k=10, prefix_dim=16, shortlist=50)
    assert probe.collect() == scan.collect()
