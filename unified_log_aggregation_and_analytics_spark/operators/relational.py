"""The relational/analytic operator surface (SURVEY.md §2.4, Q1-Q18).

The reference delegates all interactive analytics to OpenSearch
Dashboards' Discover UI — free-text search, field filters, time-range
restriction, date histograms, sort, top-N over per-source daily indices
(reference README.md:295-314). This module is that query surface,
re-expressed as composable DataFrame builders over the unified logs
table (schemas.UNIFIED_LOG) or any timestamped table.

Scale mapping (OpenSearch -> Spark, see SURVEY.md §3.3):
- daily-index selection  -> partition pruning on ``log_date``
- shard-local filtering  -> Parquet predicate pushdown
- coordinator top-K      -> TakeOrderedAndProject (orderBy + limit)
- shard partial aggs     -> partial+final hash aggregation

Everything here is built-in DataFrame ops — Catalyst handles pushdown,
pruning, and broadcast selection; no custom planning is needed (see
SURVEY.md §4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# --- Q1/Q2/Q3: filters, full-text search, time range -------------------


def build_token_index(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Q2 scale path — inverted token index: one (token, id) posting
    row per distinct case-folded token per document.

    This is the engine's answer to OpenSearch's inverted index
    (SURVEY.md §4 'the one genuinely non-built-in piece'): build once
    per ingest batch, store as a Parquet/Delta table bucketed or
    sorted by token so a term lookup is a pruned scan of one token's
    postings instead of a full-corpus text scan. Token search then
    becomes a semi-join (see ``token_index_search``); multi-term AND
    is an intersection of postings (groupBy id, count = n_terms).
    """
    return df.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))).alias("token"),
    ).filter(F.col("token") != "")


def token_index_search(
    df: DataFrame,
    index: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Q2 scale path — resolve an AND-of-terms query via the inverted
    index: postings for each term intersect (groupBy id, require all
    terms present), then semi-join back to the base table. Equivalent
    to the scan-based tokenized search (tests assert equality); at
    scale it reads |terms| posting lists instead of the whole corpus.
    """
    terms_lc = [t.lower() for t in terms]
    hits = (
        index.filter(F.col("token").isin(terms_lc))
        .groupBy(id_col)
        .agg(F.countDistinct("token").alias("_nt"))
        .filter(F.col("_nt") == len(terms_lc))
        .select(id_col)
    )
    return df.join(hits, id_col, "left_semi")


TOKEN_INDEX_BUCKETS = 64


def build_token_index_table(
    df: DataFrame,
    table_name: str,
    n_buckets: int = TOKEN_INDEX_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Q2 persisted index — materialize the inverted index as three
    tables so term lookups stop re-scanning the corpus:

    - ``<name>``: postings (token, id, tf), bucketed AND sorted by
      token — a term lookup reads hash(term)'s bucket files only
      (SelectedBucketsCount in the scan; plan-guarded in tests).
    - ``<name>_doclen``: per-document token counts (BM25 length norm).
    - ``<name>_stats``: one row (n_docs, avg_dl).

    Build is one explode + two hash aggs over the corpus — the same
    work one scan-time search did, now amortized over every query.
    The bucketed layout is also join-ready: postings-to-postings
    intersections co-locate without a shuffle. (Bucketed writes go
    through the session catalog; a production deployment points it at
    a real metastore, here it is per-session with the files under
    spark-warehouse/.)"""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    tf = toks.groupBy("token", id_col).agg(F.count(F.lit(1)).alias("tf"))
    (
        tf.write.bucketBy(n_buckets, "token")
        .sortBy("token")
        .mode("overwrite")
        .saveAsTable(table_name)
    )
    doclen = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    doclen.write.mode("overwrite").saveAsTable(f"{table_name}_doclen")
    (
        doclen.agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avg_dl"),
        )
        .write.mode("overwrite")
        .saveAsTable(f"{table_name}_stats")
    )


def append_token_index_table(
    df_new: DataFrame,
    table_name: str,
    n_buckets: int = TOKEN_INDEX_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Q2 incremental ingest — extend the persisted inverted index
    with a batch of NEW documents without rebuilding: the delta's
    (token, id, tf) postings append into the bucketed table (Spark
    validates the bucket spec matches, so hash(term) pruning keeps
    working across base + delta files), the delta's doclen rows
    append, and the 1-row stats table is recomputed FROM THE DOCLEN
    TABLE — an aggregate over |docs| counter rows, never a corpus
    rescan. Delta cost is one explode + two hash aggs over the new
    docs only; the daily-index-rotation contract of the reference
    (/root/reference/README.md:30) becomes "append today's postings,
    refresh the scalars".

    Caller contract: ``df_new`` holds documents whose ids are NOT in
    the base (re-ingesting an id would double its postings — upstream
    exact dedup is the guard, as in the streaming pipeline)."""
    toks = df_new.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    tf = toks.groupBy("token", id_col).agg(F.count(F.lit(1)).alias("tf"))
    (
        tf.write.bucketBy(n_buckets, "token")
        .sortBy("token")
        .mode("append")
        .saveAsTable(table_name)
    )
    spark = df_new.sparkSession
    doclen_delta = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    doclen_delta.write.mode("append").saveAsTable(f"{table_name}_doclen")
    (
        spark.table(f"{table_name}_doclen")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avg_dl"),
        )
        .write.mode("overwrite")
        .saveAsTable(f"{table_name}_stats")
    )


def _keep_bucketed_layout(spark) -> None:
    """Ensure autoBucketedScan is off so pure per-term FILTERS keep
    the bucketed layout and its hash(term) pruning (the planner only
    auto-enables the bucketed scan for joins/aggregations). The flag
    must hold at EXECUTION time of the returned lazy plan, so a
    set-then-restore around the read would undo itself before any
    action runs; the engine therefore pins it FALSE at session build
    (session.py get_spark) and this helper is an idempotent safety
    net for sessions built elsewhere — on an engine session it reads
    the already-false conf and changes nothing. Cost of the default:
    plain scans of bucketed tables lose the option of ignoring
    bucketing for extra parallelism — and the index tables this
    module builds are the engine's only bucketed tables, always read
    through pruned filters or bucket-colocated joins, where the
    layout only helps."""
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    if spark.conf.get(key, "true") != "false":
        spark.conf.set(key, "false")


def token_postings(spark, table_name: str, terms: list[str]) -> DataFrame:
    """Bucket-pruned posting-list read for a term set.

    Requires ``spark.sql.sources.bucketing.autoBucketedScan.enabled``
    false at execution time — an engine-session DEFAULT (session.py);
    _keep_bucketed_layout re-asserts it only on foreign sessions, so
    on an engine session this call leaves session state untouched."""
    _keep_bucketed_layout(spark)
    return spark.table(table_name).filter(F.col("token").isin([t.lower() for t in terms]))


def token_index_table_search(
    spark,
    df: DataFrame,
    table_name: str,
    terms: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """AND-of-terms search via the PERSISTED index: read |terms|
    posting lists (bucket-pruned), intersect, semi-join back. Same
    result as token_index_search/full_text_search; the corpus text is
    never touched."""
    terms_lc = sorted({t.lower() for t in terms})
    hits = (
        token_postings(spark, table_name, terms_lc)
        .groupBy(id_col)
        .agg(F.count_distinct("token").alias("_nt"))
        .filter(F.col("_nt") == len(terms_lc))
        .select(id_col)
    )
    return df.join(hits, id_col, "left_semi")


def bm25_search_indexed(
    spark,
    table_name: str,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 over the PERSISTED index: postings for the query terms are
    a bucket-pruned read; document frequency comes from those postings;
    corpus scalars from the 1-row stats table; the length norm joins
    the doclen table on the doc id. Identical scores to bm25_search
    (same formula, same rounding) with zero corpus scans at query
    time — the OpenSearch-parity query path."""
    postings = token_postings(spark, table_name, terms)
    stats = spark.table(f"{table_name}_stats")
    doclen = spark.table(f"{table_name}_doclen")
    return _bm25_score_frames(
        postings, doclen, stats, k=k, id_col=id_col, k1=k1, b=b
    )


def _bm25_score_frames(
    postings: DataFrame,
    doclen: DataFrame,
    stats: DataFrame,
    k: int,
    id_col: str,
    k1: float,
    b: float,
) -> DataFrame:
    """Shared BM25 scoring over (postings, doclen, stats) frames —
    the indexed path and the as-of (base + fenced delta) path differ
    only in where those frames come from."""
    dfreq = postings.groupBy("token").agg(F.count(F.lit(1)).alias("df_t"))
    idf = F.log(
        (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5) + 1.0
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * (F.col("dl") / F.col("avg_dl")))
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / denom
    return (
        postings.join(F.broadcast(dfreq), "token")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(k)
    )


def append_token_index_fenced(
    df_new: DataFrame,
    table_name: str,
    delta_path: str,
    batch_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Q2 streaming maintenance WITH per-batch lineage (r13, the ANN
    family's fenced-delta contract applied to the token index): the
    batch's (token, id, tf) postings and (id, dl) doclen rows land
    under ``_commit_batch=<id>`` partitions in a delta area NEXT TO
    the bucketed base tables, and ONE marker commits both — a torn
    batch is invisible, a checkpoint replay replaces its own torn
    output (streaming/fence.py). Unlike append_token_index_table
    (which folds rows into the base and so destroys lineage — a
    pinned probe over it cannot exclude later appends), deltas keep
    their batch identity, so bm25_search_indexed_asof can replay a
    training run's exact index: record the max committed id at run
    start, pass it as the pin forever after. The base tables and the
    persisted ``_stats`` row are untouched; as-of probes derive
    scalars from the visible doclen union (|docs| counter rows, never
    a corpus rescan)."""
    from unified_log_aggregation_and_analytics_spark.streaming import fence

    spark = df_new.sparkSession
    root = fence.fence_root(delta_path)
    bid = int(batch_id)
    if fence.is_committed(spark, root, bid):
        return
    toks = df_new.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    tf = toks.groupBy("token", id_col).agg(F.count(F.lit(1)).alias("tf"))
    fence.fenced_append(tf, f"{delta_path}/postings", bid)
    doclen = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    fence.fenced_append(doclen, f"{delta_path}/doclen", bid)
    fence.mark_committed(spark, root, bid)


def _token_merge_journal(delta_path: str) -> str:
    return f"{delta_path}/_merge_journal.json"


def _resolve_token_base(spark, table_name: str, delta_path: str) -> tuple[str, int]:
    """(physical base table, merged_through) for a fenced-delta token
    index: the merge journal — written atomically by
    merge_token_index_delta — names the current versioned base table
    and the max delta batch folded into it; absent journal means the
    original table with nothing merged (-1)."""
    import json
    import os

    p = _token_merge_journal(delta_path)
    if not os.path.exists(p):
        return table_name, -1
    with open(p) as f:
        j = json.load(f)
    return str(j["table"]), int(j["merged_through"])


def merge_token_index_delta(
    spark,
    table_name: str,
    delta_path: str,
    n_buckets: int = TOKEN_INDEX_BUCKETS,
    id_col: str = "doc_id",
) -> int:
    """Fold COMMITTED fenced delta batches into the bucketed base —
    the token-index analog of ann_index.merge_index_delta, adapted to
    managed tables (no directory to atomically swap): the merged
    postings/doclen/stats are written to a fresh VERSIONED table
    (``<name>__m<k>``), and one atomic journal replace
    (``_merge_journal.json`` under the delta path) flips both "this is
    the base" and "batches <= k are folded" together. Kill before the
    replace: the journal still names the old base, the half-built
    version is orphaned and overwritten by the next run — no state
    change observable. Kill after: folded delta files awaiting cleanup
    are already excluded by the journal (probes read deltas with id >
    merged_through only) — no double-count window. Delta commit
    MARKERS are never deleted (they are the streaming writer's replay
    short-circuit). Returns the number of batches folded. Offline
    maintenance, not against a live writer — the merge_index_delta
    contract. (Session-catalog caveat: versioned tables live in the
    in-memory catalog like every index table here; production points
    the session at a real metastore.)"""
    import json
    import os
    import tempfile

    from unified_log_aggregation_and_analytics_spark.streaming import fence

    phys, mt = _resolve_token_base(spark, table_name, delta_path)
    committed = fence.committed_batches(spark, fence.fence_root(delta_path))
    ids = [b for b in committed if b > mt]
    if not ids:
        return 0
    new_mt = max(ids)
    new = f"{table_name}__m{new_mt}"
    root = fence.fence_root(delta_path)
    post_delta = (
        fence.fenced_read(
            spark, f"{delta_path}/postings", root, keep_batch_col=True
        )
        .filter(F.col(fence.BATCH_COL).isin(ids))
        .drop(fence.BATCH_COL)
    )
    dl_delta = (
        fence.fenced_read(spark, f"{delta_path}/doclen", root, keep_batch_col=True)
        .filter(F.col(fence.BATCH_COL).isin(ids))
        .drop(fence.BATCH_COL)
    )
    merged_post = spark.table(phys).unionByName(
        post_delta.select("token", id_col, "tf")
    )
    (
        merged_post.write.bucketBy(n_buckets, "token")
        .sortBy("token")
        .mode("overwrite")
        .saveAsTable(new)
    )
    merged_dl = spark.table(f"{phys}_doclen").unionByName(
        dl_delta.select(id_col, "dl")
    )
    merged_dl.write.mode("overwrite").saveAsTable(f"{new}_doclen")
    (
        spark.table(f"{new}_doclen")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avg_dl"),
        )
        .write.mode("overwrite")
        .saveAsTable(f"{new}_stats")
    )
    # THE commit: one atomic journal replace flips base + horizon
    fd, tmp = tempfile.mkstemp(dir=delta_path, suffix=".journal")
    with os.fdopen(fd, "w") as f:
        json.dump({"table": new, "merged_through": new_mt}, f)
    os.replace(tmp, _token_merge_journal(delta_path))
    # lazy cleanup: the superseded version (never the original
    # table_name — a fresh session's rebuild probe may look for it)
    if phys != table_name:
        for s in ("", "_doclen", "_stats"):
            spark.sql(f"DROP TABLE IF EXISTS {phys}{s}")
    return len(ids)


def bm25_search_indexed_asof(
    spark,
    table_name: str,
    delta_path: str,
    terms: list[str],
    k: int = 10,
    as_of_batch: int | None = None,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 over the base index PLUS committed fenced deltas — pinned
    to ``as_of_batch`` when given (fence.fenced_read's time-travel
    contract: only delta batches with id <= the pin are visible, so a
    training corpus probe reproduces exactly regardless of later
    streaming appends; a pin older than a compaction horizon raises
    loudly). Base postings stay bucket-pruned; the delta side prunes
    on the committed-batch partition filter plus the term predicate.
    Corpus scalars come from the visible doclen union — one aggregate
    over 2-column counter rows, the append_token_index_table cost
    model. After a merge (merge_token_index_delta) the journal names
    the current base and its horizon: folded batches are excluded
    from the delta union even while their files await cleanup, and a
    pin OLDER than the horizon raises (per-batch lineage is gone —
    the fence-compaction rule)."""
    from unified_log_aggregation_and_analytics_spark.streaming import fence

    phys, mt = _resolve_token_base(spark, table_name, delta_path)
    if as_of_batch is not None and as_of_batch < mt:
        raise ValueError(
            f"as_of_batch={as_of_batch} predates the merge horizon "
            f"{mt} of {table_name!r}: those batches were folded into "
            "the base and their per-batch lineage is gone"
        )
    root = fence.fence_root(delta_path)
    terms_lc = sorted({t.lower() for t in terms})
    postings = token_postings(spark, phys, terms_lc)
    doclen = spark.table(f"{phys}_doclen")
    pd_ = fence.fenced_read(
        spark,
        f"{delta_path}/postings",
        root,
        keep_batch_col=True,
        as_of_batch=as_of_batch,
    )
    if pd_ is not None:
        pd_ = pd_.filter(F.col(fence.BATCH_COL) > mt)
        postings = postings.unionByName(
            pd_.filter(F.col("token").isin(terms_lc)).select(
                "token", id_col, "tf"
            )
        )
        dd = fence.fenced_read(
            spark,
            f"{delta_path}/doclen",
            root,
            keep_batch_col=True,
            as_of_batch=as_of_batch,
        )
        if dd is not None:
            doclen = doclen.unionByName(
                dd.filter(F.col(fence.BATCH_COL) > mt).select(id_col, "dl")
            )
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avg_dl"),
    )
    return _bm25_score_frames(
        postings, doclen, stats, k=k, id_col=id_col, k1=k1, b=b
    )


def bm25_search(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Q2 ranked path — BM25 relevance over whitespace tokens: the
    engine's answer to Discover's *ranked* hits (the reference
    delegates scoring to OpenSearch's Okapi BM25; same formula here,
    Lucene-flavored idf = ln(1 + (N - df + 0.5)/(df + 0.5))).

    Plan shape at scale: document length is a MAP-ONLY expression
    (size of the non-empty token split — no explode, no shuffle), so
    the only token-granularity work is the tf aggregation, filtered to
    the query terms BEFORE its shuffle. Document frequency per term
    and the corpus (N, avg_dl) scalars broadcast; scoring joins the
    query-term postings back to per-doc lengths on the doc id and the
    top-k is TakeOrderedAndProject. With a persisted token index
    (build_token_index_table) even that one corpus pass disappears —
    see bm25_search_indexed.

    Scores are rounded to 6 decimals with id tie-break (cross-engine
    float determinism; sum order differences live below round-6)."""
    terms_lc = sorted({t.lower() for t in terms})
    token_arr = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    doclen = df.select(F.col(id_col), F.size(token_arr).alias("dl")).filter(
        F.col("dl") > 0
    )
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avg_dl"),
    )
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"),
    )
    tf = (
        toks.filter(F.col("token").isin(terms_lc))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_t"))
    idf = F.log(
        (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5) + 1.0
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * (F.col("dl") / F.col("avg_dl")))
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / denom
    return (
        tf.join(F.broadcast(dfreq), "token")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(k)
    )


def rrf_hybrid_search(
    docs: DataFrame,
    emb: DataFrame,
    terms: list[str],
    query_vec: list[float],
    k: int = 10,
    n_candidates: int = 50,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Q2/X3 — HYBRID retrieval: fuse the lexical (BM25) and semantic
    (cosine kNN) rankings by reciprocal-rank fusion,
    ``score(d) = Σ_lists 1/(rrf_k + rank_list(d))`` (Cormack et al.,
    SIGIR'09) — the standard answer to "OpenSearch keyword search OR
    vector store, why not both". A document missing from one list
    contributes nothing for it.

    Plan shape at scale: each retriever runs its own scale path
    (BM25's term-filtered aggregation / the broadcast-query kNN scan
    or an ANN index probe) and emits a TOP-``n_candidates`` list —
    the fusion below operates on ≤ 2·n_candidates rows BY
    CONSTRUCTION, so its single-task ranking windows and full-outer
    join are k-sized plan nodes, not corpus-scale hazards. Ranks use
    (score DESC, id) total order and the fused score is rounded to 6
    decimals — deterministic and engine-portable."""
    from unified_log_aggregation_and_analytics_spark.operators.similarity import (
        knn_brute_force,
    )

    lexical = bm25_search(docs, terms, k=n_candidates, id_col=id_col)
    semantic = knn_brute_force(emb, query_vec, k=n_candidates, id_col=vec_id_col)
    # The constant partition key is honest: both inputs are LIMITed
    # candidate lists, so one task ranks ≤ n_candidates rows. It is
    # written as pmod(id, 1) — constantly 0 but NOT foldable — because
    # Catalyst erases a literal partition key and WindowExec then
    # logs the "No Partition Defined" warning on every run even
    # though the frame is k-sized by construction.
    wl = Window.partitionBy(F.pmod(F.col(id_col), F.lit(1))).orderBy(
        F.col("bm25").desc(), F.col(id_col)
    )
    ws = Window.partitionBy(F.pmod(F.col(vec_id_col), F.lit(1))).orderBy(
        F.col("cos_sim").desc(), F.col(vec_id_col)
    )
    lex = lexical.select(
        F.col(id_col), F.row_number().over(wl).cast("long").alias("lex_rank")
    )
    sem = semantic.select(
        F.col(vec_id_col).alias(id_col),
        F.row_number().over(ws).cast("long").alias("sem_rank"),
    )
    fused = lex.join(sem, id_col, "full_outer").select(
        F.col(id_col),
        F.round(
            F.coalesce(F.lit(1.0) / (rrf_k + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (rrf_k + F.col("sem_rank")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
        "lex_rank",
        "sem_rank",
    )
    return fused.orderBy(F.col("rrf_score").desc(), F.col(id_col)).limit(k)


def full_text_search(
    df: DataFrame, term: str, text_col: str = "message", tokenized: bool = False
) -> DataFrame:
    """Q2 — Discover's search box. Substring match by default; token
    match (whitespace tokenization, case-folded) when ``tokenized``.

    Scale note: this is a scan+filter, not an inverted-index lookup —
    the one OpenSearch capability Spark re-expresses as brute force
    (SURVEY.md §4). Bounded by Parquet scan throughput; combine with
    ``time_range`` so partition pruning shrinks the scan first.
    """
    col = F.lower(F.col(text_col))
    if tokenized:
        return df.filter(F.array_contains(F.split(col, r"\s+"), term.lower()))
    return df.filter(col.contains(term.lower()))


def time_range(df: DataFrame, start: str, end: str, ts_col: str = "ts") -> DataFrame:
    """Q3 — Discover's time picker. ``[start, end)`` on event time.

    With a ``log_date`` partition column derived from ``ts``, Catalyst
    turns this into partition pruning — the daily-index selection of
    the reference (README.md:30,304)."""
    return df.filter((F.col(ts_col) >= F.lit(start)) & (F.col(ts_col) < F.lit(end)))


# --- Q8: date histogram -------------------------------------------------


def date_histogram(
    df: DataFrame,
    bucket: str = "hour",
    ts_col: str = "ts",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Q8 — Discover's date histogram: event count per time bucket
    (optionally sub-grouped). Map-side partial aggregation makes this a
    single light shuffle at any scale."""
    keys = [F.date_trunc(bucket, F.col(ts_col)).alias("bucket"), *group_cols]
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))


def sliding_histogram(
    df: DataFrame, window_len: str, slide: str, ts_col: str = "ts"
) -> DataFrame:
    """ST4 batch form — sliding-window counts (moving error rate etc.).
    ``F.window`` assigns each row to window_len/slide buckets; the same
    expression runs unchanged under Structured Streaming."""
    return (
        df.groupBy(F.window(F.col(ts_col), window_len, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), "n")
    )


# --- Q9/Q10: sort and top-K --------------------------------------------


def top_k(
    df: DataFrame, k: int, order_by: Sequence[Column], group_cols: Sequence[str] = ()
) -> DataFrame:
    """Q10 — top-N terms (top URLs, top error producers...).

    Global top-K compiles to TakeOrderedAndProject: each task keeps a
    K-row heap, the driver merges — no full sort, no full shuffle.
    Callers must pass a total order (tie-break on a unique key) for
    deterministic results."""
    if group_cols:
        agg = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))
        return agg.orderBy(F.col("n").desc(), *[F.col(c) for c in group_cols]).limit(k)
    return df.orderBy(*order_by).limit(k)


def collapse_hits(
    df: DataFrame,
    collapse_col: str,
    order_by: Sequence[Column],
    page_size: int,
    inner_hits: int = 1,
) -> DataFrame:
    """Q9/Q10 — OpenSearch field collapsing (``collapse`` +
    ``inner_hits``): the result page shows the top ``page_size``
    GROUPS (one per distinct ``collapse_col``, ranked by each group's
    best hit under ``order_by``), and for each group up to
    ``inner_hits`` of its own best hits, tagged ``hit_rank`` 1..n —
    the "best order per customer / latest log per host" dedup view
    (reference README.md:295-314 Dashboards discover surface).

    Plan shape: ONE window rank over the collapse key (collapse keys
    are high-cardinality by design — a user/host/session id — so the
    per-key partitions stay small; for few-valued bucket columns use
    grouped_top_hits' salted two-phase instead), a rank<=inner_hits
    filter that prunes BEFORE anything else, a page_size group pick
    that compiles to TakeOrderedAndProject over the rank-1 rows only,
    and a broadcast semi-join of the picked keys back onto the pruned
    hits — the full table is scanned once and shuffled once.
    ``order_by`` must be a total order (tie-break on a unique key)."""
    w = Window.partitionBy(collapse_col).orderBy(*order_by)
    ranked = df.withColumn("hit_rank", F.row_number().over(w).cast("long")).filter(
        F.col("hit_rank") <= inner_hits
    )
    top_groups = (
        ranked.filter(F.col("hit_rank") == 1)
        .orderBy(*order_by)
        .limit(page_size)
        .select(collapse_col)
    )
    return ranked.join(F.broadcast(top_groups), collapse_col, "semi")


def grouped_top_hits(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    salt_col: str,
    n_salt: int = 32,
) -> DataFrame:
    """Q6/Q10 — the OpenSearch ``top_hits`` sub-aggregation: inside
    each bucket of a terms aggregation, the top ``k`` DOCUMENTS under
    ``order_by`` (latest error per event type, sample docs per
    category...), tagged ``hit_rank`` 1..k.

    A naive window over the bucket column is the 100 TB trap: terms
    buckets are FEW (event types, log levels), so one reducer would
    sort an entire bucket's rows. Two-phase salted rank instead:
    phase 1 ranks within (bucket, xxhash64(salt_col) mod n_salt) —
    n_salt-way parallel, each cell keeps <= k rows, and every true
    top-k row survives because its local rank can only be <= its
    global rank; phase 2 re-ranks the <= k*n_salt survivors per
    bucket — driver-trivial. ``order_by`` must be a total order and
    ``salt_col`` any stable column (uniqueness not required — the
    salt only spreads rows). Same shape works streaming-side per
    micro-batch."""
    cells = [*group_cols, F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salt))]
    w1 = Window.partitionBy(*cells).orderBy(*order_by)
    local = (
        df.withColumn("_rk", F.row_number().over(w1))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_by)
    return local.withColumn("hit_rank", F.row_number().over(w2).cast("long")).filter(
        F.col("hit_rank") <= k
    )


# --- Q13: as-of (temporal) join ----------------------------------------


def asof_last_event(
    df: DataFrame,
    match_type: str,
    target_type: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Q13 — for each ``target_type`` row, the most recent
    ``match_type`` row with ``ts <= target.ts`` for the same key
    (e.g. nearest preceding platform event for a function log,
    reference README.md:95-147 interleaving).

    Spark-first design: instead of a non-equi range join (O(n*m) per
    key), union both event sets and run ``last(..., ignoreNulls)`` over
    a key-partitioned, time-ordered window — one shuffle on the key,
    linear scan per partition. At equal timestamps the match row sorts
    first (is_match desc), matching ``<=`` semantics.
    """
    base = df.filter(F.col(type_col).isin(match_type, target_type))
    is_match = (F.col(type_col) == match_type).cast("int")
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), is_match.desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = base.withColumn(
        "last_match_ts",
        F.last(F.when(F.col(type_col) == match_type, F.col(ts_col)), ignorenulls=True).over(w),
    )
    return matched.filter(F.col(type_col) == target_type)


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    lookback: int = 3600,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Q13 — range (interval) join without a nested-loop plan: match
    every right row with ``right_ts`` in ``[left_ts - lookback,
    left_ts]`` (lookback in seconds) for the same key.

    A naive non-equi join plans as BroadcastNestedLoopJoin — quadratic
    per key and a non-starter at scale. Binning makes it an equi-join:
    each left row probes the time bins its window overlaps (explode of
    ceil(lookback/bin)+1 bin ids), the right side is keyed by its own
    bin, and the exact range predicate filters the bin-collisions.
    Shuffle is keyed on (key, bin) — bounded fan-out, AQE-splittable,
    and the bin width tunes the fan-out/selectivity trade-off.
    """
    lb = F.expr(f"INTERVAL {lookback} seconds")
    lsec = F.unix_timestamp(F.col(left_ts))
    rsec = F.unix_timestamp(F.col(right_ts))
    # bins are second-granular but always COVER the exact window
    # (floor of the truncated start <= floor of the true start); the
    # exact timestamp predicate below removes bin-edge false positives
    probe_bins = F.sequence(
        F.floor((lsec - F.lit(lookback)) / bin_seconds),
        F.floor(lsec / bin_seconds),
    )
    l = left.withColumn("_bin", F.explode(probe_bins))
    r = right.withColumn("_bin", F.floor(rsec / bin_seconds))
    cond = (
        (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
        & (F.col("l._bin") == F.col("r._bin"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - lb)
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
    )
    return l.alias("l").join(r.alias("r"), cond)


def range_lookup_binned(
    points: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_size: int = 1024,
    broadcast_ranges: bool = True,
) -> DataFrame:
    """Point-in-range lookup (the CIDR / geo-IP enrichment shape,
    reference README.md:47's client IPs + the geoip processor
    OpenSearch ships): match each point row whose ``value_col`` falls
    in a range's ``[lo, hi]``. A naive BETWEEN join plans as
    BroadcastNestedLoopJoin — every point probing every range. Binning
    makes it an equi-join: each RANGE replicates to the bins it
    overlaps (explode of sequence(lo div B, hi div B) — bounded by
    range width / B), each point keys to its single bin, the exact
    BETWEEN filters bin collisions. At 100 TB the points side is
    map-only when the range table broadcasts (the normal geo case:
    ranges are KBs–MBs); set ``broadcast_ranges=False`` for a huge
    range side and the join shuffles on the bin key instead."""
    b = F.lit(int(bin_size))
    exp = ranges.withColumn(
        "_bin", F.explode(F.sequence(F.floor(F.col(lo_col) / b), F.floor(F.col(hi_col) / b)))
    )
    if broadcast_ranges:
        exp = F.broadcast(exp)
    pts = points.withColumn("_bin", F.floor(F.col(value_col) / b))
    return (
        pts.alias("p")
        .join(
            exp.alias("g"),
            (F.col("p._bin") == F.col("g._bin"))
            & (F.col(f"p.{value_col}") >= F.col(f"g.{lo_col}"))
            & (F.col(f"p.{value_col}") <= F.col(f"g.{hi_col}")),
        )
        .drop("_bin")
    )


# --- Q14/ST5 precursor: sessionization ---------------------------------


def sessionize(
    df: DataFrame, gap: str = "30 minutes", key_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Assign session ids: a new session starts when the gap since the
    key's previous event exceeds ``gap`` (batch analog of
    ``session_window``, ST5). One shuffle on the key; running sum of
    session-start flags is a linear per-partition scan."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    gap_expr = F.expr(f"INTERVAL {gap}")
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_session = (
        F.when(prev_ts.isNull() | (F.col(ts_col) > prev_ts + gap_expr), 1).otherwise(0)
    )
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


# --- Q16/Q18: multi-dimensional slicing --------------------------------


def rollup_counts(df: DataFrame, *dims: Column | str) -> DataFrame:
    """Q16 — subtotal hierarchy over dimensions (source x date x level
    dashboard slicing)."""
    return df.rollup(*dims).agg(F.count(F.lit(1)).alias("n"))


def pivot_counts(df: DataFrame, row_dim: Column | str, pivot_col: str, values: Sequence[str]) -> DataFrame:
    """Q18 — cross-tab (sources x levels matrix). Passing explicit
    ``values`` avoids the extra distinct-collection job and keeps the
    plan static — required practice at 100 TB."""
    out = df.groupBy(row_dim).pivot(pivot_col, list(values)).count()
    # Discover-style cross-tabs show 0, not null, for empty cells.
    return out.select(
        out.columns[0], *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in out.columns[1:]]
    )


# --- Q17: exact dedup ---------------------------------------------------


def dedup_certificate(df: DataFrame, *key_cols: str, id_col: str) -> DataFrame:
    """Q17/X1 — deterministic exact dedup: one row per duplicate-group
    key with the kept (minimum) id and the duplicate count. Using
    min(id) rather than dropDuplicates' arbitrary-row pick makes the
    result reproducible across retries and engines — required for an
    at-least-once upstream (reference utils.ts:42,57-59)."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


def build_bucketed_join_tables(
    spark: SparkSession,
    orders: DataFrame,
    customer: DataFrame,
    prefix: str,
    n_buckets: int = 8,
) -> tuple[str, str]:
    """Q11 scale path — CO-LOCATED join layout: persist both join
    sides bucketed (and sorted) on the join key with the same bucket
    count, so every future orders-customer join on that key is
    shuffle-free: matching buckets are read task-aligned and the plan
    contains NO Exchange on either side (plan-guarded in
    tests/test_plans.py). At 100 TB this converts the recurring join's
    two corpus-wide shuffles into zero — the bucketing cost is paid
    once at layout time, the same trade as the persisted token/ANN
    indexes. Sorting within buckets additionally removes the join's
    Sort nodes (SortMergeJoin reads pre-sorted runs)."""
    o_name, c_name = f"{prefix}_orders", f"{prefix}_customer"
    (
        orders.write.bucketBy(n_buckets, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .saveAsTable(o_name)
    )
    (
        customer.write.bucketBy(n_buckets, "c_custkey")
        .sortBy("c_custkey")
        .mode("overwrite")
        .saveAsTable(c_name)
    )
    return o_name, c_name


def bucketed_join(spark: SparkSession, o_name: str, c_name: str) -> DataFrame:
    """The shuffle-free join over build_bucketed_join_tables output:
    customer spend rollup without a single Exchange."""
    o = spark.table(o_name)
    c = spark.table(c_name)
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spend"),
        )
    )


def fuzzy_search(
    df: DataFrame,
    term: str,
    max_edits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Q2 — fuzzy term match, the OpenSearch ``fuzziness`` query the
    reference's Discover box exposes: every document containing a
    token within ``max_edits`` Levenshtein distance of ``term``, one
    row per (document, matched token) with the distance.

    Plan shape: VOCABULARY-FIRST. The per-doc distinct tokens explode
    once, the distinct-term dictionary is aggregated from them
    (vocab-bounded, shuffles ~|vocab| rows), Levenshtein runs once
    per DICTIONARY TERM — never once per token occurrence — and the
    surviving fuzzy terms (a handful) broadcast-join back onto the
    exploded corpus. That is the same work split OpenSearch makes
    (its fuzzy automaton walks the term dictionary, then hits
    postings): corpus cost stays one scan + one explode regardless of
    the edit radius, and the O(|vocab| * |term|^2) distance work is
    independent of corpus size."""
    toks = (
        df.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
            ).alias("token"),
        )
    )
    vocab = toks.select("token").distinct()
    matched = vocab.select(
        "token", F.levenshtein(F.col("token"), F.lit(term.lower())).alias("dist")
    ).filter(F.col("dist") <= max_edits)
    return toks.join(F.broadcast(matched), "token").select(id_col, "token", "dist")


def phrase_search(
    df: DataFrame,
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Q2 — match_phrase: documents containing the query tokens as a
    CONSECUTIVE sequence (OpenSearch's positional phrase query), with
    the occurrence count. ``full_text_search`` substring matching
    can't distinguish token adjacency from substring accidents; this
    checks real token positions.

    Plan shape: zero shuffle. The n-gram stream of each row is built
    and filtered per-row with array expressions fused into the scan
    stage — phrase matching costs one corpus scan exactly, like any
    predicate filter, and composes with partition pruning/pushdown.
    The indexed upgrade path is positional postings (token, id, pos)
    with an (id, pos+k) chain join — the OpenSearch layout — worth it
    only once query volume amortizes the index build.
    """
    terms = [t for t in phrase.lower().split() if t]
    n = len(terms)
    if n == 0:
        raise ValueError("empty phrase")
    from unified_log_aggregation_and_analytics_spark.operators.dedup import token_ngrams

    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    grams = token_ngrams(toks, n)
    target = " ".join(terms)
    n_matches = F.size(F.filter(grams, lambda g: g == F.lit(target)))
    return df.withColumn("n_matches", n_matches).filter(F.col("n_matches") > 0)


def phrase_prefix_search(
    df: DataFrame,
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Q2 — OpenSearch match_phrase_prefix ('search-as-you-type'): the
    query's leading tokens must match CONSECUTIVELY and its last token
    as a PREFIX of the document token in the next position. Same
    zero-shuffle shape as phrase_search — the n-gram stream is built
    and prefix-filtered per row with array expressions fused into the
    scan ('w1 w2pre' matches gram 'w1 w2prefix...' via startswith:
    every interior token is followed by a space in the gram string,
    so the prefix test pins tokens 1..n-1 exactly and token n's
    prefix)."""
    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("empty phrase")
    from unified_log_aggregation_and_analytics_spark.operators.dedup import (
        token_ngrams,
    )

    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    grams = token_ngrams(toks, len(terms))
    target = " ".join(terms)
    n_matches = F.size(F.filter(grams, lambda g: g.startswith(target)))
    return df.withColumn("n_matches", n_matches).filter(F.col("n_matches") > 0)


def adjacency_matrix(df: DataFrame, filters: dict[str, Column]) -> DataFrame:
    """Q6 — the OpenSearch adjacency_matrix aggregation: named filters
    become buckets for each filter AND each pairwise intersection (key
    'a&b', the OpenSearch key convention), emitting only non-empty
    buckets. ONE aggregate pass computes every bucket as a sum of
    indicator products (no per-bucket scans, no shuffle beyond the
    single partial+final agg — at 100 TB this is the difference
    between one pass and |filters|^2 passes); the row unpivots via
    ``stack``. Keys sort ascending for determinism. Filter names feed
    the stack() expression and the '&' pair-key convention, so names
    carrying a quote (expression injection) or '&' (ambiguous with a
    real intersection key) are rejected up front."""
    for n in filters:
        if "'" in n or "&" in n:
            raise ValueError(
                f"adjacency_matrix filter name {n!r} may not contain "
                "a single quote or '&' (reserved for pair keys)"
            )
    names = sorted(filters)
    aggs, keys = [], []
    for i, a in enumerate(names):
        keys.append(a)
        aggs.append(F.sum(filters[a].cast("long")).alias(f"k{len(keys) - 1}"))
        for b in names[i + 1 :]:
            keys.append(f"{a}&{b}")
            aggs.append(
                F.sum((filters[a] & filters[b]).cast("long")).alias(
                    f"k{len(keys) - 1}"
                )
            )
    row = df.agg(*aggs)
    stack_args = ", ".join(f"'{k}', k{i}" for i, k in enumerate(keys))
    return (
        row.selectExpr(f"stack({len(keys)}, {stack_args}) AS (key, doc_count)")
        .filter(F.col("doc_count") > 0)
        .orderBy("key")
    )


def rank_eval(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    min_tf: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Q2 — the OpenSearch _rank_eval API: search-quality metrics for
    a set of rated single-term queries. Judgments are DERIVED, not
    hand-labeled: a document is relevant to a term iff the term
    occurs >= ``min_tf`` times — deterministic, computable by any
    engine, and independent of the ranking function being graded
    (tf>=2 is a different statistic than BM25's saturated tf x idf x
    length-norm, so the metrics are a real comparison, not 1.0 by
    construction). Per query: precision@k, MRR (first relevant hit),
    and NDCG@k with binary gains against the ideal ranking of
    min(R, k) relevant docs. Each query's ranked list is the engine's
    own BM25 top-k (rounded scores, id tie-break), so the metrics
    replay exactly in SQL.

    Plan shape — ALL terms in one plan, not a per-term loop: one
    corpus pass builds per-(doc, term) tf (explode filtered to the
    query terms BEFORE its shuffle, the bm25_search discipline), one
    map-only pass builds doc lengths; scoring joins tf to the
    broadcast per-term document frequencies and the 1-row corpus
    scalars, per-term ranking is a token-partitioned window over the
    scored postings, and every metric — including the ideal-DCG
    normalizer, an in-plan fold over sequence(1, min(R, k)) — is
    k-row arithmetic per term. Two corpus scans total, independent
    of |terms|."""
    terms_lc = [t.lower() for t in terms]
    toks_arr = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    dl = df.select(F.col(id_col), F.size(toks_arr).alias("dl")).filter(
        F.col("dl") > 0
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avg_dl"),
    )
    tf = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"),
        )
        .filter(F.col("token").isin(terms_lc))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    rel_flag = (F.col("tf") >= min_tf).cast("int")
    # ONE per-term aggregate carries both the ranking input (df_t) and
    # the judgment total (n_relevant) — two stats, one pass over tf
    term_stats = tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("df_t"),
        F.sum(rel_flag).cast("long").alias("n_relevant"),
    )
    k1, b = 1.2, 0.75
    idf = F.log(
        (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5) + 1.0
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * (F.col("dl") / F.col("avg_dl")))
    scored = (
        tf.join(F.broadcast(term_stats.select("token", "df_t")), "token")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            "token",
            F.col(id_col),
            F.col("tf"),
            F.round(idf * (F.col("tf") * (k1 + 1.0)) / denom, 6).alias("bm25"),
        )
    )
    w = Window.partitionBy("token").orderBy(F.col("bm25").desc(), F.col(id_col))
    ranked = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    idcg = F.when(
        F.least(F.col("n_relevant"), F.lit(k)) >= 1,
        F.aggregate(
            F.sequence(
                F.lit(1), F.least(F.col("n_relevant"), F.lit(k)).cast("int")
            ),
            F.lit(0.0),
            lambda acc, i: acc + 1.0 / F.log2(i.cast("double") + 1.0),
        ),
    ).otherwise(F.lit(0.0))
    metrics = (
        ranked.withColumn("rel", rel_flag)
        .groupBy("token")
        .agg(
            F.round(F.sum("rel") / F.lit(float(k)), 6).alias(f"precision_at_{k}"),
            F.round(
                F.coalesce(
                    F.max(F.when(F.col("rel") == 1, 1.0 / F.col("rank"))),
                    F.lit(0.0),
                ),
                6,
            ).alias("mrr"),
            F.sum(F.col("rel") / F.log2(F.col("rank") + 1)).alias("_dcg"),
        )
        .join(
            F.broadcast(
                term_stats.select("token", "n_relevant").withColumn("_idcg", idcg)
            ),
            "token",
        )
    )
    # A term matching ZERO documents still gets a metrics row (the
    # OpenSearch _rank_eval contract: absent queries score 0, they
    # don't vanish) — left-join the metrics onto the literal term
    # list and zero-fill. |terms| rows, driver-literal, broadcast.
    terms_df = df.sparkSession.createDataFrame(
        [(t,) for t in sorted(set(terms_lc))], schema="token string"
    )
    return (
        terms_df.join(F.broadcast(metrics), "token", "left")
        .select(
            F.col("token").alias("query_term"),
            F.coalesce(F.col("n_relevant"), F.lit(0).cast("long")).alias(
                "n_relevant"
            ),
            F.coalesce(f"precision_at_{k}", F.lit(0.0)).alias(
                f"precision_at_{k}"
            ),
            F.coalesce("mrr", F.lit(0.0)).alias("mrr"),
            F.coalesce(
                F.round(
                    F.col("_dcg")
                    / F.when(F.col("_idcg") > 0, F.col("_idcg")).otherwise(
                        F.lit(1.0)
                    ),
                    6,
                ),
                F.lit(0.0),
            ).alias(f"ndcg_at_{k}"),
        )
        .orderBy("query_term")
    )


def build_positional_index_table(
    df: DataFrame,
    table_name: str,
    n_buckets: int = TOKEN_INDEX_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Q2 persisted POSITIONAL index — the OpenSearch posting layout
    that makes phrase queries index-resolvable: one row per (token,
    doc) carrying the SORTED array of token positions, bucketed and
    sorted by token like the tf index (hash(term) bucket pruning,
    SelectedBucketsCount). Build cost is one posexplode + one
    grouped collect over the corpus; storage is the token stream
    re-grouped, same order of magnitude as the tf index plus the
    position ints."""
    pos = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("pos", "token"),
    ).filter(F.col("token") != "")
    postings = pos.groupBy("token", id_col).agg(
        F.sort_array(F.collect_list("pos")).alias("positions")
    )
    (
        postings.write.bucketBy(n_buckets, "token")
        .sortBy("token")
        .mode("overwrite")
        .saveAsTable(table_name)
    )


def phrase_search_indexed(
    spark: SparkSession,
    docs: DataFrame,
    table_name: str,
    phrase: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Q2 — indexed match_phrase: resolve a consecutive-token phrase
    from the positional index WITHOUT scanning the corpus. Each query
    term reads only its posting bucket (pruned scan); the n posting
    frames equi-join on the doc id (each is one term's postings —
    corpus-frequency-bounded, never corpus-sized); the position
    arrays then intersect per row: an occurrence is a position p of
    term 0 with p+i present in term i's array for every i — a per-row
    array expression, no further shuffle. Equals the scan-time
    ``phrase_search`` count (they share an oracle), at the cost of
    |phrase| posting-list reads instead of a corpus scan.

    Requires the engine-session autoBucketedScan=false default (same
    contract and rationale as token_postings)."""
    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("empty phrase")
    # without this every term reads all 64 buckets instead of
    # hash(term)'s one (plan-guarded in tests); see the helper for
    # why the switch is session-level
    _keep_bucketed_layout(spark)
    postings = spark.table(table_name)
    cur = (
        postings.filter(F.col("token") == terms[0])
        .select(F.col(id_col), F.col("positions").alias("_p0"))
    )
    for i, t in enumerate(terms[1:], 1):
        nxt = postings.filter(F.col("token") == t).select(
            F.col(id_col), F.col("positions").alias(f"_p{i}")
        )
        cur = cur.join(nxt, id_col)
    match = F.col("_p0")

    def _chain(i: int):
        # closure factory: F.filter inspects lambda arity, so a
        # default-arg second parameter would bind the ARRAY INDEX
        return lambda p: F.array_contains(F.col(f"_p{i}"), p + i)

    for i in range(1, len(terms)):
        match = F.filter(match, _chain(i))
    hits = cur.select(F.col(id_col), F.size(match).alias("n_matches")).filter(
        F.col("n_matches") > 0
    )
    return docs.join(hits, id_col)


def significant_terms(
    df: DataFrame,
    foreground: Column,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Q6/Q10 — the OpenSearch ``significant_terms`` aggregation:
    terms OVER-REPRESENTED in a foreground slice relative to the
    background corpus, ranked by the JLH score
    ``(fg_rate - bg_rate) * (fg_rate / bg_rate)`` over per-document
    frequencies — "what is different about these documents", the
    Discover drill-down OpenSearch ships natively.

    Plan shape: the corpus explodes its per-doc DISTINCT tokens once,
    each posting tagged with the foreground flag, and ONE conditional
    hash aggregation produces both document frequencies per term
    (vocab-bounded output). The two corpus totals ride a 1-row scalar
    broadcast (the TPC-H threshold idiom), the score is arithmetic
    over the vocab rows, and the top-k is TakeOrderedAndProject on
    the 6-decimal-rounded score with a term tie-break — deterministic
    and engine-portable. Two corpus scans (postings + doc totals),
    never more; at 100 TB the posting explode is the cost, identical
    to one scan-time token search."""
    tok = df.select(
        foreground.alias("_fg"),
        F.explode(
            F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
        ).alias("token"),
    ).filter(F.col("token") != "")
    freqs = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("bg_df"),
        F.count(F.when(F.col("_fg"), F.lit(1))).alias("fg_df"),
    )
    totals = df.agg(
        F.count(F.lit(1)).alias("_n_bg"),
        F.count(F.when(foreground, F.lit(1))).alias("_n_fg"),
    )
    fg_rate = F.col("fg_df") / F.col("_n_fg")
    bg_rate = F.col("bg_df") / F.col("_n_bg")
    return (
        freqs.crossJoin(F.broadcast(totals))
        .filter((F.col("fg_df") > 0) & (fg_rate > bg_rate))
        .select(
            "token",
            "fg_df",
            "bg_df",
            F.round((fg_rate - bg_rate) * (fg_rate / bg_rate), 6).alias("jlh"),
        )
        .orderBy(F.col("jlh").desc(), "token")
        .limit(k)
    )


def more_like_this(
    df: DataFrame,
    like_id: int,
    k: int = 10,
    n_terms: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Q2 — the OpenSearch ``more_like_this`` query: find documents
    similar to a SEED DOCUMENT by extracting its most salient terms
    and relevance-ranking the corpus with them. Both halves are the
    engine's certified primitives composed in-plan: TF-IDF picks the
    seed's top ``n_terms`` (text.tfidf_top_terms ordering), BM25
    scores the corpus with those terms (bm25_search formula), the
    seed itself is excluded, top-k out.

    The seed's term list is a ``n_terms``-row FRAME broadcast into
    the tf aggregation — never a driver-side collect, so the whole
    query is one lazy plan a scheduler can cache or index-rewrite.
    At scale both halves read the persisted token index instead of
    the corpus (tf/df/doclen/stats are exactly the index tables
    build_token_index_table materializes); this scan-time form is the
    certificate the index variant must equal."""
    from unified_log_aggregation_and_analytics_spark.operators.text import tfidf_top_terms

    lowered = df.select(F.col(id_col), F.lower(F.col(text_col)).alias(text_col))
    seed_terms = (
        tfidf_top_terms(lowered, text_col=text_col, id_col=id_col, k=n_terms)
        .filter(F.col(id_col) == like_id)
        .select("term")
    )
    token_arr = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    doclen = df.select(F.col(id_col), F.size(token_arr).alias("dl")).filter(
        F.col("dl") > 0
    )
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avg_dl"),
    )
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"),
    )
    tf = (
        toks.join(F.broadcast(seed_terms), F.col("token") == F.col("term"))
        .drop("term")
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_t"))
    idf = F.log(
        (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5) + 1.0
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * (F.col("dl") / F.col("avg_dl")))
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / denom
    return (
        tf.join(F.broadcast(dfreq), "token")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(stats))
        .filter(F.col(id_col) != like_id)
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib), 6).alias("mlt_score"))
        .orderBy(F.col("mlt_score").desc(), F.col(id_col))
        .limit(k)
    )


def search_snippets(
    df: DataFrame,
    term: str,
    n_words: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Q2 — highlight fragments, Discover's matched-context display:
    for every occurrence of ``term`` as a token, emit the surrounding
    ±``n_words`` token window with its 1-based match position.

    Plan shape: zero shuffle — match positions and window slices are
    per-row array expressions fused into the scan; output volume is
    one row per occurrence, exactly the highlight payload a search UI
    pages through. Compose downstream of any search predicate (the
    filter prunes first, snippets render the survivors)."""
    t = term.lower()
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    positions = F.filter(
        F.transform(toks, lambda tok, i: F.when(tok == t, i + 1)),
        lambda x: x.isNotNull(),
    )
    lo = F.greatest(F.col("pos") - n_words, F.lit(1))
    hi = F.least(F.col("pos") + n_words, F.size(F.col("_tk")))
    return (
        df.select(F.col(id_col), toks.alias("_tk"), F.explode(positions).alias("pos"))
        .select(
            F.col(id_col),
            F.col("pos").cast("int").alias("pos"),
            F.concat_ws(" ", F.slice(F.col("_tk"), lo, hi - lo + F.lit(1))).alias(
                "snippet"
            ),
        )
    )


def append_positional_index_table(
    df_new: DataFrame,
    table_name: str,
    n_buckets: int = TOKEN_INDEX_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Incremental maintenance for the positional index — the same
    contract as append_token_index_table: the delta's (token, doc,
    positions) postings append into the bucketed layout (Spark
    validates the bucket spec, so hash(term) pruning spans base +
    delta files). Positions are per-document, so appending NEW
    documents never touches existing rows; the id-disjointness caller
    contract is identical to the tf index's."""
    pos = df_new.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("pos", "token"),
    ).filter(F.col("token") != "")
    postings = pos.groupBy("token", id_col).agg(
        F.sort_array(F.collect_list("pos")).alias("positions")
    )
    (
        postings.write.bucketBy(n_buckets, "token")
        .sortBy("token")
        .mode("append")
        .saveAsTable(table_name)
    )


def prefix_suggest(
    df: DataFrame,
    prefix: str,
    k: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Q2 — completion suggester (OpenSearch prefix/suggest queries):
    vocabulary terms starting with ``prefix``, ranked by corpus
    occurrence count. Vocabulary-first like fuzzy_search: one explode
    + vocab-bounded agg, prefix filter over |vocab| rows, top-k — the
    corpus pays one scan, the suggestion set is dictionary work."""
    p = prefix.lower()
    return (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token")
        )
        .filter(F.col("token").startswith(p) & (F.col("token") != ""))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "token")
        .limit(k)
    )


def term_suggest(
    df: DataFrame,
    term: str,
    k: int = 10,
    max_edits: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Q2 — term suggester (OpenSearch "did you mean"): vocabulary
    terms within ``max_edits`` Levenshtein distance of a (possibly
    misspelled) query term, ranked by (distance asc, document
    frequency desc, term) — closer corrections first, popularity
    breaking distance ties, exactly the suggester's default sort.
    Vocabulary-first like fuzzy_search: one corpus explode into a
    DISTINCT-per-doc token set -> doc-frequency agg bounded at |vocab|
    rows -> the Levenshtein filter runs once per dictionary term,
    never per occurrence. The query term itself is excluded (a
    suggester proposes corrections, not the input)."""
    vocab = (
        df.select(
            F.explode(
                F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
            ).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    return _suggest_rank(vocab, term, k, max_edits)


def _suggest_rank(vocab: DataFrame, term: str, k: int, max_edits: int) -> DataFrame:
    """Shared tail of the term suggesters: Levenshtein over the
    (token, doc_freq) vocabulary, (distance asc, doc_freq desc, term)
    rank, input term excluded — one code path for the scan-time and
    persisted-index forms so their shared oracle cannot drift."""
    t = term.lower()
    return (
        vocab.withColumn("distance", F.levenshtein(F.col("token"), F.lit(t)))
        .filter((F.col("distance") <= max_edits) & (F.col("token") != t))
        .select("token", "distance", "doc_freq")
        .orderBy(F.col("distance").asc(), F.col("doc_freq").desc(), "token")
        .limit(k)
    )


def prefix_suggest_indexed(
    spark: SparkSession,
    table_name: str,
    prefix: str,
    k: int = 10,
) -> DataFrame:
    """Q2 persisted-index completion suggester: the prefix walk runs
    over the INDEX vocabulary and the occurrence rank comes from
    ``SUM(tf)`` — the postings carry per-(token, doc) term
    frequencies, so total occurrences reconstruct without any corpus
    scan. Must equal the scan-time prefix_suggest (shared oracle —
    the q02d index ≡ scan proof, applied to completion)."""
    p = prefix.lower()
    return (
        spark.table(table_name)
        .filter(F.col("token").startswith(p) & (F.col("token") != ""))
        .groupBy("token")
        .agg(F.sum("tf").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "token")
        .limit(k)
    )


def term_suggest_indexed(
    spark: SparkSession,
    table_name: str,
    term: str,
    k: int = 10,
    max_edits: int = 2,
) -> DataFrame:
    """Q2 persisted-index term suggester: the dictionary walk runs
    over the INDEX's vocabulary — the postings table holds one row
    per (token, document), so the doc-frequency aggregation is a
    bucketed-layout count with NO corpus scan at query time; then the
    same Levenshtein filter and (distance, doc_freq desc, term) rank
    as the scan-time term_suggest, whose oracle it shares (the q02d
    index ≡ scan proof, applied to the suggester)."""
    vocab = (
        spark.table(table_name)
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    return _suggest_rank(vocab, term, k, max_edits)


def phrase_suggest(
    df: DataFrame,
    phrase: str,
    k: int = 5,
    max_edits: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Q2 — phrase suggester (OpenSearch whole-phrase "did you
    mean"): corrected two-word phrases for a (possibly doubly
    misspelled) query, ranked by (total edit distance asc, corpus
    bigram frequency desc, phrase) — the term suggester's sort lifted
    to phrases, with the corpus bigram table standing in for the
    suggester's language model: only word pairs that actually occur
    can be suggested, which is the collocation gate that per-term
    correction alone cannot express. One corpus explode into the
    shared bigram kernel -> |bigrams|-bounded agg -> two Levenshtein
    evaluations per DICTIONARY bigram, never per occurrence."""
    from unified_log_aggregation_and_analytics_spark.operators.dedup import (
        token_ngrams,
    )

    words = phrase.lower().split()
    if len(words) != 2:
        raise ValueError("phrase_suggest corrects two-word phrases")
    w1, w2 = words
    # \s+ split keeps EDGE empties on both engines (Spark's F.split
    # uses limit=-1); dropping them before the bigram build stops a
    # leading/trailing-whitespace document from minting garbage
    # bigrams like ' ab' whose empty side is within max_edits of any
    # short query word. Interior adjacency is unaffected — \s+ never
    # yields interior empties.
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    bi = (
        df.select(F.explode(token_ngrams(toks, 2)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    parts = F.split(F.col("ngram"), " ")
    # Materialize each per-term Levenshtein ONCE as a column and
    # filter/sum over the columns — Catalyst does not CSE interpreted
    # string-distance expressions, so inlining them in both the
    # distance and the predicates would run each O(|bigrams|) pass
    # twice.
    return (
        bi.filter(F.size(parts) == 2)
        .withColumn("d1", F.levenshtein(F.element_at(parts, 1), F.lit(w1)))
        .withColumn("d2", F.levenshtein(F.element_at(parts, 2), F.lit(w2)))
        .filter(
            (F.col("d1") <= max_edits)
            & (F.col("d2") <= max_edits)
            & (F.col("ngram") != f"{w1} {w2}")
        )
        .withColumn("distance", F.col("d1") + F.col("d2"))
        .select(F.col("ngram").alias("suggestion"), "distance", "n_occurrences")
        .orderBy(F.col("distance").asc(), F.col("n_occurrences").desc(), "suggestion")
        .limit(k)
    )


def percolate(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Q2/ST — the OpenSearch percolate query, i.e. saved searches run
    in REVERSE: a table of stored AND-of-terms queries ``(query_id,
    terms array<string>)`` is matched against incoming documents; a
    query fires when every one of its terms appears in the document.
    This is the alerting/saved-search primitive the reference's
    Dashboards users build on: new log batches percolate through the
    stored alert conditions.

    Plan shape: the query table explodes to (query_id, term) postings
    and BROADCASTS (stored searches are human-authored — thousands at
    most); the corpus explodes its per-doc distinct tokens once; one
    broadcast equi-join on the term + a (doc, query)-keyed count==n
    check. Corpus cost is one full scan + one explode regardless of
    query count, plus an id-column-only pruned scan feeding the
    match-all branch; per-batch in a foreachBatch this is the
    streaming alert evaluator.

    An EMPTY-terms condition is a vacuous AND and fires on every
    document (OpenSearch percolating a match_all query matches
    everything) — a dedicated broadcast branch handles it, because
    explode would otherwise silently drop the query and an authored
    alert would simply never fire with no diagnostic."""
    n_terms = F.coalesce(F.size("terms"), F.lit(0))  # NULL == empty
    qterms = queries.filter(n_terms > 0).select(
        "query_id", F.explode("terms").alias("_t"), F.size("terms").alias("_nq")
    ).select(  # fold stored terms like the docs (explode can't nest)
        "query_id", F.lower(F.col("_t")).alias("token"), "_nq"
    )
    # r14 note: pre-intersecting each doc's token array with a 1-row
    # broadcast of the stored-term set (to shrink the Generate) was
    # measured SLOWER than this explode + broadcast-join probe at both
    # sf0.1 (0.70 -> 0.77 s) and 10x rows (1.12 -> 1.30 s): the
    # per-row array_intersect hash build costs more than the join
    # probes it saves. Kept as-is deliberately.
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
        ).alias("token"),
    )
    matched = (
        toks.join(F.broadcast(qterms), "token")
        .groupBy(id_col, "query_id", "_nq")
        .agg(F.count(F.lit(1)).alias("_hits"))
        .filter(F.col("_hits") == F.col("_nq"))
        .select(id_col, "query_id")
    )
    match_all = docs.select(F.col(id_col)).crossJoin(
        F.broadcast(queries.filter(n_terms == 0).select("query_id"))
    )
    return matched.unionByName(match_all)


def _glob_to_like(p: str) -> str:
    r"""OpenSearch wildcard glob -> SQL LIKE: ``*``/``?`` become
    ``%``/``_``; a backslash escapes the next glob metacharacter
    (``\*`` matches a literal star, per the OpenSearch wildcard
    syntax); LIKE's own metacharacters and bare backslashes are
    escaped so they always match literally."""
    out: list[str] = []
    i = 0
    while i < len(p):
        ch = p[i]
        if ch == "\\" and i + 1 < len(p) and p[i + 1] in "*?\\":
            lit = p[i + 1]
            i += 2
        elif ch == "*":
            out.append("%")
            i += 1
            continue
        elif ch == "?":
            out.append("_")
            i += 1
            continue
        else:
            lit = ch
            i += 1
        out.append("\\" + lit if lit in ("%", "_", "\\") else lit)
    return "".join(out)


def wildcard_search(
    df: DataFrame,
    pattern: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Q2 — OpenSearch ``wildcard`` term query (``*``/``?`` globs,
    e.g. ``s*k``): every document containing a token matching the
    glob, one row per (document, matched token).

    Plan shape: VOCABULARY-FIRST, exactly like fuzzy_search — the
    glob compiles to a LIKE pattern evaluated once per DICTIONARY
    TERM (vocab-bounded), never per token occurrence, and the
    surviving terms broadcast-join back onto the exploded corpus.
    This is the same dictionary-walk OpenSearch's wildcard automaton
    does before touching postings; leading-wildcard patterns stay
    O(|vocab|) term checks rather than going quadratic in corpus
    text. At scale the explode side reads the persisted token index
    instead of re-tokenizing (build_token_index_table), leaving only
    the vocab walk + pruned posting reads."""
    like = _glob_to_like(pattern.lower())
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
        ).alias("token"),
    )
    vocab = toks.select("token").distinct()
    matched = vocab.filter(F.col("token").like(like) & (F.col("token") != ""))
    return toks.join(F.broadcast(matched), "token").select(id_col, "token")


def histogram_pipeline_aggs(
    df: DataFrame,
    ts_col: str = "ts",
    bucket: str = "hour",
) -> DataFrame:
    """Q8 — OpenSearch pipeline aggregations over a date histogram:
    ``derivative`` (bucket-over-bucket delta) and ``cumulative_sum``,
    the Discover/visualization primitives layered on the histogram
    agg. One hash aggregation to the bucket grain (map-side combined,
    output ~ number of buckets), then ONE ordered window over the
    bucket-count frame for both pipeline metrics — window state is
    the histogram itself (thousands of rows at 100 TB), never event
    rows."""
    from pyspark.sql.window import Window

    hourly = df.groupBy(F.date_trunc(bucket, F.col(ts_col)).alias("bucket_start")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy("bucket_start")
    return hourly.select(
        "bucket_start",
        "n",
        (F.col("n") - F.lag("n").over(w)).alias("derivative"),
        F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cumulative"),
    )


def wildcard_search_indexed(
    spark: SparkSession, table_name: str, pattern: str
) -> DataFrame:
    """Q2 persisted-index wildcard: the glob's dictionary walk runs
    over the INDEX's term vocabulary (a distinct over the bucketed,
    token-sorted postings table — no corpus scan, and the aggregation
    rides the bucketed layout without an Exchange), surviving terms
    broadcast-join back onto the postings on the bucketed token key.
    Result set is identical to the scan-time wildcard_search — the
    postings hold exactly the per-document distinct tokens — so the
    catalog entry shares its oracle (the q02d index ≡ scan proof,
    applied to globs)."""
    like = _glob_to_like(pattern.lower())
    idx = spark.table(table_name)
    vocab = (
        idx.select("token")
        .distinct()
        .filter(F.col("token").like(like) & (F.col("token") != ""))
    )
    return idx.join(F.broadcast(vocab), "token").select("doc_id", "token")
