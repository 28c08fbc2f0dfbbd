"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully executed into Spark's noop sink (forces every
operator to run without result-collection overhead skewing the
numbers).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from unified_log_aggregation_and_analytics_spark.session import get_spark

# Headliners: one per operator family (scan+agg, joins, windows,
# as-of, text parse, dedup, vector search).
BENCH_QUERIES = [
    "q06_tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "q08_hourly_histogram",
    "q11_join_star_revenue",
    "q13_asof_join",
    "q14_window_funcs",
    "q17_dedup_distinct",
    "logs_apache_parse",
    "logs_sessionize",
    "dedup_exact",
    "dedup_minhash_sig",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "knn_cosine",
    "knn_ivf",
    "text_langid",
    # round-2 breadth: LLM-pipeline family end to end
    "knn_batch",
    "dedup_contamination",
    "text_tfidf_top",
    "docs_stratified_sample",
    "q02c_ranked_search",
    "knn_ann_lsh_indexed",
    # round-2 additions: quality filtering, sub-doc dedup, compression,
    # data mixing, batch indexed retrieval
    "text_repetition",
    "dedup_chunks",
    "emb_quantize_int8",
    "docs_mixture_sample",
    "knn_batch_ann_indexed",
    "docs_training_pipeline",
    # round-4 additions: incremental index maintenance (BM25 over an
    # appended token index), streaming-ingest routing analog,
    # refined-centroid IVF, compressed-image decode
    "q02f_indexed_bm25_appended",
    "docs_corpus_ingest",
    "knn_ivf_refined",
    "multimodal_image_stats_png",
    # r9: native baseline-JPEG decode (lossy-compressed sibling)
    "multimodal_image_stats_jpeg",
    # near-dup-aware ingest routing, kNN graph join, temperature mixing
    "docs_corpus_ingest_nd",
    "knn_join_graph",
    "docs_temperature_sample",
    # round-5 additions: hybrid lexical+semantic retrieval, bigram-LM
    # fluency scoring, product-quantized ADC search
    "q02g_hybrid_rrf",
    "text_lm_score",
    "knn_pq_adc",
    "knn_ivfpq_indexed",
    # round-5 TPC-H completion (the four heaviest of the eight new
    # shapes) + Gopher-rule filtering + RAG chunking
    "tpch_q2",
    "tpch_q8",
    "tpch_q9",
    "tpch_q21",
    "text_gopher_rules",
    "text_chunks_rag",
    # round-5 curation additions: semantic dedup over embedding cells,
    # DSIR hashed-ngram importance selection
    "dedup_semantic",
    "docs_dsir_sample",
    # round-5 search/report additions: seed-doc similarity, stored
    # saved-search evaluation, per-source dedup census, epoch mixing
    "q02k_more_like_this",
    "q02o_percolate",
    "docs_dedup_report",
    "docs_epoch_repeat",
    # round-7 additions: media-routing certificate (eager: decode pass
    # at construction), Misra-Gries heavy-hitter certificate (eager:
    # persisted summary), length-bucketing census
    "multimodal_ingest_report",
    "q07e_heavy_hitters",
    "docs_length_buckets",
    # round-7: filtered ANN + persisted-LM scoring (index paths —
    # train/build once per process, probes timed, like the ANN rows)
    "knn_ivf_filtered",
    "text_lm_score_indexed",
    # round-7: span-level dedup (ExactSubstr census), hard-negative
    # mining (brute-force + persisted-IVF probe), CCNet buckets,
    # soft-dedup weights, span decontamination
    "dedup_substring",
    "knn_hard_negatives",
    "knn_hard_negatives_indexed",
    "text_ccnet_buckets",
    "docs_soft_dedup_weights",
    "dedup_contamination_spans",
    # round-7: multimodal keyframes + LM-gated ingest. (The GD
    # training certificate text_quality_train is deliberately NOT
    # benched: 24 eager aggregate jobs x min-of-3 would add ~30 s of
    # driver bench time for an operator whose cost is training-run,
    # not query-latency, shaped — its correctness rides the oracle
    # gate instead.)
    "multimodal_keyframes",
    "docs_corpus_ingest_lm",
    # round-8: DoReMi-style domain reweighting (LM-proxy scoring
    # dominates; the EG step itself is k-row arithmetic)
    "docs_doremi_mixture",
    # round-10: the decode -> resize -> re-encode -> decode media
    # normalization pipeline (two full decode passes per payload —
    # the heaviest per-row media transform in the catalog)
    "multimodal_image_resize",
    # r11: matryoshka prefix-refine retrieval next to its brute-force
    # baseline knn_cosine (the row pair shows the coarse-stage
    # arithmetic saving directly)
    "knn_prefix_refine",
    # r11: SQ8 asymmetric search — the int8 storage-compression scan
    # next to knn_cosine's float scan (the 4x-fewer-bytes play)
    "knn_sq8_adc",
    # r11: MMR diversified rerank — shortlist scan + bounded 50x50
    # pair-sim join + greedy loop, all inside the clock (eager)
    "knn_mmr_rerank",
    # r11: the composed IVF+SQ8 probe — partition-pruned cells x
    # compressed rows, tracked like the other index-probe latencies
    "knn_ivfsq8_indexed",
    # r11: similarity search directly on text (feature hashing) —
    # explode + two hash aggs + a broadcast bucket join
    "text_hash_embed_knn",
    # r11: chunk-level RAG retrieval — chunker fan-out + hashed
    # passage vectors + query ranking in one plan
    "text_rag_retrieve",
    # r11 (late): Q queries over one compressed index read — the
    # batch shape on the SQ8 tier (not in BENCH_LOCAL_r11; first
    # numbers come from the driver's own run)
    "knn_batch_sq8_indexed",
    # r12: prefix-refine over the persisted dimension-split layout —
    # the coarse stage scans (id, prefix) only, so this row vs
    # knn_prefix_refine is the IO-vs-arithmetic delta of the split
    "knn_prefix_refine_indexed",
    # r12: the rotated-prefix composition — PCA projection persisted
    # as the coarse column (recall AND IO win in one layout); eager
    # (rotation derivation + coarse collect at construction)
    "knn_prefix_rot_indexed",
    # r13: OPQ certification path — rotation derivation + projection
    # + seeded encode + ADC, the whole pipeline inside the clock
    # (eager: covariance passes at construction); read next to
    # knn_pq_adc_seeded for the rotation's cost at identical codes
    "knn_opq_adc_seeded",
    # r14 (verdict item 2, "bench rows at birth" — the r13 entries
    # that landed oracle-green without a perf row): the OpenSearch
    # pipeline-agg family (all windows-over-buckets on bounded bucket
    # counts) and the exact token-budget window
    "q06l_bucket_selector",
    "q06m_range_agg",
    "q06n_matrix_stats",
    "q08h_sibling_stats",
    "q08i_serial_diff_moving",
    "q08j_auto_histogram",
    "docs_token_budget",
    # r14: the boundary-bucket token-budget form next to its exact
    # twin — the row pair shows the SinglePartition window's cost
    # directly (eager: percentile + subtotal passes at construction)
    "docs_token_budget_approx",
    # r14: OPQ persisted-index probe (the scale path knn_opq_adc_seeded
    # certifies; probe-only latency now that _index_rows is memoized)
    "knn_opq_adc_indexed",
    # r14: the IVF-OPQ composition probe — partition-pruned cells x
    # rotated-space codes, tracked like the other index-probe rows
    "knn_ivfopq_indexed_seeded",
    # r14: Morton geotile-grid aggregation (map-only + bounded-key agg)
    "logs_geo_grid",
]


# Entries deliberately carrying NO bench row, each with a stated
# reason — the standing rule since r14 (verdict item 2): a new
# catalog entry must land with EITHER a bench row (headline, scale,
# or build section) or an explicit exemption here, in the same
# round. tests/test_catalog_registry.py enforces the union, so an
# unlisted, unbenched entry fails CI rather than silently starting
# its drift history late.
_NB_0 = "in-plan certificate/report; the probed path's own bench row carries the latency"
_NB_1 = "certification/oracle twin of a benched production-path entry"
_NB_2 = "sub-second relational/search variant; family latency tracked by its benched representative"
_NB_3 = "codec/modality variant; decode throughput tracked by the benched image/ingest/keyframe rows"
_NB_4 = "map-only or vocabulary-bounded text op; family tracked by benched text rows"
_NB_5 = "bounded-state sampling/census variant; family tracked by benched docs rows"
_NB_6 = "probe variant sharing a benched index family's plan shape"
_NB_7 = "eager training loop; cost is training-run-shaped, correctness rides the oracle gate (the text_quality_train precedent)"

NOBENCH = {
    # --- sub-second relational/search variant; family latency tracked
    "logs_envelope_roundtrip": _NB_2,
    "logs_error_parse": _NB_2,
    "logs_error_rate": _NB_2,
    "logs_geo_distance": _NB_2,
    "logs_geo_bounds": _NB_2,
    "logs_geo_hash": _NB_2,
    "logs_ewma_anomaly": _NB_2,
    "logs_funnel": _NB_2,
    "logs_json_props": _NB_2,
    "logs_retention_cohorts": _NB_2,
    "logs_tab_parse": _NB_2,
    "logs_templates": _NB_2,
    "q01_filter_predicates": _NB_2,
    "q02_fulltext_search": _NB_2,
    "q02b_token_index_search": _NB_2,
    "q02d_indexed_search": _NB_2,
    "q02h_fuzzy_search": _NB_2,
    "q02i_phrase_search": _NB_2,
    "q02j_phrase_search_indexed": _NB_2,
    "q02l_search_highlights": _NB_2,
    "q02m_phrase_indexed_appended": _NB_2,
    "q02n_prefix_suggest": _NB_2,
    "q02p_wildcard": _NB_2,
    "q02q_wildcard_indexed": _NB_2,
    "q02r_term_suggest": _NB_2,
    "q02s_phrase_suggest": _NB_2,
    "q02t_term_suggest_indexed": _NB_2,
    "q02u_prefix_suggest_indexed": _NB_2,
    "q02v_phrase_prefix": _NB_2,
    "q03_time_range": _NB_2,
    "q04_projection": _NB_2,
    "q05_union_sources": _NB_2,
    "q06b_percentiles": _NB_2,
    "q06c_approx_percentiles": _NB_2,
    "q06d_quantile_cube": _NB_2,
    "q06e_significant_terms": _NB_2,
    "q06f_composite_agg": _NB_2,
    "q06g_rare_terms": _NB_2,
    "q06h_top_hits": _NB_2,
    "q06i_adjacency_matrix": _NB_2,
    "q06j_percentile_ranks": _NB_2,
    "q06k_extended_stats": _NB_2,
    "q07_distinct_users": _NB_2,
    "q07b_approx_distinct": _NB_2,
    "q07c_skew_distinct": _NB_2,
    "q07d_sketch_cube_distinct": _NB_2,
    "q08b_sliding_window": _NB_2,
    "q08c_anomaly_zscore": _NB_2,
    "q08d_histogram_pipeline": _NB_2,
    "q08e_histogram_dense": _NB_2,
    "q08f_burn_rate": _NB_2,
    "q08g_apdex": _NB_2,
    "q09_sort_orders": _NB_2,
    "q09b_search_after": _NB_2,
    "q09c_collapse": _NB_2,
    "q10_topk_users": _NB_2,
    "q10b_topk_per_group": _NB_2,
    "q10c_trending": _NB_2,
    "q11b_join_left_orders": _NB_2,
    "q11c_salted_join": _NB_2,
    "q11d_bucketed_join": _NB_2,
    "q12_semi_join": _NB_2,
    "q12b_anti_join": _NB_2,
    "q13b_range_join_binned": _NB_2,
    "q14b_moving_avg": _NB_2,
    "q15_intersect": _NB_2,
    "q15b_except": _NB_2,
    "q16_rollup": _NB_2,
    "q16b_cube": _NB_2,
    "q16c_grouping_sets": _NB_2,
    "q18_pivot": _NB_2,
    "tpch_q11": _NB_2,
    "tpch_q12": _NB_2,
    "tpch_q14": _NB_2,
    "tpch_q15": _NB_2,
    "tpch_q16": _NB_2,
    "tpch_q19": _NB_2,
    "tpch_q20": _NB_2,
    "tpch_q4": _NB_2,
    # --- certification/oracle twin of a benched production-path entry
    "dedup_clusters": _NB_1,
    "dedup_clusters_md5": _NB_1,
    "dedup_minhash_lsh_md5": _NB_1,
    "dedup_simhash": _NB_1,
    "dedup_simhash_md5": _NB_1,
    "dedup_simhash_pairs": _NB_1,
    "knn_ann_lsh_oracle": _NB_1,
    "knn_ivfpq_indexed_seeded": _NB_1,
    "knn_ivfopq_indexed": _NB_6,
    "knn_opq_adc": _NB_1,
    "multimodal_audio_near_dup": _NB_1,
    "multimodal_audio_near_dup_dft": _NB_1,
    "q02y_indexed_bm25_asof": _NB_1,
    "text_bpe_encode_seeded": _NB_1,
    "text_bpe_tokens": _NB_1,
    "text_fingerprint_md5": _NB_1,
    "text_fingerprint_rolling": _NB_1,
    # --- in-plan certificate/report; the probed path's own bench row 
    "ann_recall_report": _NB_0,
    "docs_mixture_plan": _NB_0,
    "knn_ivfopq_recall": _NB_0,
    "knn_ivfpq_recall": _NB_0,
    "knn_mmr_diversity": _NB_0,
    "knn_prefix_recall": _NB_0,
    "knn_prefix_rot_recall": _NB_0,
    "knn_sq8_recall": _NB_0,
    "langid_accuracy_report": _NB_0,
    "opq_recall_report": _NB_0,
    "pq_recall_report": _NB_0,
    "q02w_rank_eval": _NB_0,
    # --- bounded-state sampling/census variant; family tracked by ben
    "dedup_prefix_cluster": _NB_5,
    "docs_cluster_split": _NB_5,
    "docs_curriculum_order": _NB_5,
    "docs_filter_drift": _NB_5,
    "docs_hash_split": _NB_5,
    "docs_token_budget_by_lang": _NB_5,
    "docs_pack_contiguous": _NB_5,
    "docs_profile": _NB_5,
    "docs_quota_sample": _NB_5,
    "docs_split_leakage": _NB_5,
    "docs_weighted_sample": _NB_5,
    # --- probe variant sharing a benched index family's plan shape
    "ann_lsh_index_stats": _NB_6,
    "emb_mean_pool": _NB_6,
    "emb_norm_stats": _NB_6,
    "knn_ann_lsh": _NB_6,
    "knn_ann_lsh_appended": _NB_6,
    "knn_batch_ivf_indexed": _NB_6,
    "knn_graph_degrees": _NB_6,
    "knn_graph_pagerank": _NB_6,
    "knn_ivf_appended": _NB_6,
    "knn_ivf_indexed": _NB_6,
    "knn_join_graph_mp": _NB_6,
    "knn_prefix_rotated": _NB_6,
    "knn_sq8_indexed": _NB_6,
    # --- map-only or vocabulary-bounded text op; family tracked by be
    "text_cooccurrence": _NB_4,
    "text_corpus_bigrams": _NB_4,
    "text_entropy": _NB_4,
    "text_fingerprint": _NB_4,
    "text_hash_embed": _NB_4,
    "text_lang_profile": _NB_4,
    "text_langid_ngram": _NB_4,
    "text_lm_heldout": _NB_4,
    "text_pii_scrub": _NB_4,
    "text_quality": _NB_4,
    "text_quality_filter": _NB_4,
    "text_token_stats": _NB_4,
    # --- codec/modality variant; decode throughput tracked by the ben
    "multimodal_audio_resample": _NB_3,
    "multimodal_audio_segments": _NB_3,
    "multimodal_audio_stats": _NB_3,
    "multimodal_audio_stats_alaw": _NB_3,
    "multimodal_audio_stats_mulaw": _NB_3,
    "multimodal_dup_clusters": _NB_3,
    "multimodal_feature_knn": _NB_3,
    "multimodal_features": _NB_3,
    "multimodal_image_near_dup": _NB_3,
    "multimodal_image_stats": _NB_3,
    "multimodal_join": _NB_3,
    "multimodal_keyframes_mjpeg": _NB_3,
    "multimodal_video_dup_clusters": _NB_3,
    "multimodal_video_frames": _NB_3,
    "multimodal_video_near_dup": _NB_3,
    "multimodal_video_resample": _NB_3,
    "multimodal_video_resize": _NB_3,
    "multimodal_video_stats": _NB_3,
    "multimodal_video_stats_mjpeg": _NB_3,
    # --- eager training loop; cost is training-run-shaped, correctnes
    "text_quality_clf": _NB_7,
    "text_quality_train_heldout": _NB_7,
}


# Scale-stress section: the dedup/ANN/text/relational families re-run
# at 10x rows (.scaledata/sf1, generated from the driver's sf0.1
# tables by tools/make_scale_data.py with structure-preserving
# perturbations — key-offset replicas keep TPC-H referential joins
# intact). Sub-second sf0.1 numbers can't show band-bucket skew,
# sidecar-join degradation, or join-shuffle growth; the 10x ratio
# can. Disable with SPARK_GRAFT_SCALE=0.
SCALE_QUERIES = [
    # relational: joins/aggs over the 6M-row scaled lineitem
    "q06_tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q7",
    "tpch_q10",
    "tpch_q13",
    "tpch_q17",
    "tpch_q18",
    "tpch_q22",
    "tpch_q2",
    "tpch_q9",
    "tpch_q21",
    "q11_join_star_revenue",
    "dedup_exact",
    "dedup_chunks",
    "dedup_minhash_sig",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "text_repetition",
    "text_langid",
    "text_gopher_rules",
    "text_chunks_rag",
    "docs_training_pipeline",
    "docs_corpus_ingest_nd",
    "knn_cosine",
    "knn_batch",
    "text_lm_score",
    "knn_pq_adc_seeded",
    "dedup_semantic",
    "docs_dsir_sample",
    "dedup_substring",
    # r8: the interval-bound ExactSubstr EDIT benched next to its
    # census (the r7 form had no scale row — VERDICT r7 perf_weak)
    "dedup_substring_clean",
    "knn_hard_negatives",
    "knn_hard_negatives_indexed",
    # r9: the media-routing certificate at 10x (r8 verdict: its
    # headline move had no scale row to disambiguate variance from
    # growth — decode pass + banded Hamming join both stress at 10x)
    "multimodal_ingest_report",
    # r9: native JPEG decode throughput at 10x (50k Huffman+IDCT
    # decodes through mapInPandas — the Python-codec scaling row)
    "multimodal_image_stats_jpeg",
    # r10: the decode -> resize -> re-encode -> decode pipeline at 10x
    # (two decode passes + the area-average kernel per payload — the
    # heaviest per-row media transform, so its growth row matters)
    "multimodal_image_resize",
    # r11 (verdict item 4): standing scale rows for the certified-but-
    # never-scale-benched families. GD training (24 full-batch steps
    # over the checkpointed feature frame — eager-by-contract, the
    # whole train run is inside the clock; r7 measured it ad hoc at
    # ~21 s, now tracked round-over-round) and the persisted-index
    # BM25 probe (index builds once per process via tableExists
    # memoization; the timed region is the probe — index-probe
    # latency tracked like the vector-index probes are).
    "text_quality_train",
    "q02e_indexed_bm25",
    # r11: the prefix-refine scale row pairs with knn_cosine's —
    # coarse-stage arithmetic saving must survive 10x rows
    "knn_prefix_refine",
    # r11: MMR at 10x — only the shortlist scan grows; the pair join
    # and greedy loop are shortlist-bounded by construction
    "knn_mmr_rerank",
    # r11: SQ8 asymmetric scan at 10x rows — per-vector dequant
    # arithmetic is map-only, so growth must stay linear-or-better
    "knn_sq8_adc",
    # r11: feature-hashed text knn at 10x docs — the explode + two
    # hash aggs carry |docs| x 64 partial sums, growth must be linear
    "text_hash_embed_knn",
    # r12: the dimension-split prefix index at 10x — coarse stage
    # reads (id, prefix-16) columns instead of full 64-dim vectors;
    # pairs with knn_prefix_refine's fused-column row above
    "knn_prefix_refine_indexed",
    # r12: the rotated-prefix persisted layout at 10x (covariance
    # passes + frozen-artifact probe — the full lifecycle clocked)
    "knn_prefix_rot_indexed",
    # r13: the approx-boundary curriculum at 10x — the scale form's
    # whole point is surviving row growth without a single-reducer
    # global sort (plan-guarded in tests; this row tracks the wall)
    "docs_curriculum_order_approx",
    # r13: geo/CIDR enrichment at 10x events — the broadcast binned
    # range join must stay map-only on the points side
    "logs_geo_enrich",
    # r14: the boundary-bucket token-budget selection at 10x — the
    # scale form's reason to exist is surviving row growth without
    # the exact twin's single-reducer cumulative window
    "docs_token_budget_approx",
    # ... benched against the exact twin at the same 10x (retained
    # baseline): locally the single-reducer window still fits in one
    # task, so the pair reads close — the approx row exists for the
    # PLAN property (no SinglePartition), which is what survives
    # 1000 executors; drift of either row is tracked from birth
    "docs_token_budget",
    # r14: geotile-grid aggregation at 10x — bounded key domain, so
    # growth must track the scan, never the shuffle
    "logs_geo_grid",
]

# r12 (verdict item 6): the scale section splits into SCALE PATHS —
# the partition-pruned / compressed / salted / banded algorithms whose
# drift a verdict needs to see at a glance — and RETAINED BASELINES —
# brute-force twins and eager-training rows kept for recall/cost
# comparison, which dominate the raw total and obscure path drift.
# Membership below; everything not named is a scale path.
SCALE_BASELINES = {
    "knn_cosine",              # brute-force float scan (vs sq8/prefix/ivf rows)
    "knn_batch",               # brute-force batch scan (vs *_indexed batch rows)
    "knn_hard_negatives",      # brute-force twin of knn_hard_negatives_indexed
    "knn_join_graph_nbits7_allbits",  # exhaustive all-bit multiprobe baseline
    "text_quality_train",      # eager GD training (24 full-batch steps)
    "docs_token_budget",       # exact-window twin of docs_token_budget_approx
}


def _scale_extra_queries():
    """Scale entries that exercise a documented scaling KNOB rather
    than a fixed catalog signature: knn_join's bucket granularity is
    ~log2(corpus / target bucket population), so at 10x rows the graph
    runs with n_bits 4 -> 7 (same expected bucket population). Timing
    the catalog's fixed n_bits=4 at 10x rows would measure the
    deliberately-wrong knob setting (quadratic in bucket population),
    not the engine."""
    from pyspark.sql import functions as F

    from unified_log_aggregation_and_analytics_spark.operators import similarity as S

    def knn_join_graph_scaled(spark, sf_dir):
        # DEFAULT configuration (margin-2 multiprobe since r8 — the
        # constant-replication policy the operator prescribes for
        # corpus growth). Headline series: r7 benched this path as
        # knn_join_graph_nbits7_margin2 (3.84 s); the all-bit series
        # formerly under this name continues as *_allbits below.
        emb = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .repartition(32)
        )
        return S.knn_join(emb, k=5, n_bits=7, dim=64)

    def knn_join_graph_allbits(spark, sf_dir):
        # Exhaustive all-bit multiprobe — the oracle-baseline policy
        # (n_bits+1 = 8x replication at this granularity); kept for
        # the recall/cost comparison against the margin default.
        emb = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .repartition(32)
        )
        return S.knn_join(emb, k=5, n_bits=7, dim=64, multiprobe_bits=1)

    def _scaled_edges(spark, sf_dir):
        # Same graph the catalog entries build, at the 10x-appropriate
        # bucket granularity (n_bits 4 -> 7, see the docstring above)
        # and the DEFAULT margin-2 multiprobe — the constant-
        # replication policy the operator prescribes for corpus
        # growth (the catalog entries pin all-bit because their
        # oracles replay it; the all-bit build cost is already
        # tracked by knn_join_graph_nbits7_allbits, and folding its
        # 11 s into every rank/degree run would drown the 4 s the
        # rows exist to measure). Materialized eagerly exactly like
        # the catalog entries (localCheckpoint) so the rank/degree
        # rounds re-read a 2-column edge list.
        emb = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .repartition(32)
        )
        edges = S.knn_join(emb, k=5, n_bits=7, dim=64).select("src", "nbr")
        return edges.localCheckpoint(eager=True)

    def knn_graph_pagerank_scaled(spark, sf_dir):
        # r11: the one X3 component with no 10x row — 3 unrolled
        # PageRank rounds over the materialized kNN graph. Eager-by-
        # contract (graph build + rounds all inside the clock).
        from unified_log_aggregation_and_analytics_spark.operators.graph import (
            pagerank,
        )

        return pagerank(_scaled_edges(spark, sf_dir)).orderBy("id")

    def knn_graph_degrees_scaled(spark, sf_dir):
        from unified_log_aggregation_and_analytics_spark.operators.graph import (
            degree_profile,
        )

        return degree_profile(_scaled_edges(spark, sf_dir)).orderBy("id")

    return {
        "knn_join_graph_nbits7": knn_join_graph_scaled,
        "knn_join_graph_nbits7_allbits": knn_join_graph_allbits,
        "knn_graph_pagerank_nbits7": knn_graph_pagerank_scaled,
        "knn_graph_degrees_nbits7": knn_graph_degrees_scaled,
    }


# Entries whose catalog builder MATERIALIZES at construction time
# (eager-by-contract operators: dsir_select localCheckpoints its
# bounded selection before returning so it can drop the featurization
# cache). Timing only actions on the returned frame would measure a
# scan of the checkpointed result, not the operator (round-6 verdict:
# docs_dsir_sample "improved" 1.996s -> 0.013s purely because the cost
# moved out of the timed region). PROTOCOL RULE: for these entries
# every timed run re-invokes the builder, so construction + action is
# inside the clock; any new eager-by-contract catalog entry that joins
# the bench lists must be added here.
EAGER_QUERIES = {
    "docs_dsir_sample",
    "q07e_heavy_hitters",
    "multimodal_ingest_report",
    # LM-proxy scoring materializes at construction (localCheckpoint)
    "docs_doremi_mixture",
    # r11: GD training checkpoints features + runs 24 aggregate jobs
    # at construction; the graph entries localCheckpoint the kNN edge
    # list eagerly before the rank/degree rounds
    "text_quality_train",
    "knn_graph_pagerank_nbits7",
    "knn_graph_degrees_nbits7",
    # r11: MMR collects the shortlist + pair sims at construction;
    # the greedy rerank itself is bounded driver arithmetic
    "knn_mmr_rerank",
    # r12: the prefix probes' coarse stages collect the shortlist ids
    # at construction — rebuilding per run keeps the coarse scan (the
    # IO the split exists to cut) inside the clock
    "knn_prefix_refine_indexed",
    "knn_prefix_rot_indexed",
    # r13: the explicit build rows rebuild from scratch every run by
    # contract (the build IS the measured operation)
    "knn_prefix_refine_index_build",
    "knn_prefix_rot_index_build",
    "text_lm_index_build",
    "knn_ivfopq_index_build",
    # r13: approx curriculum localCheckpoints the range-sorted frame
    # and collects per-partition counts at construction (two-pass
    # position assignment) — rebuild per run keeps both passes timed
    "docs_curriculum_order_approx",
    # r13: OPQ derives the rotation (two Arrow covariance passes +
    # driver eigensolver) at construction
    "knn_opq_adc_seeded",
    # r14: the boundary-bucket token budget runs the percentile pass
    # + per-bucket subtotal collect at construction (bounded driver
    # state) — rebuild per run keeps both passes inside the clock
    "docs_token_budget_approx",
}


def _time_query(qs, name, spark, sf_dir, n_runs):
    """One unmeasured warmup (Janino codegen compile), then a list of
    n_runs measured times. Eager entries rebuild the DataFrame inside
    the clock."""
    eager = name in EAGER_QUERIES

    def run():
        d = qs[name](spark, sf_dir) if eager else df
        d.write.format("noop").mode("overwrite").save()

    df = None if eager else qs[name](spark, sf_dir)
    run()
    runs = []
    for _ in range(n_runs):
        t0 = time.time()
        run()
        runs.append(time.time() - t0)
    return runs


def _build_extra_queries():
    """Explicit index/model BUILD rows (r13, verdict item 1): the
    one-time build costs tracked as their own rows, so the probe rows
    (knn_prefix_refine_indexed, knn_prefix_rot_indexed,
    text_lm_score_indexed) measure probes and build drift is visible
    on its own line. Every run rebuilds from scratch into
    .bench_build/ — never the shared .ann_index/.lm_model caches the
    probe rows read — so the clock always holds a full cold build
    (covariance passes + rotation derivation included for the rotated
    layout). Build rows run min-of-1 after one warmup: a 10-20 s
    Arrow/shuffle job re-run 3x would add a minute of bench time to
    re-measure what one warm run already isolates."""
    import shutil
    from pathlib import Path

    from pyspark.sql import functions as F

    from unified_log_aggregation_and_analytics_spark.sources.batch import (
        load_table,
    )

    repo = Path(os.path.dirname(os.path.abspath(__file__)))

    def _fresh(kind: str) -> str:
        out = repo / ".bench_build" / kind
        if out.exists():
            shutil.rmtree(out)
        return str(out)

    def _emb(spark, sf_dir):
        return (
            load_table(spark, "embeddings", sf_dir)
            .filter(F.col("vec_id") != 0)
            .repartition(32)
        )

    def prefix_build(spark, sf_dir):
        from unified_log_aggregation_and_analytics_spark.operators import (
            ann_index as A,
        )

        path = _fresh("prefix16")
        A.build_prefix_index(_emb(spark, sf_dir), path, prefix_dim=16)
        return spark.read.parquet(f"{path}/table").select("vec_id").limit(1)

    def rotprefix_build(spark, sf_dir):
        from unified_log_aggregation_and_analytics_spark.operators import (
            ann_index as A,
            similarity as S,
        )

        path = _fresh("rotprefix")
        emb = _emb(spark, sf_dir)
        A.build_rotated_prefix_index(
            emb, path, S.power_pca_rotation(emb, n_components=32, iters=16)
        )
        return spark.read.parquet(f"{path}/table").select("vec_id").limit(1)

    def lm_build(spark, sf_dir):
        from unified_log_aggregation_and_analytics_spark.operators import (
            text as X,
        )

        path = _fresh("bigram_lm")
        X.train_bigram_lm(
            load_table(spark, "documents", sf_dir).repartition(32), path
        )
        return spark.read.parquet(f"{path}/meta")

    def ivfopq_build(spark, sf_dir):
        from unified_log_aggregation_and_analytics_spark.operators import (
            ann_index as A,
            pq as PQ,
            similarity as S,
        )

        path = _fresh("ivfopq")
        emb = _emb(spark, sf_dir)
        R = S.power_pca_rotation(emb, n_components=64, iters=16)
        A.build_ivfopq_index(
            emb, path, R[PQ.opq_interleave_perm(64, 4)],
            n_centroids=16, m=4, codes=8, train_iters=0,
        )
        return spark.read.parquet(f"{path}/table").select("vec_id").limit(1)

    return {
        "knn_prefix_refine_index_build": prefix_build,
        "knn_prefix_rot_index_build": rotprefix_build,
        "text_lm_index_build": lm_build,
        # r14: the full cold IVF-OPQ build — full-rank covariance
        # passes + 64-step eigensolver + projection + assign + encode
        # in one clock; the probe row knn_ivfopq_indexed_seeded stays
        # a pure probe
        "knn_ivfopq_index_build": ivfopq_build,
    }


BUILD_QUERIES = (
    "knn_prefix_refine_index_build",
    "knn_prefix_rot_index_build",
    "text_lm_index_build",
    "knn_ivfopq_index_build",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = get_spark("bench")

    # Warm the JVM with a representative plan shape (scan + filter +
    # join + agg + sort) over the two smallest tables, so the first
    # measured query doesn't also pay interpreter/JIT start-up.
    from pyspark.sql import functions as F

    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .filter(F.length("n_name") > 0)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("n_nationkey").alias("s"))
        .orderBy("r_name")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    # Per query: one unmeasured warmup execution (pays the one-time
    # Janino codegen compile of that plan, ~1-3s for the wide dedup
    # plans), then the MIN of three measured runs — steady-state
    # throughput, which is what a resident engine on a long-lived
    # cluster delivers. Min-of-N because this host exhibits sporadic
    # ~45 s freezes (observed hitting exactly one arbitrary query per
    # session); the minimum is the standard noise-robust estimator.
    # r13 protocol additions (verdict item 1): per-entry SPREAD
    # (max/min of the measured runs) is reported for any entry whose
    # runs disagree by >25% — the variance indicator a round-over-
    # round diff needs to separate host noise from code movement —
    # and the run metadata (loadavg at start/end, run counts) rides
    # in "meta" so an un-idle measurement window is visible in the
    # artifact itself.
    loadavg_start = [round(x, 2) for x in os.getloadavg()]
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}

    def _record(bucket, name, runs):
        bucket[name] = round(min(runs), 3)
        if min(runs) > 0 and max(runs) / min(runs) > 1.25:
            spreads[name] = round(max(runs) / min(runs), 2)

    for name in BENCH_QUERIES:
        _record(timings, name, _time_query(qs, name, spark, sf_dir, n_runs=3))
        # Operators that persist bounded internal frames (DSIR feature
        # table, MG summaries) cache per CALL; drop them between
        # queries so caches can't accumulate across the session and
        # pressure later entries' timings. (Within a query the warmup
        # run still populates the cache its timed runs reuse — the
        # resident-engine steady state being measured.)
        spark.catalog.clearCache()

    # Build rows: warmup + min-of-1 (see _build_extra_queries)
    build_qs = _build_extra_queries()
    build_timings: dict[str, float] = {}
    for name in BUILD_QUERIES:
        _record(
            build_timings, name, _time_query(build_qs, name, spark, sf_dir, n_runs=1)
        )
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "index_builds": build_timings,
        "sf": sf,
    }

    if os.environ.get("SPARK_GRAFT_SCALE", "1") != "0":
        repo = os.path.dirname(os.path.abspath(__file__))
        scale_dir = os.environ.get(
            "SPARK_GRAFT_SCALE_DIR", os.path.join(repo, ".scaledata", "sf1")
        )
        if not os.path.exists(os.path.join(scale_dir, "documents.parquet")):
            from tools.make_scale_data import generate

            generate(scale_dir, src=sf_dir)
        extra = _scale_extra_queries()
        scale_qs = dict(qs)
        scale_qs.update(extra)
        scale_timings: dict[str, float] = {}
        # r13: min-of-3 at scale too (was 2) — the verdict's idle
        # protocol demand; sub-2s 10x rows were flagged noise-prone
        # at min-of-2 twice running.
        for name in SCALE_QUERIES + list(extra):
            _record(
                scale_timings,
                name,
                _time_query(scale_qs, name, spark, scale_dir, n_runs=3),
            )
            spark.catalog.clearCache()  # same cross-query cache hygiene
        paths = {
            n: t for n, t in scale_timings.items() if n not in SCALE_BASELINES
        }
        baselines = {
            n: t for n, t in scale_timings.items() if n in SCALE_BASELINES
        }
        out["scale"] = {
            "sf": 1.0,
            "replicas": 10,
            "queries": scale_timings,
            "total": round(sum(scale_timings.values()), 3),
            # r12: keyed sections so path drift is visible without the
            # baselines' raw seconds drowning it (tools/bench_diff.py
            # diffs them separately)
            "scale_paths": {
                "queries": paths,
                "total": round(sum(paths.values()), 3),
            },
            "retained_baselines": {
                "queries": baselines,
                "total": round(sum(baselines.values()), 3),
            },
        }

    out["meta"] = {
        "n_runs_headline": 3,
        "n_runs_scale": 3,
        "n_runs_build": 1,
        "estimator": "min",
        "loadavg_start": loadavg_start,
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "host_cpus": os.cpu_count(),
        # entries whose measured runs disagreed by >25% (max/min
        # ratio) — the in-artifact noise flag for the diff protocol
        "spread_flags": spreads,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
