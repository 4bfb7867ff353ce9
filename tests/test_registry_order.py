"""Grading-window ordering invariants (see VERDICT.md round 1).

The driver grades only the first ``GRADE_WINDOW`` entries of ``queries()`` in
dict order; round 1 left the 14 flagship reference workloads ungraded because
they registered last. These tests pin the fix.
"""

from __future__ import annotations

from flink_mm_spark import registry

registry.load_all()

# Core reference workloads that MUST be driver-graded (VERDICT.md "Next round"
# item 1 done-criteria).
CORE = {
    "binary_f64_scan",
    "binary_i16_scan",
    "text_points_scan",
    "matmul_cells",
    "gemm_broadcast_cells",
    "short_matrix_stats",
    "kmeans_assign",
    "kmeans_centroid_update",
    "kmeans_full",
    "mds_stress",
    "damds_embed",
    "label_centroid_udaf",
    "udtf_word_pairs",
    "media_audio_energy",
    "collectives_reduce",
    "collectives_allreduce",
}


def window() -> list[str]:
    return registry.ordered_names()[: registry.GRADE_WINDOW]


def test_ordered_names_is_a_permutation():
    names = registry.ordered_names()
    assert sorted(names) == sorted(registry.QUERIES)


def test_promote_exactly_fills_grading_window():
    """PROMOTE must contain exactly GRADE_WINDOW registered entries
    (ADVICE r4): adding to PROMOTE without a matching removal would
    silently push the tail entry past the graded window while every other
    invariant here still passes."""
    promoted = [n for n in registry.PROMOTE if n in registry.QUERIES]
    assert len(promoted) == registry.GRADE_WINDOW, (
        f"PROMOTE holds {len(promoted)} registered entries; "
        f"the driver grades exactly the first {registry.GRADE_WINDOW}"
    )


def test_promote_defer_disjoint_and_duplicate_free():
    assert len(registry.PROMOTE) == len(set(registry.PROMOTE))
    assert len(registry.DEFER) == len(set(registry.DEFER))
    overlap = set(registry.PROMOTE) & set(registry.DEFER)
    assert not overlap, f"entries in both PROMOTE and DEFER: {overlap}"
    unknown = (set(registry.PROMOTE) | set(registry.DEFER)) - set(registry.QUERIES)
    assert not unknown, f"PROMOTE/DEFER names not in the registry: {unknown}"


def test_core_workloads_inside_grading_window():
    missing = CORE - set(window())
    assert not missing, f"core workloads outside grading window: {missing}"


def test_core_workloads_registered_first():
    assert registry.ordered_names()[: len(registry.PROMOTE)] == [
        n for n in registry.PROMOTE if n in registry.QUERIES
    ]


def test_no_unordered_middle():
    """PROMOTE + DEFER must cover the whole registry (r8 invariant).

    The r7 rotation bug happened because entries could silently live in the
    unordered middle: PROMOTE was rewritten, DEFER was not, and nothing
    failed until the duplicate-detection tests did. With full coverage,
    every rotation is an explicit PROMOTE<->DEFER swap.
    """
    placed = set(registry.PROMOTE) | set(registry.DEFER)
    middle = [n for n in registry.QUERIES if n not in placed]
    assert not middle, f"registry entries in neither PROMOTE nor DEFER: {middle}"


def test_every_deferred_query_has_a_graded_family_sibling():
    """A deferred oracle query must leave its family represented in-window.

    Round-8 window = the round-7 window (50/50 green in CORRECTNESS_r07;
    all 122 oracle entries driver-proven at least once across r1-r7).
    Every sibling below is a member of that window; the r6-graded entries
    that the r7 rotation left in the unordered middle now sit in DEFER and
    point back at their in-window representative.
    """
    graded = set(window())
    siblings = {
        # graded green in r6, rotated out by the r7/r8 window
        "pricing_summary": "shipping_priority",
        "rollup_sales": "order_price_unpivot",
        "top_customers_per_nation": "running_order_totals",
        "asof_click_purchase": "event_followups_range_join",
        "histogram_quantiles": "count_min_exact",
        "hll_distinct_exact": "count_min_exact",
        "user_funnel_full_outer": "suppliers_with_large_lineitems",
        "events_minutely_gapfill": "events_sliding_streamed",
        "dedup_exact": "corpus_ingest_bounded_streamed",
        "dup_cluster_sizes": "corpus_ingest_bounded_streamed",
        "jaccard_shingle_pairs": "ngram_novelty",
        "minhash_lsh_exact": "minhash_dedup_streamed",
        "simhash_exact": "minhash_dedup_streamed",
        # r11/r12 rotations: the batch twins keep their oracle graded
        # through an in-window entry sharing the same chain
        "dedup_keep_best": "corpus_prep_pipeline_keepbest",
        "embedding_covariance": "embedding_covariance_streamed",
        "local_supplier_volume": "shipping_priority",
        "wordpiece_encode_holdout": "wordpiece_encode",
        "bpe_bytes_merges": "bpe_bytes_encode",
        "cross_source_overlap": "ngram_novelty",
        "tokenize_pack_pipeline": "mixture_pack_pipeline",
        "events_hourly": "events_sliding_streamed",
        "user_sessions_batch": "running_order_totals",
        "orders_with_returns": "suppliers_with_large_lineitems",
        "dsir_importance": "text_quality_by_lang",
        "cube_order_stats": "order_price_unpivot",
        "repetition_signals": "text_quality_by_lang",
        "embedding_near_dup": "pq_adc_topk",
        "jaccard_prefix_filtered": "ngram_novelty",
        # r12 stale-cohort rotation (VERDICT r11 #1): r11-green entries
        # displaced by the 9 r1- + 3 r2-stale entries and the two new
        # r12 operators; every family keeps an in-window sibling
        "event_type_pivot": "order_price_unpivot",
        "monthly_revenue_trend": "running_order_totals",
        "customers_without_orders": "suppliers_with_large_lineitems",
        "salted_event_totals": "kmeans_centroid_update",
        "quantity_percentiles": "count_min_exact",
        "global_stats": "short_matrix_stats",
        "media_metadata": "media_audio_energy",
        "pii_scrub": "text_quality_by_lang",
        "events_json_props": "events_sliding_streamed",
        "jaccard_token_pairs": "ngram_novelty",
        "semantic_dedup": "pq_adc_topk",
        # r12: the composed strict gate re-grades the decide store, the
        # exactly-once writer, and the manifest oracle in one entry
        "dedup_keep_best_streamed": "corpus_prep_pipeline_keepbest",
        "shard_append_streamed": "corpus_to_shards_strict",
        "corpus_to_shards_streamed": "corpus_to_shards_strict",
        "pca_fixed_project": "embedding_covariance_streamed",
        "unigram_viterbi_encode": "wordpiece_encode",
        "corpus_prep_pipeline_minhash": "corpus_prep_pipeline_keepbest",
        "corpus_prep_pipeline": "corpus_prep_pipeline_keepbest",
        "knn_per_label": "pq_adc_topk",
        "ann_lsh_exact": "pq_adc_topk",
        "doc_fingerprints": "dup_span_coverage",  # chunk family sentinel moved r13
        "rolling_fingerprints": "dup_span_coverage",
        "vocab_top_terms": "lang_id_ngram",
        "quality_logit_score": "lang_id_ngram",
        "bm25_topk": "lang_id_ngram",
        "bpe_merges": "bpe_bytes_encode",
        "bpe_encode": "bpe_bytes_encode",
        # r10 rotation: bpe_bytes_merges promoted (the last never-graded
        # oracle entry); token_counts deferred in its place
        "token_counts": "lang_id_ngram",
        # r10 rotation: each r10 entry displaced the prior tier of its own
        # family, which becomes its DEFER sibling
        "corpus_ingest_streamed": "corpus_ingest_bounded_streamed",
        "shard_write_roundtrip": "corpus_to_shards_strict",
        "unigram_logprob": "lang_id_ngram",
        "token_bigram_pmi": "lang_id_ngram",
        "wordpiece_merges": "wordpiece_encode",
        "gopher_quality_flags": "text_quality_by_lang",
        "benchmark_contamination": "text_quality_by_lang",
        "stratified_sample": "weighted_reservoir_sample",
        "bigram_logprob": "lang_id_ngram",
        "substring_dedup": "dup_span_coverage",
        "curation_funnel": "text_quality_by_lang",
        # r9 rotation: out for the 2 never-graded oracle entries
        "binmatrix_source_scan": "binary_f64_scan",
        "clamp_small_values": "shipping_priority",
        "shard_manifest": "corpus_to_shards_strict",
        "events_dedup_streamed": "minhash_dedup_streamed",
        "binmatrix_sink_roundtrip": "binary_f64_scan",
        "bucketed_fact_join": "shipping_priority",
        "events_enriched_streamed": "events_sliding_streamed",
        "events_hll_streamed": "minhash_dedup_streamed",
        "events_cms_streamed": "count_min_exact",
        # rotated out in earlier rounds
        "pack_sequences": "mixture_pack_pipeline",
        "kmeans_empty_repair": "kmeans_full",
        "cosine_topk": "pq_adc_topk",
        "click_purchase_streamed": "events_sliding_streamed",
        "binmatrix_stream_scan": "binary_f64_scan",
        "user_stats_streamed": "minhash_dedup_streamed",
        "zipf_fit": "lang_id_ngram",
        "media_decode_features": "media_audio_energy",
        "mixture_plan": "mixture_pack_pipeline",
        "dedup_components": "dedup_components_exact",
        "damds_varray_vp": "damds_embed",
        "damds_sidefile_scan": "damds_embed",
        "damds_bofz_bc": "damds_embed",
        "damds_temp_schedule": "damds_embed",
        "damds_cg_step": "damds_embed",
        # r13 stale-cohort rotation: the r12-green entries displaced by
        # the seven standalone r3-stale entries + the compaction operator
        "chunk_dedup": "dup_span_coverage",
        "customer_order_gaps": "running_order_totals",
        "orders_by_priority": "shipping_priority",
        "economy_revenue_share": "gemm_broadcast_cells",
        "lang_id_heuristic": "lang_id_ngram",
        "media_resize_estimate": "media_audio_energy",
        "distinct_part_types": "nation_set_ops",
        "media_frame_sample": "media_audio_energy",
        "top_orders_by_price": "running_order_totals",
        # (the r1/r2-stale cohort rotated INTO the r12 window and the r3
        # cohort rotated into the r13 window need no sibling rows here —
        # they are the in-window representatives now)
        # rows-only demos keep their exactly-graded twins in-window
        "kmeans_full_demo": "kmeans_full",
        "damds_embed_demo": "damds_embed",
    }
    deferred_oracle = {
        n
        for n in registry.DEFER
        if n in registry.QUERIES and registry.QUERIES[n].oracle is not None
    }
    uncovered = deferred_oracle - set(siblings)
    assert not uncovered, f"deferred oracle entries without a sibling: {uncovered}"
    for deferred, sibling in siblings.items():
        if deferred in registry.QUERIES:
            assert sibling in graded, f"{deferred} deferred but {sibling} ungraded"


def test_window_oracle_density():
    """The graded window should be dominated by hash-checked oracle queries."""
    w = window()
    with_oracle = [n for n in w if registry.QUERIES[n].oracle is not None]
    # r3: EVERY window entry is oracle-bearing — the iterative loops
    # (kmeans_full, damds_embed) got exact-replay oracles this round
    assert len(w) == len(with_oracle), [
        n for n in w if registry.QUERIES[n].oracle is None
    ]
