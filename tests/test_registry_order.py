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


def test_core_workloads_inside_grading_window():
    missing = CORE - set(window())
    assert not missing, f"core workloads outside grading window: {missing}"


def test_core_workloads_registered_first():
    assert registry.ordered_names()[: len(registry.PROMOTE)] == [
        n for n in registry.PROMOTE if n in registry.QUERIES
    ]


def test_every_deferred_query_has_a_graded_family_sibling():
    """A deferred oracle query must leave its family represented in-window."""
    graded = set(window())
    siblings = {
        "jaccard_token_pairs": "jaccard_prefix_filtered",
        "binmatrix_source_scan": "binary_f64_scan",
        "binmatrix_sink_roundtrip": "partitioned_sink_roundtrip",
        "binmatrix_stream_scan": "binary_f64_scan",
        "orders_by_priority": "pricing_summary",
        "top_orders_by_price": "top_customers_per_nation",
        "order_price_unpivot": "rollup_sales",
        "monthly_revenue_trend": "top_customers_per_nation",
        "customers_without_orders": "local_supplier_volume",
        "suppliers_with_large_lineitems": "local_supplier_volume",
        "events_json_props": "events_hourly_streamed",
        "distinct_part_types": "dedup_exact",
        "media_resize_estimate": "media_decode_features",
        "cube_order_stats": "rollup_sales",
        "salted_event_totals": "events_hourly_streamed",
        "economy_revenue_share": "pricing_summary",
        "customer_order_gaps": "top_customers_per_nation",
        "events_hourly": "events_hourly_streamed",
        "shipping_priority": "local_supplier_volume",
        "quantity_percentiles": "top_customers_per_nation",
        "global_stats": "short_matrix_stats",
        "media_metadata": "media_decode_features",
        "media_frame_sample": "media_decode_features",
        "corpus_prep_pipeline": "dedup_components",
        "orders_with_returns": "local_supplier_volume",
        "gopher_quality_flags": "unigram_logprob",
        "benchmark_contamination": "jaccard_prefix_filtered",
        "stratified_sample": "dedup_exact",
        "vocab_top_terms": "token_counts",
        "bm25_topk": "token_counts",
        "jaccard_shingle_pairs": "jaccard_prefix_filtered",
        "quality_logit_score": "unigram_logprob",
        "event_type_pivot": "rollup_sales",
        "running_order_totals": "top_customers_per_nation",
        "chunk_dedup": "dedup_exact",
        "rolling_fingerprints": "doc_fingerprints",
        "user_sessions_batch": "user_sessions_streamed",
        "kmeans_full_demo": "kmeans_full",
        "damds_embed_demo": "damds_embed",
        # r3 window swaps for the curation family (see registry.DEFER notes)
        "event_followups_range_join": "asof_click_purchase",
        "cosine_topk": "knn_per_label",
        "nation_set_ops": "rollup_sales",
        "text_quality_by_lang": "unigram_logprob",
        "lang_id_heuristic": "token_counts",
        "bpe_encode": "bpe_merges",
        "curation_funnel": "unigram_logprob",
        "events_enriched_streamed": "events_hourly_streamed",
        "events_dedup_streamed": "events_hourly_streamed",
        "events_sliding_streamed": "events_hourly_streamed",
        "user_stats_streamed": "user_sessions_streamed",
        "click_purchase_streamed": "asof_click_purchase",
        "hll_distinct_exact": "dedup_exact",
        "histogram_quantiles": "top_customers_per_nation",
        "count_min_exact": "token_counts",
        "user_funnel_full_outer": "local_supplier_volume",
        "events_minutely_gapfill": "events_hourly_streamed",
        "minhash_lsh_exact": "jaccard_prefix_filtered",
        "simhash_exact": "jaccard_prefix_filtered",
        "ann_lsh_exact": "knn_per_label",
        "pq_adc_topk": "knn_per_label",
        "bucketed_fact_join": "local_supplier_volume",
    }
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
