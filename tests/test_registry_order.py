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


def test_every_deferred_query_has_a_graded_family_sibling():
    """A deferred oracle query must leave its family represented in-window.

    Round-6 SENTINEL window (VERDICT r5 ask #7): all 115 oracle entries are
    driver-proven at least once across r1-r5, so the window mixes the pinned
    §2 core, the r6 new entries + r5/r6-changed-code sentinels, and a
    rotating third of entries last graded r2-r4; the 30 rows graded green in
    r5 rotate out and point at the promoted member of their family.
    """
    graded = set(window())
    siblings = {
        # graded green in r5, rotated out in the r6 sentinel window
        "binmatrix_source_scan": "binmatrix_sink_roundtrip",
        "binmatrix_stream_scan": "binmatrix_sink_roundtrip",
        "simhash_exact": "minhash_lsh_exact",
        "chunk_dedup": "substring_dedup",
        "events_dedup_streamed": "events_enriched_streamed",
        "user_stats_streamed": "events_hll_streamed",
        "events_sliding_streamed": "events_enriched_streamed",
        "click_purchase_streamed": "events_enriched_streamed",
        "weighted_reservoir_sample": "stratified_sample",
        "dup_cluster_sizes": "dedup_exact",
        "token_bigram_pmi": "vocab_top_terms",
        "zipf_fit": "vocab_top_terms",
        "local_supplier_volume": "bucketed_fact_join",
        "token_counts": "vocab_top_terms",
        "media_decode_features": "media_audio_energy",
        "pii_scrub": "benchmark_contamination",
        "pack_sequences": "stratified_sample",
        "mixture_plan": "stratified_sample",
        "dedup_components": "corpus_prep_pipeline_minhash",
        "corpus_prep_pipeline": "corpus_prep_pipeline_minhash",
        "count_min_exact": "events_cms_streamed",
        "cosine_topk": "knn_per_label",
        "repetition_signals": "gopher_quality_flags",
        "unigram_logprob": "quality_logit_score",
        "dsir_importance": "curation_funnel",
        "semantic_dedup": "embedding_near_dup",
        "user_sessions_batch": "top_customers_per_nation",
        "cube_order_stats": "rollup_sales",
        "hll_distinct_exact": "histogram_quantiles",
        "pq_adc_topk": "ann_lsh_exact",
        "kmeans_empty_repair": "kmeans_full",
        "wordpiece_encode": "wordpiece_merges",
        # long-deferred, family representation per the r6 window
        "clamp_small_values": "pricing_summary",
        "damds_varray_vp": "damds_embed",
        "matrix_generators_roundtrip": "binary_f64_scan",
        "centroid_lines_scan": "text_points_scan",
        "damds_sidefile_scan": "damds_embed",
        "partitioned_sink_roundtrip": "binmatrix_sink_roundtrip",
        "events_hourly_streamed": "events_enriched_streamed",
        "user_sessions_streamed": "events_hll_streamed",
        "damds_bofz_bc": "damds_embed",
        "damds_temp_schedule": "damds_embed",
        "damds_cg_step": "damds_embed",
        "dup_span_coverage": "substring_dedup",
        "quantize_roundtrip": "binary_i16_scan",
        # long-deferred twins
        "jaccard_token_pairs": "jaccard_shingle_pairs",
        "event_followups_range_join": "asof_click_purchase",
        "nation_set_ops": "rollup_sales",
        "text_quality_by_lang": "quality_logit_score",
        "lang_id_heuristic": "vocab_top_terms",
        "orders_by_priority": "label_centroid_udaf",
        "orders_with_returns": "user_funnel_full_outer",
        "top_orders_by_price": "top_customers_per_nation",
        "order_price_unpivot": "rollup_sales",
        "event_type_pivot": "rollup_sales",
        "monthly_revenue_trend": "top_customers_per_nation",
        "running_order_totals": "top_customers_per_nation",
        "customers_without_orders": "user_funnel_full_outer",
        "suppliers_with_large_lineitems": "user_funnel_full_outer",
        "events_json_props": "events_enriched_streamed",
        "distinct_part_types": "dedup_exact",
        "media_resize_estimate": "media_audio_energy",
        "salted_event_totals": "kmeans_centroid_update",
        "economy_revenue_share": "mds_stress",
        "customer_order_gaps": "top_customers_per_nation",
        "events_hourly": "events_minutely_gapfill",
        "shipping_priority": "bucketed_fact_join",
        "quantity_percentiles": "top_customers_per_nation",
        "global_stats": "short_matrix_stats",
        "media_metadata": "media_audio_energy",
        "media_frame_sample": "media_audio_energy",
        "rolling_fingerprints": "doc_fingerprints",
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
