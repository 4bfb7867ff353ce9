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

    Rewritten for the round-5 SENTINEL window (VERDICT r4 ask #6): all 109
    oracle entries are driver-proven at least once across r1-r4, so the
    window now mixes the pinned §2 core, the r4/r5-changed operators, and
    a rotating third of entries last graded in r2/r3; the 22 rows graded
    in r4 rotate out and point at the promoted member of their family.
    """
    graded = set(window())
    siblings = {
        # rotated out mid-r5 to grade the four new r5 operators first
        "clamp_small_values": "local_supplier_volume",
        "embedding_near_dup": "semantic_dedup",
        "knn_per_label": "cosine_topk",
        "damds_varray_vp": "damds_embed",
        "kmeans_empty_repair": "kmeans_full",
        # graded green in r4, rotated out in the r5 sentinel window
        "pricing_summary": "label_centroid_udaf",
        "rollup_sales": "cube_order_stats",
        "top_customers_per_nation": "user_sessions_batch",
        "dedup_exact": "dedup_components",
        "jaccard_prefix_filtered": "minhash_lsh_exact",
        "bucketed_fact_join": "local_supplier_volume",
        "user_funnel_full_outer": "local_supplier_volume",
        "events_minutely_gapfill": "events_sliding_streamed",
        "histogram_quantiles": "hll_distinct_exact",
        "count_min_exact": "hll_distinct_exact",
        "jaccard_shingle_pairs": "minhash_lsh_exact",
        "benchmark_contamination": "pii_scrub",
        "ann_lsh_exact": "cosine_topk",
        "pq_adc_topk": "cosine_topk",
        "vocab_top_terms": "token_counts",
        "bm25_topk": "token_counts",
        "quality_logit_score": "unigram_logprob",
        "gopher_quality_flags": "repetition_signals",
        "stratified_sample": "pack_sequences",
        "curation_funnel": "dsir_importance",
        "corpus_prep_pipeline": "dedup_components",
        "events_enriched_streamed": "events_sliding_streamed",
        # rotated out earlier; family representation unchanged
        "matrix_generators_roundtrip": "binary_f64_scan",
        "centroid_lines_scan": "text_points_scan",
        "damds_sidefile_scan": "damds_embed",
        "partitioned_sink_roundtrip": "binmatrix_sink_roundtrip",
        "events_hourly_streamed": "events_sliding_streamed",
        "user_sessions_streamed": "user_stats_streamed",
        "damds_bofz_bc": "damds_embed",
        "damds_temp_schedule": "damds_embed",
        "damds_cg_step": "damds_embed",
        "dup_span_coverage": "chunk_dedup",
        "quantize_roundtrip": "binary_i16_scan",
        # long-deferred twins
        "jaccard_token_pairs": "minhash_lsh_exact",
        "event_followups_range_join": "asof_click_purchase",
        "nation_set_ops": "cube_order_stats",
        "text_quality_by_lang": "unigram_logprob",
        "lang_id_heuristic": "token_counts",
        "orders_by_priority": "label_centroid_udaf",
        "orders_with_returns": "local_supplier_volume",
        "top_orders_by_price": "user_sessions_batch",
        "order_price_unpivot": "cube_order_stats",
        "event_type_pivot": "cube_order_stats",
        "monthly_revenue_trend": "user_sessions_batch",
        "running_order_totals": "user_sessions_batch",
        "customers_without_orders": "local_supplier_volume",
        "suppliers_with_large_lineitems": "local_supplier_volume",
        "events_json_props": "events_sliding_streamed",
        "distinct_part_types": "dedup_components",
        "media_resize_estimate": "media_decode_features",
        "salted_event_totals": "kmeans_centroid_update",
        "economy_revenue_share": "mds_stress",
        "customer_order_gaps": "user_sessions_batch",
        "events_hourly": "events_sliding_streamed",
        "shipping_priority": "local_supplier_volume",
        "quantity_percentiles": "user_sessions_batch",
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
