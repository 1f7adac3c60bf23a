"""CORRECTNESS-rotation ordering for the query registry.

The driver oracle-checks the FIRST 50 registry entries (dict insertion
order) each round. With far more registered queries than slots (135 as
of late round 2 — never trust a hardcoded count here, len(REGISTRY) is
the truth), coverage rotates: each round the front of the registry
holds the queries that most need a green CORRECTNESS row, and queries
already verified green in a previous round move to the back. NOTE:
brand-new queries (in no list below) jump the queue via reorder()'s
new-query branch, each displacing one UNCHECKED_PRIORITY entry from
the 50-slot window.

Round-1 (CORRECTNESS_r01.json) checked entries 1-50 of the old order:
38 green, 12 fail (all from the events-loader bug, fixed in round 2).

Round-2 front (this file): flagship_star_fact + the 12 fixed events
queries (to convert their red rows) + 37 never-checked high-value
queries. The rest of the never-checked set queues immediately after
slot 50 so round 3 can promote it by updating VERIFIED_GREEN below.

Maintenance: after each round, append that round's green names to
VERIFIED_GREEN. The ordering below is deterministic and derived, so the
next 50 unverified queries automatically move to the front.
"""

from __future__ import annotations

# Green in CORRECTNESS_r01.json (round 1, registry slots 1-50).
VERIFIED_GREEN: list[str] = [
    "mart_per_month",
    "mart_per_segment",
    "mart_types_per_segment",
    "pivot_priority_by_year",
    "dim_collapse_first",
    "scd_latest_order",
    "scd2_customer_priority",
    "scd2_point_in_time_join",
    "incremental_mart_update",
    "topk_parts_per_brand",
    "join_enrich_brand_revenue",
    "join_composite_customer_year",
    "incremental_new_orders",
    "dq_referential_integrity",
    "dq_profile_customer",
    "hash_surrogate_keys",
    "dim_region_sentinel",
    "date_spine_orders",
    "bucketize_acctbal",
    "zscore_scrub_prices",
    "try_cast_dirty_ingest",
    "string_function_battery",
    "unpivot_priority_measures",
    "percentile_prices_by_flag",
    "rollup_priority_year",
    "window_battery_customer_orders",
    "window_trailing_30d",
    "histogram_order_prices",
    "tpch_q1_pricing_summary",
    "sql_api_top_segment_customers",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q13_customer_distribution",
    "tpch_q16_supplier_variety",
    "tpch_q18_large_volume",
    "approx_distinct_segments",
]

# Red in round 1 purely from the events-loader bug; fixed in round 2 —
# re-check first so the red rows flip green.
FIXED_EVENTS: list[str] = [
    "mad_scrub_event_values",
    "asof_nearest_purchase",
    "interval_join_purchase_clicks",
    "funnel_view_click_purchase",
    "user_event_sequences",
    "sessionize_events",
    "tumbling_hourly_events",
    "sliding_window_events",
    "salted_agg_events",
    "json_extract_events",
    "variant_shred_events",
    "map_explode_props",
]

# Never-checked queries in verification-priority order. The first
# (50 - 1 - len(FIXED_EVENTS)) of these land in the checked window this
# round; the rest queue behind them for the next rotation.
UNCHECKED_PRIORITY: list[str] = [
    # TPC-H remainder — the largest block of claimed-but-unverified SQL
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_parts",
    "tpch_q12_late_priority",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_disjunctive_revenue",
    "tpch_q20_promo_suppliers",
    "tpch_q21_waiting_supplier",
    "tpch_q2_cheapest_supplier",
    "tpch_q22_prospects",
    # dedup battery
    "dedup_exact_documents",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_components",
    "dedup_simhash_fingerprints",
    "dedup_simhash_near_dups",
    "decontaminate_test_split",
    # similarity / ANN
    "knn_bruteforce_cosine",
    "embedding_near_dup_pairs",
    "ann_ivf_topk",
    "embedding_lsh_near_dups",
    # streaming
    "stream_tumbling_hourly",
    "stream_stateful_user_stats",
    "stream_upsert_idempotent",
    # IO round-trips / layout
    "bucketed_join_colocated",
    "partitioned_scan_pruning",
    "partition_overwrite_backfill",
    "csv_roundtrip_orders",
    "orc_roundtrip_lineitem",
    # text battery
    "text_quality_stats",
    "text_lang_id",
    "text_token_counts",
    "c4_clean_documents",
    # --- round-3 queue from here down ---
    "sketch_mart_mergeable",
    "approx_percentile_claim",
    "sample_orders_deterministic",
    "mom_revenue_growth",
    "null_semantics_battery",
    "cube_segment_priority",
    "cohort_intersect_except",
    "flagship_star_fact",  # placed explicitly at slot 1 by reorder()
    "gap_fill_daily_revenue",
    "text_tfidf_top_terms",
    "dense_ids_documents",
    "remix_source_mixture",
    "grouped_zscore_chars",
    "regression_chars_vs_tokens",
    "text_heavy_hitters",
    "text_pii_redact",
    "doc_fingerprints",
    "doc_rolling_hash",
    "int8_ann_topk_claim",
    "ivf_centroid_assign",
    "multimodal_decode_stub",
    "multimodal_resize",
    "multimodal_frame_sample",
    "pack_sequences_documents",
    "text_repeated_ngrams",
    "array_hof_battery",
    "chunk_documents_sliding",
    "pandas_udf_quality_sigmoid",
    "stream_sessionize",
    "stream_interval_join",
    "stream_static_enrich",
    "jsonl_roundtrip_events",
    "csv_permissive_corrupt_rows",
    "clustered_write_skipping",
    "schema_evolution_merge",
    "compaction_roundtrip",
]


def reorder(registry: dict) -> dict:
    """Return the registry reordered for this round's CORRECTNESS window.

    Order: flagship first (the entry() query must have a green row),
    then FIXED_EVENTS, then UNCHECKED_PRIORITY, then previously-green
    queries, then anything new that no list mentions yet (new queries
    added mid-round land right after the flagship block so they get
    checked the same round they ship).
    """
    front: list[str] = ["flagship_star_fact"]
    listed = set(front)
    for name in registry:
        if name not in listed and name not in set(
            FIXED_EVENTS + UNCHECKED_PRIORITY + VERIFIED_GREEN
        ):
            front.append(name)  # brand-new query: check it this round
            listed.add(name)
    for block in (FIXED_EVENTS, UNCHECKED_PRIORITY, VERIFIED_GREEN):
        for name in block:
            if name in registry and name not in listed:
                front.append(name)
                listed.add(name)
    missing = [n for n in registry if n not in listed]  # defensive
    ordered = front + missing
    return {name: registry[name] for name in ordered if name in registry}
