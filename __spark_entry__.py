"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps each implemented operator from SURVEY.md §2 to a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the DuckDB
twin the driver hash-compares against at sf=0.01. Implementations live
in ``soil_data_development_tools___arcmap_spark``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from soil_data_development_tools___arcmap_spark import queries as Q
from soil_data_development_tools___arcmap_spark.oracles import ORACLES

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the SDV dominant-condition aggregation (DCD with
    DCP-override + tiebreak + pct renormalization) — the heart of the
    reference's rating engine — on sf0.001."""
    return Q.sdv_dcd(spark, SF_SMOKE)


_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # SDV component-level aggregation family (SURVEY §2.4)
    "sdv_dcp_numeric": Q.sdv_dcp_numeric,
    "sdv_dcp_categorical": Q.sdv_dcp_categorical,
    "sdv_dcp_tiebreak_higher": Q.sdv_dcp_tiebreak_higher,
    "sdv_dcd": Q.sdv_dcd,
    "sdv_dcd_domain_reversed": Q.sdv_dcd_domain_reversed,
    "sdv_interp_dcd_not_rated": Q.sdv_interp_dcd_not_rated,
    "sdv_wta": Q.sdv_wta,
    "sdv_wta_zero_nulls": Q.sdv_wta_zero_nulls,
    "sdv_maxmin_max": Q.sdv_maxmin_max,
    "sdv_maxmin_min": Q.sdv_maxmin_min,
    "sdv_limiting_most": Q.sdv_limiting_most,
    "sdv_limiting_least": Q.sdv_limiting_least,
    "sdv_pp_sum": Q.sdv_pp_sum,
    "sdv_aggregate1": Q.sdv_aggregate1,
    # horizon-level (depth-weighted) family
    "sdv_hz_wta_sum": Q.sdv_hz_wta_sum,
    "sdv_hz_wta_wta": Q.sdv_hz_wta_wta,
    "sdv_hz_dcp_wta": Q.sdv_hz_dcp_wta,
    "sdv_hz_maxmin_wta": Q.sdv_hz_maxmin_wta,
    "sdv_hz_maxmin_dcd": Q.sdv_hz_maxmin_dcd,
    "sdv_hz_maxmin_dcp": Q.sdv_hz_maxmin_dcp,
    # month-level family
    "sdv_mo_wta": Q.sdv_mo_wta,
    "sdv_mo_maxmin_wrap": Q.sdv_mo_maxmin_wrap,
    "sdv_mo_dcd": Q.sdv_mo_dcd,
    "sdv_mo_dcd_domain": Q.sdv_mo_dcd_domain,
    "sdv_mo_dcp_domain": Q.sdv_mo_dcp_domain,
    "sdv_dtwt_dcp": Q.sdv_dtwt_dcp,
    "sdv_dtwt_dcd": Q.sdv_dtwt_dcd,
    "sdv_wta_dtwt": Q.sdv_wta_dtwt,
    # Valu1 pipeline (SURVEY §2.5)
    "valu1_aws_ranges": Q.valu1_aws_ranges,
    "valu1_first_restriction": Q.valu1_first_restriction,
    "valu1_sum_pct": Q.valu1_sum_pct,
    "valu1_rz_depth": Q.valu1_rz_depth,
    "valu1_rz_aws_droughty": Q.valu1_rz_aws_droughty,
    "valu1_soc": Q.valu1_soc,
    "valu1_nccpi": Q.valu1_nccpi,
    "valu1_nccpi2": Q.valu1_nccpi2,
    "valu1_pwsl": Q.valu1_pwsl,
    "valu1_wide": Q.valu1_wide,
    # metadata-driven rating planner end-to-end (SURVEY §3.1)
    "planner_sdv_rating": Q.planner_sdv_rating,
    "planner_sdv_flood_repair": Q.planner_sdv_flood_repair,
    "planner_sdv_hz_rating": Q.planner_sdv_hz_rating,
    "planner_sdv_hz_top_depth": Q.planner_sdv_hz_top_depth,
    "planner_sdv_month_rating": Q.planner_sdv_month_rating,
    "planner_sdv_soilmoist": Q.planner_sdv_soilmoist,
    "planner_sdv_batch": Q.planner_sdv_batch,
    "planner_sdv_interp": Q.planner_sdv_interp,
    "planner_sdv_mapunit": Q.planner_sdv_mapunit,
    "planner_sdv_no_agg": Q.planner_sdv_no_agg,
    # set ops / tools / validation (SURVEY §2.6-2.7, §2.11)
    "merge_dedup": Q.merge_dedup,
    "merge_rating_tables_tool": Q.merge_rating_tables_tool,
    "merge_by_map_tool": Q.merge_by_map_tool,
    "distinct_scan": Q.distinct_scan,
    "dominant_member_tool": Q.dominant_member_tool,
    "acreage_report": Q.acreage_report,
    "acreage_geom": Q.acreage_geom,
    "legend_class_breaks": Q.legend_class_breaks,
    "legend_unique_values": Q.legend_unique_values,
    "natmusym_attach": Q.natmusym_attach,
    "count_reconciliation": Q.count_reconciliation,
    "validate_depth_gaps": Q.validate_depth_gaps,
    "validate_component_pct": Q.validate_component_pct,
    "validate_missing_data": Q.validate_missing_data,
    "raster_lookup_codes": Q.raster_lookup_codes,
    "validate_structure": Q.validate_structure,
    "sdv_attribute_report": Q.sdv_attribute_report,
    # analytic benchmarks
    "q1_pricing_summary": Q.q1_pricing_summary,
    "q3_shipping_priority": Q.q3_shipping_priority,
    "q5_local_supplier": Q.q5_local_supplier,
    "q6_forecast_revenue": Q.q6_forecast_revenue,
    "q14_promo_share": Q.q14_promo_share,
    "q18_large_volume": Q.q18_large_volume,
    "q4_order_priority": Q.q4_order_priority,
    "q13_customer_distribution": Q.q13_customer_distribution,
    "q22_sales_opportunity": Q.q22_sales_opportunity,
    "q7_volume_shipping": Q.q7_volume_shipping,
    "q10_returned_items": Q.q10_returned_items,
    "q12_late_lines": Q.q12_late_lines,
    "q15_top_supplier": Q.q15_top_supplier,
    "q17_small_quantity": Q.q17_small_quantity,
    "q21_waiting_suppliers": Q.q21_waiting_suppliers,
    "q2_min_cost_supplier": Q.q2_min_cost_supplier,
    "q8_market_share": Q.q8_market_share,
    "q9_product_profit": Q.q9_product_profit,
    "q11_important_stock": Q.q11_important_stock,
    "q16_supplier_cnt": Q.q16_supplier_cnt,
    "q19_discounted_revenue": Q.q19_discounted_revenue,
    "q20_potential_promotion": Q.q20_potential_promotion,
    # events: batch analytics + Structured Streaming twin (SURVEY §2.9)
    "events_tumbling_daily": Q.events_tumbling_daily,
    "events_stream_tumbling": Q.events_stream_tumbling,
    "events_sessionize": Q.events_sessionize,
    "events_sessionize_stateful": Q.events_sessionize_stateful,
    "events_sliding_window": Q.events_sliding_window,
    "events_stream_sliding": Q.events_stream_sliding,
    "events_enriched_daily": Q.events_enriched_daily,
    "events_stream_enriched": Q.events_stream_enriched,
    "events_attribution": Q.events_attribution,
    "events_stream_attribution": Q.events_stream_attribution,
    "events_attribution_outer": Q.events_attribution_outer,
    "events_stream_attribution_outer": Q.events_stream_attribution_outer,
    "events_stream_dedup": Q.events_stream_dedup,
    "events_topk_per_type": Q.events_topk_per_type,
    "events_json_extract": Q.events_json_extract,
    "events_pivot_daily": Q.events_pivot_daily,
    "events_type_rollup": Q.events_type_rollup,
    "events_stream_session_window": Q.events_stream_session_window,
    "events_funnel": Q.events_funnel,
    "events_stream_funnel": Q.events_stream_funnel,
    "events_retention_cohorts": Q.events_retention_cohorts,
    "events_hll_registers": Q.events_hll_registers,
    # documents: text analysis + dedup (north-star LLM pipeline)
    "docs_token_count": Q.docs_token_count,
    "docs_quality": Q.docs_quality,
    "docs_langid": Q.docs_langid,
    "docs_fingerprint": Q.docs_fingerprint,
    "docs_exact_dedup": Q.docs_exact_dedup,
    "docs_ngram_jaccard": Q.docs_ngram_jaccard,
    "docs_minhash_signatures": Q.docs_minhash_signatures,
    "docs_minhash_lsh": Q.docs_minhash_lsh,
    "docs_lsh_band_stats": Q.docs_lsh_band_stats,
    "docs_dup_groups": Q.docs_dup_groups,
    "docs_top_ngrams": Q.docs_top_ngrams,
    "docs_chunk": Q.docs_chunk,
    "docs_pack_chunks": Q.docs_pack_chunks,
    "docs_simhash": Q.docs_simhash,
    "docs_clean_corpus": Q.docs_clean_corpus,
    "docs_decontaminate": Q.docs_decontaminate,
    "docs_source_stats": Q.docs_source_stats,
    "docs_mix_sample": Q.docs_mix_sample,
    "docs_dedup_keep_best": Q.docs_dedup_keep_best,
    "docs_quality_buckets": Q.docs_quality_buckets,
    "docs_gopher_rules": Q.docs_gopher_rules,
    "docs_repetition": Q.docs_repetition,
    "docs_dup_spans": Q.docs_dup_spans,
    # multimodal binary columns: metadata / Pandas-UDF features / frames
    "docs_media_metadata": Q.docs_media_metadata,
    "docs_media_features": Q.docs_media_features,
    "docs_frame_sample": Q.docs_frame_sample,
    # embeddings: similarity search (exact baseline + LSH scale path)
    "emb_knn_bruteforce": Q.emb_knn_bruteforce,
    "emb_knn_lsh": Q.emb_knn_lsh,
    "emb_knn_ivf": Q.emb_knn_ivf,
    "emb_cosine_dups": Q.emb_cosine_dups,
    "emb_dup_groups": Q.emb_dup_groups,
    "emb_norm_stats": Q.emb_norm_stats,
    # round 4: presentation cores (Bezier ramp, locale format, rotation),
    # as-of join, cluster-pruned ANN + recall, SemDeDup pruning
    "legend_color_ramp": Q.legend_color_ramp,
    "report_number_format": Q.report_number_format,
    "map_offset_angle": Q.map_offset_angle,
    "events_asof_attribution": Q.events_asof_attribution,
    "emb_knn_cluster": Q.emb_knn_cluster,
    "emb_cluster_recall": Q.emb_cluster_recall,
    "emb_semdedup": Q.emb_semdedup,
    "raster_rating_cells": Q.raster_rating_cells,
    "report_pagination": Q.report_pagination,
    "docs_decontaminate_bloom": Q.docs_decontaminate_bloom,
    "state_survey_partition": Q.state_survey_partition,
    "emb_hard_negatives": Q.emb_hard_negatives,
    "docs_char_entropy": Q.docs_char_entropy,
    "docs_pii_scrub": Q.docs_pii_scrub,
    "events_volume_anomaly": Q.events_volume_anomaly,
    "events_cogroup_profile": Q.events_cogroup_profile,
    "clip_select_by_location": Q.clip_select_by_location,
    "emb_ivf_recall": Q.emb_ivf_recall,
    "docs_length_histogram": Q.docs_length_histogram,
    "events_stream_volume_anomaly": Q.events_stream_volume_anomaly,
    "events_dau_wau": Q.events_dau_wau,
    "docs_rare_bigram_score": Q.docs_rare_bigram_score,
    "events_stream_dau": Q.events_stream_dau,
    "docs_chunk_udtf": Q.docs_chunk_udtf,
    "events_stream_wau": Q.events_stream_wau,
    "merge_upsert_latest": Q.merge_upsert_latest,
    "events_late_data_audit": Q.events_late_data_audit,
    "docs_remove_dup_spans": Q.docs_remove_dup_spans,
    "events_burst_users": Q.events_burst_users,
    "docs_pipeline_funnel": Q.docs_pipeline_funnel,
    # round 5: metadata-generated catalog ingest + catalog-proven planner
    "ingest_full_catalog": Q.ingest_full_catalog,
    "planner_sdv_extended": Q.planner_sdv_extended,
    "tile_survey_partition": Q.tile_survey_partition,
    "project_coordinates": Q.project_coordinates,
    "validate_referential_integrity": Q.validate_referential_integrity,
    "docs_bm25_search": Q.docs_bm25_search,
    "docs_train_split": Q.docs_train_split,
    "emb_knn_pq": Q.emb_knn_pq,
    "emb_pq_recall": Q.emb_pq_recall,
    "raster_tile_export": Q.raster_tile_export,
    "docs_mix_temperature": Q.docs_mix_temperature,
    "q12_shipmode_priority": Q.q12_shipmode_priority,
    "q19_disjunctive_revenue": Q.q19_disjunctive_revenue,
    "shapefile_merge_acres": Q.shapefile_merge_acres,
    "lineitem_profile": Q.lineitem_profile,
    "docs_training_manifest": Q.docs_training_manifest,
    "docs_shuffle_shards": Q.docs_shuffle_shards,
    "docs_incremental_dedup": Q.docs_incremental_dedup,
    "docs_quality_classifier": Q.docs_quality_classifier,
    "events_transition_matrix": Q.events_transition_matrix,
    "events_skew_audit": Q.events_skew_audit,
    "bucketed_rating_join": Q.bucketed_rating_join,
    "docs_sample_per_source": Q.docs_sample_per_source,
    "sda_source_counts": Q.sda_source_counts,
    "docs_media_decode_ppm": Q.docs_media_decode_ppm,
    "docs_media_decode_wav": Q.docs_media_decode_wav,
    "wss_source_ingest": Q.wss_source_ingest,
    "emb_matryoshka_recall": Q.emb_matryoshka_recall,
    # round-5 breadth batch C: warehouse/layout/retrieval/graph ops
    "events_scd2_history": Q.events_scd2_history,
    "layout_zorder": Q.layout_zorder,
    "docs_inverted_index": Q.docs_inverted_index,
    "events_pagerank": Q.events_pagerank,
    "docs_normalize_text": Q.docs_normalize_text,
    "events_stream_transition": Q.events_stream_transition,
    # round-5 breadth batch D
    "events_point_in_time_join": Q.events_point_in_time_join,
    "docs_collocations": Q.docs_collocations,
    "docs_length_deciles": Q.docs_length_deciles,
    # round-5 breadth batch E
    "events_multitouch_attribution": Q.events_multitouch_attribution,
    "events_session_paths": Q.events_session_paths,
    "docs_containment": Q.docs_containment,
    "events_stream_scd2": Q.events_stream_scd2,
    "events_conversion_latency": Q.events_conversion_latency,
    "partitioned_sink_prune": Q.partitioned_sink_prune,
    "events_incremental_rollup": Q.events_incremental_rollup,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return {k: v for k, v in ORACLES.items() if k in _QUERIES}
