"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing here
(nor in the raycontract library) calls ``ray.init()`` / ``ray.shutdown()``.

``queries()`` exposes one entry per implemented operator/pipeline from
SURVEY.md §2 (+ the training-data-pipeline extensions); ``oracle_sql()``
pairs every SQL-expressible one with an equivalent DuckDB query over the same
parquet tables. Column names/types match exactly (counts → BIGINT/int64,
money → integer cents) so the driver's order-insensitive value-hash agrees.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from raycontract import entry_queries as q  # noqa: E402


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: full contract validation
    (single-pass stats + uniqueness shuffle + referential anti-join) over the
    TPC-H-ish star schema; returns the per-check verdict table."""
    return q.flagship_contract_orders("/root/testdata/sf0.001").to_pandas()


def queries() -> dict[str, Callable[[str], Any]]:
    # ORDER MATTERS: the driver's CORRECTNESS record caps at 50 entries.
    # Round-5 rotation (VERDICT r4 #3): 45 oracle-paired queries come FIRST
    # — the hard rows+schema+hash gate — prioritising (a) the five round-4
    # dtype-hash failures (oracle SQL now CAST ... AS BIGINT) and (b) the
    # newly oracle-paired quantiles_totalprice; then the north-star
    # contract_images_validation plus the FOUR rows-only queries that have
    # never had a driver round (jpeg_psnr, semantic_dedup, bpe_merges,
    # video_frames) fill slots 46-50. Five long-green trivial entries
    # (driver-green in ALL of rounds 1-4: freshness_retention, pricing_summary,
    # top_customers, dedup_exact, neardup_cosine) rotated past the cap;
    # tests/test_entry_parity.py enforces parity locally for EVERY
    # oracle_sql() entry on every pytest run (all round-5 additions sit
    # past the cap; SURVEY §2f carries the authoritative counts).
    return {
        # -------- oracle-paired (every key here has an oracle_sql() entry)
        # contract validation (SURVEY §2a)
        "flagship_contract_orders": q.flagship_contract_orders,
        # counter / stats checks
        "nested_violations_orders": q.nested_violations_orders,
        "jsonschema_violations_documents": q.jsonschema_violations_documents,
        # uniqueness / distinct (shuffle paths)
        "distinct_users_per_type": q.distinct_users_per_type,
        # relational (pre-aggregated groupbys, broadcast join, top-k, windows)
        "asof_join_events_orders": q.asof_join_events_orders,
        "range_join_orders_bands": q.range_join_orders_bands,
        "shuffle_join_lineitem_orders": q.shuffle_join_lineitem_orders,
        "lag_delta_events": q.lag_delta_events,
        "heavy_hitters_sketch_events": q.heavy_hitters_sketch_events,
        # dedup family
        "neardup_keep_first_embeddings": q.neardup_keep_first_embeddings,
        "repeat_customers_orders": q.repeat_customers_orders,
        "hamming_pairs_documents": q.hamming_pairs_documents,
        # similarity search
        "knn_cosine_embeddings": q.knn_cosine_embeddings,
        # text analysis
        "chunk_documents": q.chunk_documents_q,
        "vocab_topk_documents": q.vocab_topk_documents,
        # curation (PII / split / sampling / decontamination)
        "hash_split_string_documents": q.hash_split_string_documents,
        "sample_fraction_documents": q.sample_fraction_documents,
        "bottomk_sample_orders": q.bottomk_sample_orders,
        "stratified_sample_documents": q.stratified_sample_documents,
        "decontaminate_documents": q.decontaminate_documents,
        "quality_counts_documents": q.quality_counts_documents,
        "repetition_lines_documents": q.repetition_lines_documents,
        "winnow_fingerprints_documents": q.winnow_fingerprints_documents,
        "mixture_sample_documents": q.mixture_sample_documents,
        "pack_sequences_documents": q.pack_sequences_documents,
        "tfidf_topk_documents": q.tfidf_topk_documents,
        # window functions / profile ops / text+JSON (round 4b — first
        # driver check this round)
        "running_total_events": q.running_total_events,
        "rolling_hour_events": q.rolling_hour_events,
        "funnel_events": q.funnel_events,
        "customers_without_orders": q.customers_without_orders,
        "rollup_pricing_lineitem": q.rollup_pricing_lineitem,
        "pivot_orders_status": q.pivot_orders_status,
        "histogram_totalprice": q.histogram_totalprice,
        "word_diversity_documents": q.word_diversity_documents,
        "bigram_topk_documents": q.bigram_topk_documents,
        "json_props_events": q.json_props_events,
        "quartile_orders": q.quartile_orders,
        "user_overlap_events_orders": q.user_overlap_events_orders,
        "label_centroids_embeddings": q.label_centroids_embeddings,
        "user_journeys_events": q.user_journeys_events,
        "weighted_sample_documents": q.weighted_sample_documents,
        "time_since_error_events": q.time_since_error_events,
        "oov_rate_documents": q.oov_rate_documents,
        "mode_event_type_per_user": q.mode_event_type_per_user,
        # newly oracle-paired this round (was rows-only; exact quantile
        # columns oracled, t-digest rank error asserted in-query)
        "quantiles_totalprice": q.quantiles_totalprice,
        # -------- north-star pipeline + the four rows-only queries that had
        # never been driver-recorded before round 5: slots 46-50
        "contract_images_validation": q.contract_images_validation,
        "jpeg_psnr_images": q.jpeg_psnr_images,
        "semantic_dedup_embeddings": q.semantic_dedup_embeddings,
        "bpe_merges_documents": q.bpe_merges_documents,
        "video_frames_sample": q.video_frames_sample,
        # -------- oracle-paired BEYOND the driver's 50-entry record this
        # round (each was driver-green in an earlier round; parity still
        # enforced every run by tests/test_entry_parity.py over oracle_sql())
        "freshness_retention_events": q.freshness_retention_events,
        "pricing_summary": q.pricing_summary_q,
        "top_customers_by_revenue": q.top_customers_q,
        "dedup_exact_documents": q.dedup_exact_documents,
        "neardup_cosine_embeddings": q.neardup_cosine_embeddings,
        "regex_violations_customer": q.regex_violations_customer,
        "status_distribution_orders": q.status_distribution_orders,
        "row_counts": q.row_counts,
        "null_counts_lineitem": q.null_counts_lineitem,
        "range_violations_lineitem": q.range_violations_lineitem,
        "distinct_counts": q.distinct_counts,
        "events_hourly": q.events_hourly_q,
        "text_stats_documents": q.text_stats_documents,
        "duplicate_user_events": q.duplicate_user_events_q,
        "events_sliding_windows": q.events_sliding_windows,
        "sessionize_events": q.sessionize_events_q,
        "heavy_hitters_users": q.heavy_hitters_users_q,
        "topk_events_per_user": q.topk_events_per_user,
        "orders_with_nation": q.orders_with_nation,
        "dedup_prefix_documents": q.dedup_prefix_documents,
        "bpe_tokens_documents": q.bpe_tokens_documents,
        "hash_split_documents": q.hash_split_documents,
        "exact_quantiles_totalprice": q.exact_quantiles_totalprice,
        "pii_scan_documents": q.pii_scan_documents,
        "langid_documents": q.langid_documents,
        "dup_clusters_documents": q.dup_clusters_documents,
        "ngram_jaccard_documents": q.ngram_jaccard_documents,
        # round-5 additions (past the 50-cap: pytest-parity-pinned, eligible
        # for a future gate rotation)
        "chunk_dedup_documents": q.chunk_dedup_documents,
        "ngram_contamination_documents": q.ngram_contamination_documents,
        "rank_events_by_value": q.rank_events_by_value,
        "cooccurrence_events": q.cooccurrence_events,
        "cohort_retention_events": q.cohort_retention_events,
        "throttle_events": q.throttle_events,
        "order_episodes_customer": q.order_episodes_customer,
        "source_profile_documents": q.source_profile_documents,
        # round-5b group-statistics family (oracle-paired, past the cap)
        "first_last_order_customer": q.first_last_order_customer,
        "zscore_outliers_events": q.zscore_outliers_events,
        "grouped_quartiles_orders": q.grouped_quartiles_orders,
        "reciprocal_knn_embeddings": q.reciprocal_knn_embeddings,
        "psi_sources_documents": q.psi_sources_documents,
        "benford_totalprice_orders": q.benford_totalprice_orders,
        "corr_quantity_price_lineitem": q.corr_quantity_price_lineitem,
        "quality_trend_events": q.quality_trend_events,
        # round-5c data-quality monitoring family (oracle-paired, past the cap)
        "latest_snapshot_events": q.latest_snapshot_events,
        "control_chart_events": q.control_chart_events,
        "fd_violations_orders": q.fd_violations_orders,
        "tukey_outliers_orders": q.tukey_outliers_orders,
        "trend_slope_events": q.trend_slope_events,
        "entropy_lang_by_source": q.entropy_lang_by_source,
        "orphan_rate_daily_events": q.orphan_rate_daily_events,
        "snapshot_diff_orders": q.snapshot_diff_orders,
        "mad_outliers_orders": q.mad_outliers_orders,
        "ks_sources_documents": q.ks_sources_documents,
        "top_event_types_per_user": q.top_event_types_per_user,
        "join_skew_events_orders": q.join_skew_events_orders,
        "redact_pii_documents": q.redact_pii_documents,
        "daily_value_quantiles_events": q.daily_value_quantiles_events,
        "hard_negatives_embeddings": q.hard_negatives_embeddings,
        "mixture_plan_documents": q.mixture_plan_documents,
        # -------- rows-only (approximate / non-SQL / self-synthesized input)
        "phash_neardup_images": q.phash_neardup_images,
        "neardup_lsh_embeddings": q.neardup_lsh_embeddings,
        "drift_documents": q.drift_documents,
        "minhash_pairs_documents": q.minhash_pairs_documents,
        "simhash_pairs_documents": q.simhash_pairs_documents,
        "dup_clusters_minhash_documents": q.dup_clusters_minhash_documents,
        "approx_distinct_hll": q.approx_distinct_hll,
        "lsh_knn_embeddings": q.lsh_knn_embeddings,
        "ivf_knn_embeddings": q.ivf_knn_embeddings,
        "quality_scores_documents": q.quality_scores_documents,
        "repetition_scores_documents": q.repetition_scores_documents,
        "fingerprints_documents": q.fingerprints_documents,
        "image_features_sample": q.image_features_sample,
        "audio_features_sample": q.audio_features_sample,
        # NEW round 5: grouped HLL, in-query verified vs the exact
        # grouped COUNT DISTINCT twin (raises >5%)
        "grouped_approx_distinct_events": q.grouped_approx_distinct_events,
        # NEW round 5: pixel-exact cross-format image dedup (binary decode —
        # non-SQL; planted re-encodings verified in-query, raises on drift)
        "pixel_dedup_images": q.pixel_dedup_images,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "flagship_contract_orders": q.flagship_oracle_sql(),
        "null_counts_lineitem": q.null_counts_lineitem_sql(),
        "range_violations_lineitem": q.range_violations_lineitem_sql(),
        "regex_violations_customer": q.regex_violations_customer_sql(),
        "status_distribution_orders": q.status_distribution_orders_sql(),
        "freshness_retention_events": q.freshness_retention_events_sql(),
        "row_counts": q.row_counts_sql(),
        "nested_violations_orders": q.nested_violations_orders_sql(),
        "jsonschema_violations_documents": q.jsonschema_violations_documents_sql(),
        "distinct_counts": q.distinct_counts_sql(),
        "duplicate_user_events": q.duplicate_user_events_sql(),
        "exact_quantiles_totalprice": q.exact_quantiles_totalprice_sql(),
        "pricing_summary": q.pricing_summary_sql(),
        "top_customers_by_revenue": q.top_customers_sql(),
        "events_hourly": q.events_hourly_sql(),
        "events_sliding_windows": q.events_sliding_windows_sql(),
        "sessionize_events": q.sessionize_events_sql(),
        "heavy_hitters_users": q.heavy_hitters_users_sql(),
        "asof_join_events_orders": q.asof_join_events_orders_sql(),
        "range_join_orders_bands": q.range_join_orders_bands_sql(),
        "orders_with_nation": q.orders_with_nation_sql(),
        "shuffle_join_lineitem_orders": q.shuffle_join_lineitem_orders_sql(),
        "topk_events_per_user": q.topk_events_per_user_sql(),
        "lag_delta_events": q.lag_delta_events_sql(),
        "heavy_hitters_sketch_events": q.heavy_hitters_sketch_events_sql(),
        "dedup_exact_documents": q.dedup_exact_documents_sql(),
        "dedup_prefix_documents": q.dedup_prefix_documents_sql(),
        "neardup_cosine_embeddings": q.neardup_cosine_embeddings_sql(),
        "neardup_keep_first_embeddings": q.neardup_keep_first_embeddings_sql(),
        "repeat_customers_orders": q.repeat_customers_orders_sql(),
        "knn_cosine_embeddings": q.knn_cosine_embeddings_sql(),
        "text_stats_documents": q.text_stats_documents_sql(),
        "bpe_tokens_documents": q.bpe_tokens_documents_sql(),
        "ngram_jaccard_documents": q.ngram_jaccard_documents_sql(),
        "dup_clusters_documents": q.dup_clusters_documents_sql(),
        "hamming_pairs_documents": q.hamming_pairs_documents_sql(),
        "pii_scan_documents": q.pii_scan_documents_sql(),
        "hash_split_documents": q.hash_split_documents_sql(),
        "hash_split_string_documents": q.hash_split_string_documents_sql(),
        "sample_fraction_documents": q.sample_fraction_documents_sql(),
        "bottomk_sample_orders": q.bottomk_sample_orders_sql(),
        "stratified_sample_documents": q.stratified_sample_documents_sql(),
        "decontaminate_documents": q.decontaminate_documents_sql(),
        "langid_documents": q.langid_documents_sql(),
        "chunk_documents": q.chunk_documents_q_sql(),
        "vocab_topk_documents": q.vocab_topk_documents_sql(),
        "mixture_sample_documents": q.mixture_sample_documents_sql(),
        "pack_sequences_documents": q.pack_sequences_documents_sql(),
        "tfidf_topk_documents": q.tfidf_topk_documents_sql(),
        "running_total_events": q.running_total_events_sql(),
        "rolling_hour_events": q.rolling_hour_events_sql(),
        "funnel_events": q.funnel_events_sql(),
        "customers_without_orders": q.customers_without_orders_sql(),
        "rollup_pricing_lineitem": q.rollup_pricing_lineitem_sql(),
        "pivot_orders_status": q.pivot_orders_status_sql(),
        "histogram_totalprice": q.histogram_totalprice_sql(),
        "word_diversity_documents": q.word_diversity_documents_sql(),
        "bigram_topk_documents": q.bigram_topk_documents_sql(),
        "json_props_events": q.json_props_events_sql(),
        "quartile_orders": q.quartile_orders_sql(),
        "user_overlap_events_orders": q.user_overlap_events_orders_sql(),
        "distinct_users_per_type": q.distinct_users_per_type_sql(),
        "label_centroids_embeddings": q.label_centroids_embeddings_sql(),
        "user_journeys_events": q.user_journeys_events_sql(),
        "weighted_sample_documents": q.weighted_sample_documents_sql(),
        "time_since_error_events": q.time_since_error_events_sql(),
        "oov_rate_documents": q.oov_rate_documents_sql(),
        "mode_event_type_per_user": q.mode_event_type_per_user_sql(),
        "quality_counts_documents": q.quality_counts_documents_sql(),
        "repetition_lines_documents": q.repetition_lines_documents_sql(),
        "winnow_fingerprints_documents": q.winnow_fingerprints_documents_sql(),
        "quantiles_totalprice": q.quantiles_totalprice_sql(),
        "chunk_dedup_documents": q.chunk_dedup_documents_sql(),
        "ngram_contamination_documents": q.ngram_contamination_documents_sql(),
        "rank_events_by_value": q.rank_events_by_value_sql(),
        "cooccurrence_events": q.cooccurrence_events_sql(),
        "cohort_retention_events": q.cohort_retention_events_sql(),
        "throttle_events": q.throttle_events_sql(),
        "order_episodes_customer": q.order_episodes_customer_sql(),
        "source_profile_documents": q.source_profile_documents_sql(),
        "first_last_order_customer": q.first_last_order_customer_sql(),
        "zscore_outliers_events": q.zscore_outliers_events_sql(),
        "grouped_quartiles_orders": q.grouped_quartiles_orders_sql(),
        "reciprocal_knn_embeddings": q.reciprocal_knn_embeddings_sql(),
        "psi_sources_documents": q.psi_sources_documents_sql(),
        "benford_totalprice_orders": q.benford_totalprice_orders_sql(),
        "corr_quantity_price_lineitem": q.corr_quantity_price_lineitem_sql(),
        "quality_trend_events": q.quality_trend_events_sql(),
        "latest_snapshot_events": q.latest_snapshot_events_sql(),
        "control_chart_events": q.control_chart_events_sql(),
        "fd_violations_orders": q.fd_violations_orders_sql(),
        "tukey_outliers_orders": q.tukey_outliers_orders_sql(),
        "trend_slope_events": q.trend_slope_events_sql(),
        "entropy_lang_by_source": q.entropy_lang_by_source_sql(),
        "orphan_rate_daily_events": q.orphan_rate_daily_events_sql(),
        "snapshot_diff_orders": q.snapshot_diff_orders_sql(),
        "mad_outliers_orders": q.mad_outliers_orders_sql(),
        "ks_sources_documents": q.ks_sources_documents_sql(),
        "top_event_types_per_user": q.top_event_types_per_user_sql(),
        "join_skew_events_orders": q.join_skew_events_orders_sql(),
        "redact_pii_documents": q.redact_pii_documents_sql(),
        "daily_value_quantiles_events": q.daily_value_quantiles_events_sql(),
        "hard_negatives_embeddings": q.hard_negatives_embeddings_sql(),
        "mixture_plan_documents": q.mixture_plan_documents_sql(),
        # no oracle (non-SQL-expressible / approximate / self-synthesized input):
        # contract_images_validation, approx_distinct_hll,
        # minhash/simhash pairs, dup_clusters_minhash, phash_neardup_images
        # (banding machinery oracle-paired via hamming_pairs_documents),
        # lsh_knn/ivf_knn, quality_scores/repetition_scores (float surface;
        # integer measurements oracle-paired via the _counts/_lines twins),
        # fingerprints (oracle-paired via the winnow md5 twin),
        # drift_documents, image/audio_features_sample
    }
