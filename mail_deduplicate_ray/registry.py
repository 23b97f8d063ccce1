"""Canonical query registry — every implemented pipeline/operator keyed
by name (the driver's ``queries()`` contract re-exported from the package
so the CLI can run any operator by name).  Each callable takes an
``sf_dir`` of parquet tables and returns a Dataset / DataFrame / Table.

ORDER MATTERS for the first 50 entries: the driver's per-round
correctness harness records only the first 50 keys (CORRECTNESS_r0N.json
caps there).  Round-5 rotation (VERDICT r4 item 6): the window pins the
flagship family + the highest-value SQL oracles (incl. the round-4 red
row, now fixed, and the newly-oracled k-center), and fills the other 40
slots with every query that never appeared in a driver CORRECTNESS row
in rounds 1-4 — so after this round ALL 135 queries carry driver
evidence.  The rotated-out entries keep full coverage via
tools/check_oracles.py sweeps and pytest.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from mail_deduplicate_ray.pipelines import (ann, clips, corpus, docs, images,
                                             relational, videos)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # ================= DRIVER WINDOW (first 50) =================
        # --- pinned: flagship family + key oracles ---
        "clips_flagship": clips.flagship_clusters,  # rows-only (planted recall >=0.99)
        "clips_tiered_dedup": clips.clips_tiered_dedup,  # rows-only (tiers 1-2 parity-tested, planted-kind attribution)
        "corpus_tiered_dedup": corpus.corpus_tiered_dedup,  # rows-only (cross-modal planted-kind attribution test)
        "clips_dtw_pairs": clips.clips_dtw_pairs,  # rows-only (DTW kernel stretch-alignment unit-tested)
        "clips_speed_perturb": clips.clips_speed_perturb_stats,  # rows-only (sinc-kernel SNR + stretch-channel re-merge tests)
        "nb_lang_classifier_docs": docs.nb_lang_classifier_docs,  # SQL-oracled (BIGINT-cast score, r4 red row fixed)
        "approx_distinct_users": relational.approx_distinct_users,  # SQL-oracled: bit-exact SplitMix64+HLL replay (_hll_sql)
        "kcenter_sample_embeddings": ann.kcenter_sample_embeddings,  # SQL-oracled r5: 16 chained argmax CTEs (_kcenter_sql)
        "minhash_clusters_docs": docs.minhash_clusters_docs,  # SQL-oracled: 128-perm replay + recursive-CTE CC
        "clips_flagship_chord": clips.flagship_clusters_chord,  # rows-only (high-entropy corpus; recall+precision e2e test)
        # --- first-time driver rows: never in CORRECTNESS r1-r4 ---
        "semdedup_embeddings": ann.semdedup_embeddings,  # rows-only (brute-force parity-tested)
        "rare_bigram_docs": docs.rare_bigram_docs,
        "temperature_sample_docs": docs.temperature_sample_docs,
        "events_dedup_burst": relational.events_dedup_burst,
        "forecast_revenue": relational.forecast_revenue,
        "user_event_long": relational.user_event_long,
        "cap_events_per_user_type": relational.cap_events_per_user_type,
        "distinct_users_per_day": relational.distinct_users_per_day,
        "cumulative_new_users": relational.cumulative_new_users,
        "purchase_and_error_users": relational.purchase_and_error_users,
        "view_days_no_purchase": relational.view_days_no_purchase,
        "nation_spend_rank": relational.nation_spend_rank,
        "status_priority_rollup": relational.status_priority_rollup,
        "status_priority_cube": relational.status_priority_cube,
        "user_event_sequence": relational.user_event_sequence,
        "orders_above_customer_avg": relational.orders_above_customer_avg,
        "order_price_median": relational.order_price_median,
        "props_k_stats": relational.props_k_stats,
        "priority_brand_revenue": relational.priority_brand_revenue,
        "order_price_histogram": relational.order_price_histogram,
        "top3_orders_per_customer": relational.top3_orders_per_customer,
        "user_cumulative_value": relational.user_cumulative_value,
        "user_max_event_gap": relational.user_max_event_gap,
        "event_transitions": relational.event_transitions,
        "value_k_stats": relational.value_k_stats,
        "day_retention_matrix": relational.day_retention_matrix,
        "order_price_quantiles": relational.order_price_quantiles,
        "order_price_quantiles_sketch": relational.order_price_quantiles_sketch,  # rows-only (error-bound-tested)
        "order_price_rank_stats": relational.order_price_rank_stats,
        "order_quartiles_ntile": relational.order_quartiles_ntile,
        "ann_ivf_top10": ann.ann_ivf_topk,  # rows-only (recall-gated)
        "knn_graph_embeddings": ann.knn_graph_embeddings,
        "clips_audio_stats": clips.clips_audio_stats,  # rows-only (dBFS kernels unit-tested)
        "clips_cdc_chunks": clips.clips_cdc_chunks,  # rows-only (FastCDC kernel unit-tested)
        "clips_quality_gate": clips.clips_quality_gate,  # rows-only (clipping/flatness kernels unit-tested)
        "clips_silence_segments": clips.clips_silence_segments,  # rows-only (segmentation kernel unit-tested)
        "clips_loudness": clips.clips_loudness,  # rows-only (gain kernel unit-tested)
        "clips_landmark_pairs": clips.clips_landmark_pairs,  # rows-only (planted-truth recall test)
        "clips_mel_embeddings": clips.clips_mel_embeddings,  # rows-only (kernel unit-tested)
        "clips_audio_ann_top5": clips.clips_audio_ann_top5,  # rows-only (brute-force parity test)
        # ================ END DRIVER WINDOW (50) ================
        # previously driver-evidenced (green rows in r1-r4); still
        # swept by tools/check_oracles.py every round
        "simhash_docs": docs.simhash_docs,  # SQL-oracled: HUGEINT FNV replay
        "images_dhash_neardup": images.images_dhash_neardup,  # rows-only (planted-truth recall test)
        "images_phash_neardup": images.images_phash_neardup,  # rows-only (planted-truth recall test)
        "videos_frame_neardup": videos.videos_frame_neardup,  # rows-only (planted-truth recall test)
        "ann_pq_top10": ann.ann_pq_topk,  # rows-only (recall-gated)
        "ann_ivfpq_top10": ann.ann_ivfpq_topk,  # rows-only (recall-gated)
        "knn_triangles_embeddings": ann.knn_triangles_embeddings,
        "embedding_neardup_pairs": ann.embedding_neardup_pairs,
        "embedding_neardup_pairs_lsh": ann.embedding_neardup_pairs_lsh,
        "ann_bruteforce_top10": ann.ann_bruteforce_topk,
        "similar_docs_topk": docs.similar_docs_topk,
        "levenshtein_neardup_pairs": docs.levenshtein_neardup_pairs,
        "levenshtein_clusters": docs.levenshtein_clusters,
        "dup_span_removal_docs": docs.dup_span_removal_docs,
        "dup_span_intervals_docs": docs.dup_span_intervals_docs,
        "frequent_templates_docs": docs.frequent_templates_docs,
        "simhash_neardup_pairs": docs.simhash_neardup_pairs,
        "bloom_incremental_dedup_docs": docs.bloom_incremental_dedup_docs,
        "exact_dedup_docs": docs.exact_dedup_docs,
        "normalized_dedup_docs": docs.normalized_dedup_docs,
        "bag_dedup_docs": docs.bag_dedup_docs,
        "doc_fingerprints": docs.doc_fingerprints,
        "lang_id_docs": docs.lang_id_docs,
        "ngram_jaccard_pairs": docs.ngram_jaccard_pairs,
        "incremental_neardup_docs": docs.incremental_neardup_docs,
        "dup_ngram_fraction_docs": docs.dup_ngram_fraction_docs,
        "chunk_dedup_docs": docs.chunk_dedup_docs,
        "cluster_best_docs": docs.cluster_best_docs,
        "substring_pairs": docs.substring_pairs,
        "decontaminate_docs": docs.decontaminate_docs,
        "leakage_free_splits_docs": docs.leakage_free_splits_docs,
        "boilerplate_prefix_docs": docs.boilerplate_prefix_docs,
        "overlap_pairs_docs": docs.overlap_pairs_docs,
        "gopher_repetition_docs": docs.gopher_repetition_docs,
        "token_repetition_docs": docs.token_repetition_docs,
        "scrub_docs": docs.scrub_docs,
        "pii_redact_docs": docs.pii_redact_docs,
        "curate_docs": docs.curate_docs,
        "vocab_coverage_docs": docs.vocab_coverage_docs,
        "quality_scores": docs.quality_scores,
        "token_stats_per_lang": docs.token_stats_per_lang,
        "bpe_token_counts": docs.bpe_token_counts,
        "bpe_train_docs": docs.bpe_train_docs,
        "bpe_apply_docs": docs.bpe_apply_docs,  # rows-only (naive-encode parity test)
        "keep_biggest_per_lang": docs.keep_biggest_per_lang,
        "regexp_filter_docs": docs.regexp_filter_docs,
        "doc_hashes": docs.doc_hashes,
        "dup_group_size_histogram": docs.dup_group_size_histogram,
        "lang_adaptive_length_filter_docs": docs.lang_adaptive_length_filter_docs,
        "mixture_rebalance_docs": docs.mixture_rebalance_docs,
        "global_shuffle_order_docs": docs.global_shuffle_order_docs,
        "distinctive_terms_docs": docs.distinctive_terms_docs,
        "stratified_sample_docs": docs.stratified_sample_docs,
        "length_weighted_sample_docs": docs.length_weighted_sample_docs,
        "sample_k_per_lang": docs.sample_k_per_lang,
        "top_trigrams": docs.top_trigrams,
        "heavy_tokens": docs.heavy_tokens,
        "pack_sequences_docs": docs.pack_sequences_docs,
        "events_window_5m": relational.events_window_5m,
        "events_hopping_window": relational.events_hopping_window,
        "events_per_day": relational.events_per_day,
        "events_day_over_day": relational.events_day_over_day,
        "events_hour_heatmap": relational.events_hour_heatmap,
        "daily_conversion": relational.daily_conversion,
        "busiest_user_per_day": relational.busiest_user_per_day,
        "events_sessions": relational.events_sessions,
        "keep_oldest_per_user": relational.keep_oldest_per_user,
        "lineitem_pricing_summary": relational.lineitem_pricing_summary,
        "orders_by_status": relational.orders_by_status,
        "top_spenders": relational.top_spenders,
        "revenue_by_nation": relational.revenue_by_nation,
        "region_revenue": relational.region_revenue,
        "supplier_nation_balance": relational.supplier_nation_balance,
        "part_brand_revenue": relational.part_brand_revenue,
        "customers_without_orders": relational.customers_without_orders,
        "priority_orders_semi": relational.priority_orders_semi,
        "priority_orders_semi_bloom": relational.priority_orders_semi_bloom,
        "purchase_after_signup": relational.purchase_after_signup,
        "error_after_purchase": relational.error_after_purchase,
        "purchase_day_views": relational.purchase_day_views,
        "user_day_purchase_error_full": relational.user_day_purchase_error_full,
        "views_before_purchase_1h": relational.views_before_purchase_1h,
        "user_event_pivot": relational.user_event_pivot,
        "ann_lsh_buckets": ann.ann_lsh_buckets,  # rows-only
        "clips_exact_dedup": clips.clips_exact_dedup,  # rows-only
        "clips_signatures": clips.clips_signature_table,  # rows-only
    }
