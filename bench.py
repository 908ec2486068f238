"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully executed via the noop sink (df.write.format("noop")) —
measures the complete distributed plan without driver-side collect costs,
except top-k queries whose output is tiny (collect is the realistic action).
"""

from __future__ import annotations

import glob
import json
import re
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from helium_arango_etl_lite_spark.plans.queries import QUERIES  # noqa: E402
from helium_arango_etl_lite_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family — shuffle-heavy agg, window, explode,
# joins, and every LLM pipeline op family (dedup sketch, similarity, text).
HEADLINE = [
    "agg_payment_volume",       # big groupBy shuffle
    "agg_session_window",       # session-window merge pass
    "topk_accounts",            # agg + TakeOrderedAndProject
    "window_latest_per_key",    # window function over shuffle
    "join_block_broadcast",     # broadcast join
    "join_asof",                # union+window as-of join
    "explode_witnesses",        # explode fan-out
    "hash_key_md5",             # row-level key hashing
    "llm_dedup_exact",          # content-hash dedup
    "llm_minhash_signature",    # sketch computation (per-row heavy)
    "llm_dedup_minhash",        # LSH band self-join
    "llm_dup_clusters",         # iterative connected components
    "llm_dedup_ngram_jaccard",  # exploded-shingle self-join
    "llm_topk_cosine",          # brute-force similarity scan
    "llm_ann_lsh",              # bucketed ANN
    "llm_ann_ivf",              # IVF cell-probed ANN
    "llm_multimodal_features",  # mapInPandas binary feature extraction
    "llm_token_stats",          # text analysis scan
    "llm_winnow_fingerprint",   # rolling-hash winnowing sketch
    "graph_pagerank",           # iterative broadcast-join rank propagation
    "agg_event_funnel",         # multi-stage funnel sharing one key shuffle
    "agg_cohort_retention",     # distinct-count cohort matrix
    "llm_bigram_topk",          # shifted-slice array kernel + top-k
    "tpch_q9_product_profit",   # 5-way join, integer-unit profit rollup
    "llm_decontaminate",        # broadcast n-gram contamination probe
    "window_ntile_decile_scalable",  # exact global rank, no 1-task window
    "llm_bm25_search",          # shuffle-free scoring + TakeOrdered
    "llm_inverted_index",       # posting-list build (term-key shuffle)
    "llm_semdedup",             # IVF-cell-scoped semantic dedup
    "llm_semdedup_capped",      # salt-split cell-size cap (the 100 TB dial)
    "llm_char_entropy",         # char-explode entropy aggregate
    "window_time_range_sum",    # time-RANGE window frame
    "agg_grouping_sets",        # multi-grouping Expand + single agg
    "llm_dedup_ngram_jaccard_capped",  # hot-shingle-capped scale form
    "llm_kmeans_iter",          # k-means M-step (centroid learning)
    # round-5 additions
    "llm_minhash_verify",       # two-stage LSH -> exact-Jaccard verify
    "llm_window_dedup",         # strided-window substring dedup
    "llm_quantize_pq",          # product-quantization codes (map-only)
    "llm_ann_ivf_pq",           # ADC search over PQ codes
    "llm_dedup_pipeline",       # sketch->verify->CC->keeper end-to-end
    "llm_dedup_pipeline_staged",  # exact-collapse-first production shape
    "llm_heavy_hitters_cms",    # Count-Min Sketch heavy hitters
    "agg_hll_distinct",         # from-first-principles HyperLogLog
    "llm_semantic_clusters",    # mutual-kNN graph -> pointer-jump CC
    "llm_ann_recall",           # recall@k eval: exact vs LSH-bucketed kNN
    "zorder_layout_stats",      # Morton clustering key + per-file spans
    "stream_late_replay",       # watermarked streaming agg, 3 micro-batches
    "stream_join_replay",       # stream-stream interval join state
    "agg_histogram_quantiles",  # mergeable histogram sketch + readout
    "join_bloom_prefilter",     # runtime bloom filter, measured fp rate
    "agg_exact_median_refine",  # sort-free exact order statistic
    # round-6 additions
    "llm_repetition_stats",     # Gopher repetition quality rules
    "agg_reservoir_per_group",  # mapInPandas-sheared per-group sample
    "llm_power_iteration",      # 2-step distributed power iteration
    # round-7 additions
    "llm_multimodal_decode_ppm",  # real binary PPM parse in mapInPandas
    "llm_multimodal_decode_wav",  # real RIFF/WAVE chunk-walk parse
    "llm_power_iteration_2",      # top-2 directions via rank-1 deflation
    "llm_shard_assign",           # rendezvous sharding, zero-shuffle map
    "llm_vocab_growth",           # shingle-keyed Heaps-law curve
    "llm_split_leakage_check",    # signature-level split contamination
    "llm_trigram_lm_score",       # capped trigram LM train + broadcast score
    "llm_incremental_dedup_bloom",  # new-batch-vs-history bloom shear
    "events_resample_interp",     # regular-grid resample, fused windows
    # round-8 additions
    "llm_multimodal_quarantine_ppm",  # corrupt-container quarantine split
    "llm_multimodal_quarantine_wav",  # corrupt-container quarantine split
    "llm_mixture_weights",        # temperature-scaled source mixture
    "llm_quality_percentile",     # histogram percentile, no corpus sort
    "llm_hard_negatives",         # shortlist-mined contrastive negatives
    "storage_compaction_plan",    # running-sum bin-packed file groups
    "llm_dedup_pipeline_star",    # hub-topology candidates, linear verify
    "llm_repeated_span_scrub",    # corpus-wide span removal + md5 rewrite
    "llm_dedup_containment",      # asymmetric quote/inclusion detector
    "join_interval_overlap",      # cell-blocked bounded-range self-join
    "dq_partition_skew",          # hash-bucket load/hot-key pre-flight
    "events_cusum_alarm",         # CUSUM drift alarms via prefix-min identity
    "stream_cusum_replay",        # the same numbers from stateful streaming
    "stream_session_replay",      # stateful sessionization vs gaps-and-islands
    "events_mad_outliers",        # median/MAD robust outliers, exact integers
    "graph_k_core",               # bounded-round peel of the mutual-kNN graph
    "llm_dedup_edit_verify",      # banded Levenshtein over LSH candidates
    "llm_logreg_train",           # full-batch GD as partial-agg shuffles
    # round-8 session-2 additions
    "scd2_build",                 # SCD2 change-point compress, one shuffle
    "pareto_frontier",            # two-level prefix-scan skyline
    "events_ewma",                # 16-lag trailing EWMA, one fused window
    "events_acf",                 # hourly-series autocorrelation, lags 1-6
    "dq_psi_drift",               # fixed-point PSI per source vs corpus
    "llm_weighted_sample",        # exponential-key weighted top-k sample
    "llm_naive_bayes_train",      # one-shuffle multinomial NB trainer
    "llm_naive_bayes_score",      # broadcast-model integer argmax scorer
    "llm_pmi_collocations",       # bigram PMI, marginals from pair table
    "events_seasonal_profile",    # hour-of-day baseline per event type
    "agg_gini_by_group",          # rank-formula Gini, partitioned window
    "dq_benford",                 # first-digit forensic, fixed-point chi2
    "llm_ngram_novelty",          # per-doc first-seer novelty fraction
    "events_trend_slope",         # trailing-8 exact least-squares slope
    "join_scd2_lookup",           # point-in-time dim join, no range join
    "graph_modularity",           # community quality vs null model
    "agg_theil_index",            # decomposable inequality, value grid
    "stream_scd2_replay",         # stateful CDC versioning = batch build
    "llm_logreg_sweep",           # R models per scan, steps scans total
    "agg_market_basket",          # basket-keyed co-occurrence + lift
    "events_forecast_backtest",   # seasonal-naive MAE/WAPE per type
    "llm_webdataset_index",       # tar shard pack + checksum-verified walk
    "llm_webdataset_fetch",       # JVM range-reads off the shard index
    "llm_curation_end_to_end",    # filter->dedup->shard->pack, one plan
    "llm_shard_quarantine",       # corrupt-archive failure isolation
    # round-9 additions
    "llm_multimodal_decode_png",  # stdlib-zlib PNG inflate + unfilter
    "llm_multimodal_quarantine_png",  # PNG corrupt-container split
    "llm_webdataset_index_capped",    # member-capped shard policy
    "llm_ann_graph_route",            # beam search over a kNN graph
    "llm_gzip_jsonl_roundtrip",       # multi-member .jsonl.gz round-trip
    "llm_gzip_quarantine",            # corrupt-blob failure isolation
    # round-10 additions
    "llm_ann_graph_route_reuse",      # one graph build, two query batches
    "llm_ann_index_append",           # incremental ingest, no rebuild
    "stream_ann_ingest_replay",       # the same contract as a real stream
    "llm_gzip_jsonl_capped",          # member-capped .jsonl.gz packing
    "llm_gzip_quarantine_capped",     # capped-blob failure isolation
    "join_interval_overlap_capped",   # cell-level salt-capped range join
    "llm_bpe_train",                  # iterative BPE merges, argmax loop
    "llm_bpe_encode",                 # tokenize with the learned merges
    "llm_bpe_compression_curve",      # per-round corpus token counts
    "llm_audio_features",             # windowed energy + ZCR frames
    "llm_zip_shard_index",            # STORED zip pack + EOCD-checked walk
    "llm_zip_quarantine",             # boundary-cut detection the gzip lacks
    "llm_rrf_fusion",                 # BM25 + cosine reciprocal-rank fusion
    "llm_eval_pr_at_k",               # precision/recall@K retrieval sweep
    "llm_eval_ndcg",                  # graded nDCG@K, literal discounts
    "dq_expectations",                # rule suite in one scan per table
    "llm_zip_index_capped",           # member-capped zip shard policy
    "llm_unigram_segment",            # unrolled integer Viterbi, no UDF
    "llm_unigram_nll",                # tokenizer-training progress readout
    "llm_unigram_em",                 # one hard-EM round, oracle-replayed
    "dq_referential_integrity",       # orphan keys + coverage, both ways
    "llm_bpe_fertility",              # tokens-per-word distribution
    "events_changepoint",             # argmax variance-reduction split
    "dq_k_anonymity",                 # QI equivalence-class risk sweep
    "llm_dataset_card",               # one-scan corpus release summary
    "dq_k_anonymity_suppress",        # drop sub-k classes, certify k
    "events_ohlc",                    # hourly candlesticks, pick-only
    "cdc_apply",                      # column-patch CDC merge, one window
    "stream_cdc_replay",              # CDC as a stateful stream + deletes
    "window_rolling_median",          # exact median over bounded frame
    "graph_resource_allocation",      # degree-penalized link prediction
    "join_spatial_radius",            # grid-blocked 2D radius self-join
    "storage_bucket_join",            # exchange-free join off bucketed IO
    "graph_hits",                     # hub/authority, integer 2-round
    "dq_l_diversity",                 # sensitive-diversity privacy sweep
    "events_attribution",             # last-touch credit, one window
    "llm_zipf_slope",                 # integer-OLS Zipf fit per lang
    "llm_eval_confusion",             # integer-exact P/R/F1 per class
    "storage_partition_prune",        # directory-level scan pruning
    "llm_mmr_diversify",              # greedy MMR re-rank, unrolled oracle
    "cdc_snapshot_diff",              # I/U/D feed from two snapshots
    "storage_schema_evolution",       # mergeSchema read, NULL-filled drift
    "events_markov_transitions",      # integer-rational transition matrix
    "llm_eval_calibration",           # accuracy per confidence quintile
    "llm_eval_rbo",                   # rank-biased overlap, literal weights
    "events_conversion_latency",      # signup->purchase latency histogram
    "stream_attribution_replay",      # cross-batch carry state, batch oracle
    "llm_random_projection",          # JL reduce + distortion readout
    "events_funnel_timed",            # strict ordered funnel, step bounds
    "graph_bfs_distance",             # bounded-depth multi-source BFS
    "llm_uncertainty_sample",         # margin bottom-K labeling picks
    "llm_multimodal_resize",          # real PNG decode + NN thumbnail
    "llm_kcenter_coreset",            # farthest-point coverage picks
    # round 11
    "llm_kcenter_coreset_batched",    # m picks per scan, ceil((k-1)/m) scans
    "llm_ann_graph_persist",          # build->bucketed table->append->route
    "llm_vocab_kl_drift",             # exact KL via shared detln pipeline
    "join_asof_tolerance",            # merge_asof(tolerance=) staleness mask
    "graph_personalized_pagerank",    # seed-restart rank, unrolled oracle
    "events_cuped",                   # variance-reduced A/B readout
    # round 12
    "llm_ann_ivf_pq_persist",         # train->partitioned table->ADC search
    "stream_heavy_hitters_replay",    # CMS cells in stream state
    "stream_session_ooo_replay",      # interval-merge sessionization
    "join_asof_nearest",              # closest either side, tie backward
    "events_rfm_segments",            # 3 exact global quintiles, no 1-task window
    "llm_ann_ivf_pq_append",          # frozen-artifact encode + table append
    # round 13
    "llm_ann_ivf_pq_recall",          # ADC top-k vs exact kNN overlay
    "llm_ann_ivf_pq_recall_trained",  # same, trained per-block codebook
    "llm_pq_train_codebook",          # per-block k-means M-step on the codebook
    "llm_ivf_cell_stats",             # seed vs Lloyd cell-size report
    "stream_quantiles_replay",        # 128-bin histogram in stream state
    "stream_hll_replay",              # max-merged HLL registers in stream state
    "llm_ann_ivf_pq_recall_sweep",    # nprobe curve from one candidate scan
]

# The exact query set BENCH_r04 measured (35 entries incl. the follow
# pipeline): emitted as its own subtotal so cross-round totals compare a
# FIXED workload — the headline list grows every round, and a growing
# total would otherwise read as a regression.
R4_COMPARABLE = {
    "agg_cohort_retention", "agg_event_funnel", "agg_grouping_sets",
    "agg_payment_volume", "agg_session_window", "explode_witnesses",
    "follow_pipeline_20k_blocks", "graph_pagerank", "hash_key_md5",
    "join_asof", "join_block_broadcast", "llm_ann_ivf", "llm_ann_lsh",
    "llm_bigram_topk", "llm_bm25_search", "llm_char_entropy",
    "llm_decontaminate", "llm_dedup_exact", "llm_dedup_minhash",
    "llm_dedup_ngram_jaccard", "llm_dedup_ngram_jaccard_capped",
    "llm_dup_clusters", "llm_inverted_index", "llm_kmeans_iter",
    "llm_minhash_signature", "llm_multimodal_features", "llm_semdedup",
    "llm_token_stats", "llm_topk_cosine", "llm_winnow_fingerprint",
    "topk_accounts", "tpch_q9_product_profit", "window_latest_per_key",
    "window_ntile_decile_scalable", "window_time_range_sum",
}

# The exact 52-entry workload BENCH_r05 measured (warm min-of-2), frozen
# verbatim so round 6+ totals compare min-of-2 vs min-of-2 on a FIXED set
# (the r4 subset only fixes the r4-era 36; this pins the round-5 additions
# too). CAVEAT (advisor, r6): the QUERY NAMES are frozen but two members
# changed registered semantics in round 6 — llm_minhash_verify and
# llm_dedup_pipeline gained per_doc_cap=8 (and the pipeline composed the
# exact-collapse pre-stage in round 7) — so r5-subset deltas across those
# rounds partially reflect the semantic change, not engine drift.
R5_COMPARABLE = R4_COMPARABLE | {
    "llm_semdedup_capped", "llm_minhash_verify", "llm_window_dedup",
    "llm_quantize_pq", "llm_ann_ivf_pq", "llm_dedup_pipeline",
    "llm_dedup_pipeline_staged", "llm_heavy_hitters_cms",
    "agg_hll_distinct", "llm_semantic_clusters", "llm_ann_recall",
    "zorder_layout_stats", "stream_late_replay", "stream_join_replay",
    "agg_histogram_quantiles", "join_bloom_prefilter",
    "agg_exact_median_refine",
}

# The exact 55-entry workload BENCH_r06 measured (warm_total 83.768):
# the r5 set plus the three round-6 additions. Frozen for round 7+
# like-for-like totals. CAVEAT: llm_dedup_pipeline composed the
# exact-collapse pre-stage in round 7 (faster by design, not drift).
R6_COMPARABLE = R5_COMPARABLE | {
    "llm_repetition_stats", "agg_reservoir_per_group",
    "llm_power_iteration",
}

# The exact 64-entry workload BENCH_r07 measured (warm_total 115.285,
# calib_sec 3.035): the r6 set plus the nine round-7 additions. Frozen
# for round 8+ — the first cross-round pair with calib_sec on BOTH
# sides, so compare_bench.py can finally divide host drift out of the
# total. CAVEAT: events_resample_interp went single-scan in round 8
# (faster by design, not drift).
R7_COMPARABLE = R6_COMPARABLE | {
    "llm_multimodal_decode_ppm", "llm_multimodal_decode_wav",
    "llm_power_iteration_2", "llm_shard_assign", "llm_vocab_growth",
    "llm_split_leakage_check", "llm_trigram_lm_score",
    "llm_incremental_dedup_bloom", "events_resample_interp",
}

# The round-8 headline set frozen for round 9+ like-for-like totals:
# the r7 set plus the forty-three round-8 additions (both sessions).
R8_COMPARABLE = R7_COMPARABLE | {
    "llm_multimodal_quarantine_ppm", "llm_multimodal_quarantine_wav",
    "llm_mixture_weights", "llm_quality_percentile", "llm_hard_negatives",
    "storage_compaction_plan", "llm_dedup_pipeline_star",
    "llm_repeated_span_scrub", "llm_dedup_containment",
    "join_interval_overlap", "dq_partition_skew", "events_cusum_alarm",
    "stream_cusum_replay", "stream_session_replay", "events_mad_outliers",
    "graph_k_core", "llm_dedup_edit_verify", "llm_logreg_train",
    "scd2_build", "pareto_frontier", "events_ewma", "events_acf",
    "dq_psi_drift", "llm_weighted_sample", "llm_naive_bayes_train",
    "llm_naive_bayes_score", "llm_pmi_collocations",
    "events_seasonal_profile", "agg_gini_by_group", "dq_benford",
    "llm_ngram_novelty", "events_trend_slope", "join_scd2_lookup",
    "graph_modularity", "agg_theil_index", "stream_scd2_replay",
    "llm_logreg_sweep", "agg_market_basket", "events_forecast_backtest",
    "llm_webdataset_index", "llm_webdataset_fetch",
    "llm_curation_end_to_end", "llm_shard_quarantine",
}

# The round-9 headline set frozen for round 10+ like-for-like totals
# (r9 measured warm 185.9 s over these 113 at calib 3.607 / calib_state
# 3.791). CAVEAT: the two PNG entries gained an ASCII-only doc filter in
# round 10 (oracle-correctness fix; ~no-op on the ASCII fixture).
R9_COMPARABLE = R8_COMPARABLE | {
    "llm_multimodal_decode_png", "llm_multimodal_quarantine_png",
    "llm_webdataset_index_capped", "llm_ann_graph_route",
    "llm_gzip_jsonl_roundtrip", "llm_gzip_quarantine",
}

R10_COMPARABLE = R9_COMPARABLE | {
    "llm_ann_graph_route_reuse", "llm_ann_index_append",
    "stream_ann_ingest_replay", "llm_gzip_jsonl_capped",
    "llm_gzip_quarantine_capped", "join_interval_overlap_capped",
    "llm_bpe_train", "llm_bpe_encode", "llm_bpe_compression_curve",
    "llm_audio_features", "llm_zip_shard_index", "llm_zip_quarantine",
    "llm_zip_index_capped", "llm_rrf_fusion", "llm_eval_pr_at_k",
    "llm_eval_ndcg", "dq_expectations", "llm_unigram_segment",
    "llm_unigram_nll", "llm_unigram_em",
    "dq_referential_integrity", "llm_bpe_fertility",
    "events_changepoint", "dq_k_anonymity", "llm_dataset_card",
    "dq_k_anonymity_suppress", "events_ohlc",
    "cdc_apply", "stream_cdc_replay", "window_rolling_median",
    "graph_resource_allocation", "join_spatial_radius",
    "storage_bucket_join", "graph_hits", "dq_l_diversity",
    "events_attribution", "llm_zipf_slope", "llm_eval_confusion",
    "storage_partition_prune", "llm_mmr_diversify",
    "cdc_snapshot_diff", "storage_schema_evolution",
    "events_markov_transitions", "llm_eval_calibration",
    "llm_eval_rbo", "events_conversion_latency",
    "stream_attribution_replay", "llm_random_projection",
    "events_funnel_timed", "graph_bfs_distance",
    "llm_uncertainty_sample",
    # added in r10's final commit, restored here in r11 (ADVICE r10: it
    # was an oversight, not an exclusion — same driver-side greedy-loop
    # shape as llm_mmr_diversify, which is in)
    "llm_kcenter_coreset",
}

R11_COMPARABLE = R10_COMPARABLE | {
    "llm_kcenter_coreset_batched", "llm_ann_graph_persist",
    "llm_vocab_kl_drift", "join_asof_tolerance",
    "graph_personalized_pagerank", "events_cuped",
}

R12_COMPARABLE = R11_COMPARABLE | {
    "llm_ann_ivf_pq_persist", "stream_heavy_hitters_replay",
    "stream_session_ooo_replay", "join_asof_nearest",
    "events_rfm_segments", "llm_ann_ivf_pq_append",
}

# Queries whose wall is dominated by Arrow/pandas Python workers — their
# cross-round deltas are normalized by calib_py_sec, not the JVM
# calib_sec (the r8 lesson: the JVM axis over-corrects them).
PY_BOUND = {
    "events_rfm_segments",  # 3 mapInPandas range-rank passes on a small table
    "llm_multimodal_features", "llm_multimodal_decode_ppm",
    "llm_multimodal_decode_wav", "llm_multimodal_decode_png",
    "llm_multimodal_quarantine_ppm", "llm_multimodal_quarantine_wav",
    "llm_multimodal_quarantine_png", "llm_webdataset_index",
    "llm_webdataset_index_capped", "llm_webdataset_fetch",
    "llm_curation_end_to_end", "llm_shard_quarantine",
    "llm_gzip_jsonl_roundtrip", "llm_gzip_quarantine",
    "llm_gzip_jsonl_capped", "llm_gzip_quarantine_capped",
    "llm_zip_shard_index", "llm_zip_index_capped", "llm_zip_fetch",
    "llm_zip_quarantine",
    "llm_multimodal_resize",
    "agg_reservoir_per_group",
}

SMALL_OUTPUT = {
    "llm_rrf_fusion", "llm_eval_pr_at_k", "llm_eval_ndcg",
    "dq_expectations", "llm_unigram_segment", "llm_unigram_nll",
    "llm_unigram_em", "dq_referential_integrity", "llm_bpe_fertility",
    "events_changepoint", "dq_k_anonymity", "llm_dataset_card",
    "dq_k_anonymity_suppress",
    "storage_bucket_join", "graph_resource_allocation",
    "window_rolling_median", "graph_hits", "dq_l_diversity",
    "events_attribution", "llm_zipf_slope", "llm_eval_confusion",
    "topk_accounts", "llm_topk_cosine", "llm_ann_lsh", "llm_ann_ivf",
    "graph_pagerank", "agg_event_funnel", "llm_bigram_topk",
    "llm_bm25_search", "llm_ann_ivf_pq", "llm_weighted_sample",
    "events_acf", "pareto_frontier", "agg_gini_by_group", "dq_benford",
    "graph_modularity", "agg_theil_index",
}


# Normalized-flag floor (r12 verdict item 4a): SCALE_SOAK r12 measured a
# 3x wall spread on a data-free scheduler-bound job between consecutive
# windows, so sub-floor queries flag on scheduler latency, not plans —
# r12's driver artifact carried dq_k_anonymity_suppress at 2.72x with no
# code change, both walls under 1.4 s. A normalized flag is suppressed
# (counted, not listed) when BOTH the baseline and current walls are
# below this floor.
FLAG_FLOOR_SEC = 1.5


def adjudicate_flags(
    per_query: dict[str, float],
    axis_of: dict[str, str],
    axes: dict[str, float],
    drift: dict[str, float | None],
    now: dict[str, float],
    prev: dict[str, float],
    floor: float = FLAG_FLOOR_SEC,
    threshold: float = 1.25,
) -> tuple[dict[str, dict], int]:
    """Turn normalized per-query ratios into self-adjudicating flags
    (r12 verdict item 4): each surviving flag carries its calibration
    axis, that axis's baseline ratio AND intra-run drift (>= ~1.25
    drift voids the axis's flags — the run F lesson), and both raw
    walls, so the artifact explains itself without a human cross-
    referencing three files. Flags where both walls sit under ``floor``
    are suppressed as scheduler-latency noise; the count is returned so
    suppression is never silent."""
    flags: dict[str, dict] = {}
    suppressed = 0
    for q, r in sorted(per_query.items(), key=lambda kv: -kv[1]):
        if r <= threshold:
            continue
        if now.get(q, 0.0) < floor and prev.get(q, 0.0) < floor:
            suppressed += 1
            continue
        ax = axis_of[q]
        raw_prev, raw_now = prev.get(q), now.get(q)
        # a normalized flag whose RAW wall is flat-or-faster is the
        # axis divisor talking, not the query (the round-12 standard:
        # every state-axis flag with improving raw walls was phantom) —
        # label it so the artifact adjudicates itself
        verdict = (
            "raw_flat_axis_driven"
            if raw_prev and raw_now is not None
            and raw_now <= raw_prev * 1.1
            else "raw_slower"
        )
        flags[q] = {
            "norm_ratio": r,
            "axis": ax,
            "axis_ratio": round(axes[ax], 3),
            "axis_drift": drift.get(ax),
            "raw_prev": raw_prev,
            "raw_now": raw_now,
            "verdict": verdict,
        }
    return flags, suppressed


# How many flagged queries get one isolated end-of-run retry. Bounded so
# a badly drifted window can't double the bench wall.
FLAG_RETRY_CAP = 10


def adjudicate_retries(
    regressions: dict[str, dict],
    axes: dict[str, float],
    rerun,
    cap: int = FLAG_RETRY_CAP,
    threshold: float = 1.25,
) -> dict[str, dict]:
    """Second half of flag adjudication (r12 verdict item 4 follow-up):
    every round's SCALE_SOAK discipline is "flags are leads — isolated
    reruns adjudicate", so the bench now runs that rerun itself. Each
    flagged query (worst-first, up to ``cap``) is re-executed once after
    the main loop; the retry wall re-normalizes against the same
    baseline and axis, and a flag whose retry ratio falls under
    ``threshold`` moves to the returned cleared-map — an intra-run spike
    (scheduler stall, a neighbour tenant's burst) caught in the act. A
    flag that SURVIVES its retry is the real signal worth a human look:
    same window, same host, still slow. Flags keep ``retry_wall`` /
    ``retry_norm_ratio`` either way; the primary ``timings`` are never
    rewritten, so totals stay comparable across rounds. ``rerun`` is a
    callable(name) -> wall-seconds (injectable for tests)."""
    cleared: dict[str, dict] = {}
    for q in list(regressions)[:cap]:
        f = regressions[q]
        try:
            rw = round(float(rerun(q)), 3)
        except Exception:  # noqa: BLE001 — a retry must never kill the run
            continue
        f["retry_wall"] = rw
        rn = None
        if f.get("raw_prev") and axes.get(f.get("axis")):
            rn = round((rw / f["raw_prev"]) / axes[f["axis"]], 3)
        f["retry_norm_ratio"] = rn
        if rn is not None and rn <= threshold:
            cleared[q] = regressions.pop(q)
    return cleared


def current_round(here: str) -> int:
    """The round currently RUNNING, inferred from driver artifacts: one
    past the newest CORRECTNESS_r{N}.json (the driver commits a round's
    artifacts at round END, so while round N runs the newest correctness
    file is r{N-1}). Returns a large sentinel when no artifacts exist so
    no stamp is excluded."""
    rounds = []
    for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)", os.path.basename(p))
        if m:
            rounds.append(int(m.group(1)))
    return (max(rounds) + 1) if rounds else 1 << 30


def pick_baseline_stamp(here: str) -> str | None:
    """Choose the comparison baseline for normalized ratios: the newest
    committed run-stamped BENCH_DETAIL_r{NN}.json from a PRIOR round.

    Same-round stamps are excluded (r11 verdict task 3): in round 11 the
    builder committed a clean same-round stamp hours before the driver's
    bench run, and the newest-stamp rule normalized the driver's run
    against it — measuring one hour of host drift instead of
    round-over-round change (the artifact's norm_prev_shared_ratio read
    1.287 while driver-to-driver was 1.00). Stamps whose round is >= the
    currently-running round are therefore skipped, and stamps whose
    suffix has no digits (e.g. a stray BENCH_DETAIL_rX.json) are ignored
    rather than crashing the run (ADVICE r11, bench.py:613)."""
    cur = current_round(here)
    stamped = []
    for p in glob.glob(os.path.join(here, "BENCH_DETAIL_r*.json")):
        m = re.search(r"_r(\d+)", os.path.basename(p))
        if not m or int(m.group(1)) >= cur:
            continue
        stamped.append((int(m.group(1)), os.path.basename(p), p))
    return max(stamped)[2] if stamped else None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen once so per-query numbers measure the plan,
    # not first-call classloading
    QUERIES["topk_accounts"].spark_fn(spark, sf_dir).collect()
    # ... and the Arrow/pandas worker pool, so mapInPandas queries measure
    # the pipeline rather than Python worker spin-up
    import pandas as _pd  # noqa: F401

    spark.range(1_000).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    # Host-speed calibration: a fixed, data-free, pure whole-stage-codegen
    # job whose work is identical every round. Round 7 measured the SAME
    # code+data wall drifting 4x across a 2 h window on this shared VM
    # (SCALE_SOAK.md "host-clock honesty") — cross-round wall comparisons
    # are only meaningful relative to this number (a round whose calib_sec
    # is 2x another round's ran on an effectively 2x-slower host).
    def run_calib() -> float:
        t0 = time.time()
        # modular so the ANSI-mode sum cannot overflow int64
        spark.range(20_000_000_000).selectExpr(
            "sum(pmod(id * 31 + 7, 997)) AS s"
        ).collect()
        return time.time() - t0

    calib = round(min(run_calib(), run_calib()), 3)

    # Second calibration for the PYTHON-worker path: round 8 found that
    # dividing by the JVM calib over-corrects queries dominated by
    # Arrow/pandas workers (their raw walls were flat while the JVM got
    # 23% faster). A fixed mapInPandas job measures that axis separately
    # — normalize mapInPandas-bound queries by calib_py_sec, JVM-bound
    # ones by calib_sec.
    def run_calib_py() -> float:
        import numpy as _np

        def work(it):
            for pdf in it:
                v = pdf["id"].to_numpy()
                for _ in range(200):
                    v = (v * 31 + 7) % 997
                yield pdf.assign(id=v)

        t0 = time.time()
        spark.range(6_000_000).mapInPandas(work, "id long").selectExpr(
            "sum(id)"
        ).collect()
        return time.time() - t0

    calib_py = round(min(run_calib_py(), run_calib_py()), 3)

    # Third calibration axis: the STATE-STORE / checkpoint-I/O path.
    # r7/r8 both measured the streaming-replay walls moving 1.8-2.1x
    # with ZERO code changes — checkpoint commits and HDFS-backed state
    # I/O drift independently of both the JVM (calib_sec) and the
    # Python-worker (calib_py_sec) axes, and the replay family is now
    # 6 of the top-10 bench entries. A fixed 3-micro-batch stateful agg
    # (150k rows, 2000 keys, availableNow file source, real checkpoint
    # dir) measures exactly that work and nothing else.
    def run_calib_state() -> float:
        import shutil
        import tempfile

        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        base = tempfile.mkdtemp(prefix="bench_calib_state_")
        src = os.path.join(base, "src")
        os.makedirs(src)
        try:
            for i in range(3):
                ids = np.arange(50_000, dtype=np.int64) + i * 50_000
                p = os.path.join(src, f"b{i}.parquet")
                pq.write_table(pa.table({"k": ids % 2000, "v": ids}), p)
                os.utime(p, (1_000_000 + i, 1_000_000 + i))
            t0 = time.time()
            stream = (
                spark.readStream.schema("k long, v long")
                .option("maxFilesPerTrigger", "1")
                .parquet(src)
            )
            q = (
                stream.groupBy("k").agg({"v": "sum"})
                .writeStream.foreachBatch(
                    lambda df, bid: df.write.format("noop")
                    .mode("overwrite").save()
                )
                .outputMode("update")
                .option("checkpointLocation", os.path.join(base, f"ckpt{time.time_ns()}"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return time.time() - t0
        finally:
            shutil.rmtree(base, ignore_errors=True)

    calib_state = round(min(run_calib_state(), run_calib_state()), 3)

    def run_once(name: str) -> float:
        fn = QUERIES[name].spark_fn
        t0 = time.time()
        df = fn(spark, sf_dir)
        if name in SMALL_OUTPUT:
            df.collect()
        else:
            df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # Two runs per query: the FIRST (cold) run absorbs per-query JIT /
    # shuffle-service warm-up (measured at ~±50% on sub-second queries,
    # SCALE_SOAK.md round-4 addendum), the min (warm) is the steady-state
    # plan cost — both totals are emitted so cross-round comparisons can
    # use the steady-state number (r4 verdict task 4).
    # Per-query try/except: one broken query must cost its own number,
    # never the whole bench run (round-2 lesson: rc=1 -> zero data).
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        try:
            t1, t2 = run_once(name), run_once(name)
            cold[name] = round(t1, 3)
            timings[name] = round(min(t1, t2), 3)
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {e}"[:300]

    # INTRA-RUN drift probes (round 12): re-run each calibration once
    # after the query loop. The pre-run calibs capture the window the run
    # STARTED in; on a shared host the axes can move mid-run (round-12
    # measured the py axis 0.90 -> 2.61 and the state axis 2.86 -> 12.33
    # between consecutive full runs), which silently corrupts individual
    # per-query walls while the pre-run calib still looks clean. A
    # post/pre ratio far from 1.0 marks the whole run's flags as
    # untrustworthy BEFORE anyone adjudicates them query by query.
    # (Post probes are single-shot vs the pre probes' min-of-2, so the
    # ratio carries a mild upward bias — read >= ~1.5x as drift, not
    # the 1.0x-1.2x noise band.)
    calib_post = round(run_calib(), 3)
    calib_py_post = round(run_calib_py(), 3)
    calib_state_post = round(run_calib_state(), 3)

    # The reference's actual workload: the follower ETL itself. Drain 20k
    # synthetic blocks (chain DataSource, mock transport) through the full
    # per-batch dataflow (type dispatch -> explode -> edges/vertices ->
    # deterministic keys -> idempotent sink). The reference does >= 2 HTTP
    # round-trips per block on one thread; this measures our distributed
    # equivalent end-to-end, including the sink's anti-join.
    import shutil
    import tempfile

    from helium_arango_etl_lite_spark.sources.datasource import (
        HeliumChainDataSource,
    )
    from helium_arango_etl_lite_spark.streaming.follow import process_batch

    spark.dataSource.register(HeliumChainDataSource)

    # Partition sizing: the source default (64 heights/partition) amortizes
    # real RPC latency across many parallel tasks; the mock transport has
    # zero latency, so per-task overhead dominates instead — size to ~2
    # partitions per core (20k blocks / 313-height partitions = 5x faster
    # than the default here, measured).
    n_blocks = 20_000
    hpp = max(64, -(-n_blocks // (2 * spark.sparkContext.defaultParallelism)))

    def run_follow() -> float:
        out = tempfile.mkdtemp(prefix="bench_follow_")
        try:
            t0 = time.time()
            blocks = (
                spark.read.format("helium_chain")
                .option("endpoint", "mock://bench")
                .option("start", 1).option("end", n_blocks)
                .option("heights_per_partition", hpp)
                .load()
            )
            txns = (
                spark.read.format("helium_chain")
                .option("endpoint", "mock://bench").option("what", "txns")
                .option("start", 1).option("end", n_blocks)
                .option("heights_per_partition", hpp)
                .load()
            )
            process_batch(spark, blocks, txns, out)
            return time.time() - t0
        finally:
            shutil.rmtree(out, ignore_errors=True)

    try:
        f1, f2 = run_follow(), run_follow()
        cold["follow_pipeline_20k_blocks"] = round(f1, 3)
        timings["follow_pipeline_20k_blocks"] = round(min(f1, f2), 3)
    except Exception as e:  # noqa: BLE001
        errors["follow_pipeline_20k_blocks"] = f"{type(e).__name__}: {e}"[:300]

    # A total over fewer queries than expected is not comparable across
    # rounds — when anything errored, report the partial sum separately
    # and null the headline value so it can't be mistaken for a speedup.
    total = round(sum(timings.values()), 3)
    subtotals = {
        # fixed per-era workloads for apples-to-apples cross-round totals
        # (r5 warm baseline 92.102, r6 83.768, r7 115.285 @ calib 3.035)
        "warm_total_r4_subset": round(
            sum(v for q, v in timings.items() if q in R4_COMPARABLE), 3
        ),
        "warm_total_r5_subset": round(
            sum(v for q, v in timings.items() if q in R5_COMPARABLE), 3
        ),
        "warm_total_r6_subset": round(
            sum(v for q, v in timings.items() if q in R6_COMPARABLE), 3
        ),
        "warm_total_r7_subset": round(
            sum(v for q, v in timings.items() if q in R7_COMPARABLE), 3
        ),
        "warm_total_r8_subset": round(
            sum(v for q, v in timings.items() if q in R8_COMPARABLE), 3
        ),
        "warm_total_r9_subset": round(
            sum(v for q, v in timings.items() if q in R9_COMPARABLE), 3
        ),
        "warm_total_r10_subset": round(
            sum(v for q, v in timings.items() if q in R10_COMPARABLE), 3
        ),
        "warm_total_r11_subset": round(
            sum(v for q, v in timings.items() if q in R11_COMPARABLE), 3
        ),
        "warm_total_r12_subset": round(
            sum(v for q, v in timings.items() if q in R12_COMPARABLE), 3
        ),
    }

    # Calib-normalized per-query ratios vs the PREVIOUS round's committed
    # BENCH_DETAIL.json (r9 verdict task 6): each query's raw ratio is
    # divided by its family's calibration axis — calib_state_sec for the
    # *_replay family, calib_py_sec for PY_BOUND (Arrow/pandas-worker-
    # dominated), calib_sec for the rest — so a raw-tail outlier like
    # r9's llm_topk_cosine 1.70x is adjudicated by artifact instead of
    # the judge re-deriving it. Regressions > 1.25x normalized are
    # flagged by name; the full table lands in BENCH_DETAIL.json and the
    # printed line carries the count + the worst offenders.
    #
    # r10 verdict task 3: BENCH_DETAIL.json is the MUTABLE output (every
    # run overwrites it; gitignored so a driver run can't dirty the
    # committed tree), while the comparison BASELINE is read from the
    # newest committed run-stamped BENCH_DETAIL_r{NN}.json — immutable
    # once committed, re-baselined deliberately by committing a new stamp
    # from a clean uncontended run.
    here = os.path.dirname(os.path.abspath(__file__))
    detail_file = os.path.join(here, "BENCH_DETAIL.json")
    # newest PRIOR-round stamp (same-round stamps excluded, malformed
    # suffixes skipped) — see pick_baseline_stamp. NO fallback: when no
    # prior-round stamp exists, normalizing against the mutable
    # BENCH_DETAIL.json would measure hours of same-round host drift —
    # the exact failure the stamp rule exists to prevent (ADVICE r12) —
    # so normalization is skipped with an explicit reason instead.
    baseline_file = pick_baseline_stamp(here)
    norm_summary: dict = {}
    norm_detail: dict = {}
    try:
        if baseline_file is None:
            raise LookupError("no prior-round stamp")
        with open(baseline_file) as f:
            prev = json.load(f)
        if prev.get("sf") != (
            float(sf) if sf.replace(".", "").isdigit() else sf
        ):
            raise KeyError("prev detail is a different scale factor")
        axes = {
            "jvm": calib / prev["calib_sec"],
            "py": calib_py / prev["calib_py_sec"],
            "state": calib_state / prev["calib_state_sec"],
        }
        per_query: dict[str, float] = {}
        axis_of: dict[str, str] = {}
        pq = prev.get("queries", {})
        for q, new_t in timings.items():
            old_t = pq.get(q)
            if not old_t or old_t <= 0:
                continue
            axis = (
                "state" if "_replay" in q
                else "py" if q in PY_BOUND
                else "jvm"
            )
            per_query[q] = round((new_t / old_t) / axes[axis], 3)
            axis_of[q] = axis
        drift = {
            "jvm": round(calib_post / calib, 3) if calib else None,
            "py": round(calib_py_post / calib_py, 3) if calib_py else None,
            "state": round(calib_state_post / calib_state, 3)
            if calib_state else None,
        }
        regressions, n_suppressed = adjudicate_flags(
            per_query, axis_of, axes, drift, timings, pq
        )
        cleared = adjudicate_retries(regressions, axes, run_once)
        shared = [q for q in per_query]
        raw_ratio = (
            sum(timings[q] for q in shared) / sum(pq[q] for q in shared)
            if shared else None
        )
        norm_detail = {
            "baseline_file": os.path.basename(baseline_file),
            "prev_calib": {
                "calib_sec": prev["calib_sec"],
                "calib_py_sec": prev["calib_py_sec"],
                "calib_state_sec": prev["calib_state_sec"],
            },
            "axis_ratios": {k: round(v, 3) for k, v in axes.items()},
            "axis_of": axis_of,
            "per_query_normalized": per_query,
            "regressions_gt_1_25": regressions,
            "flag_floor_sec": FLAG_FLOOR_SEC,
            "flags_suppressed_below_floor": n_suppressed,
            "flags_cleared_by_retry": cleared,
            "shared_raw_total_ratio": (
                round(raw_ratio, 3) if raw_ratio else None
            ),
            "shared_norm_total_ratio": (
                round(raw_ratio / axes["jvm"], 3) if raw_ratio else None
            ),
        }
        norm_summary = {
            "norm_prev_shared_ratio": norm_detail["shared_norm_total_ratio"],
            "norm_regressions_gt_1_25": len(regressions),
            "norm_flags_suppressed_below_floor": n_suppressed,
            "norm_flags_cleared_by_retry": len(cleared),
            "norm_worst": {
                q: v["norm_ratio"]
                for q, v in list(regressions.items())[:3]
            },
        }
    except (
        OSError, KeyError, LookupError, json.JSONDecodeError,
        ZeroDivisionError,
    ) as exc:
        norm_summary = {
            "norm_prev_shared_ratio": None,
            "norm_skipped_reason": str(exc) or type(exc).__name__,
        }
    # Full per-query detail goes to a FILE: round 7's headline line (64
    # queries of timings) outgrew the driver's 2000-char tail capture,
    # leaving BENCH_r07.json with parsed=null — so the single printed
    # line must stay compact forever. The line carries the 15 most
    # expensive queries (the ones any plan audit starts from); the
    # complete map + cold walls + errors land in BENCH_DETAIL.json next
    # to this script (tools/compare_bench.py reads it when present and
    # can also regex-recover pairs from a truncated tail).
    top15 = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:15]
    )
    out = {
        "metric": "headline_queries_total_wall",
        "value": None if errors else total,
        "unit": "sec",
        "queries": top15,
        "queries_truncated_to": 15,
        "queries_detail_file": "BENCH_DETAIL.json",
        "warm_total": total,  # min-of-2 per query (steady-state)
        "cold_total": round(sum(cold.values()), 3),  # first-run incl. warm-up
        **subtotals,
        # fixed CPU-bound job (no data): divide totals by the ratio of two
        # rounds' calib_sec before calling a delta a regression/speedup;
        # calib_py_sec is the same idea for the Arrow/pandas worker path
        "calib_sec": calib,
        "calib_py_sec": calib_py,
        # fixed stateful-streaming job: normalize the *_replay family's
        # deltas by this, not by calib_sec (checkpoint/state-store I/O
        # is its own drift axis — measured 1.8-2.1x across r7/r8)
        "calib_state_sec": calib_state,
        # post-run re-probes: far-from-1.0 drift ratios mean the window
        # moved MID-RUN and the per-query flags need isolated reruns
        "calib_drift": {
            "jvm": round(calib_post / calib, 3) if calib else None,
            "py": round(calib_py_post / calib_py, 3) if calib_py else None,
            "state": round(calib_state_post / calib_state, 3)
            if calib_state else None,
        },
        "n_ok": len(timings),
        "n_errors": len(errors),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        **norm_summary,
    }
    if errors:
        out["partial_total"] = total
    detail = dict(out)
    detail["queries"] = timings
    detail["cold"] = cold
    if norm_detail:
        detail["normalized_vs_prev"] = norm_detail
    if errors:
        detail["errors"] = errors
    with open(detail_file, "w") as f:
        json.dump(detail, f, indent=1)
    line = json.dumps(out)
    # hard guarantee: the printed line fits the driver's tail capture
    # with headroom; drop the in-line query map entirely before ever
    # letting the line grow past it (the detail file keeps everything)
    if len(line) > 1800:
        out["queries"] = {}
        line = json.dumps(out)
    print(line)


if __name__ == "__main__":
    main()
