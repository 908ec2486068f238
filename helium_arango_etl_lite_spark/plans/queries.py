"""Unified query catalog: importing the catalog modules populates QUERIES.

``queries()`` / ``oracle_sql()`` in ``__spark_entry__.py`` are thin views
over this registry.

Ordering policy
---------------
The grading driver writes CORRECTNESS rows for only the FIRST 50 entries
of ``queries()`` in registration order, while the catalog holds ~150. The
ordering below is a STATIC, COMMITTED list — no filesystem introspection,
no import-time I/O, fully deterministic (rounds 1-4 read the driver's own
CORRECTNESS artifacts at import to steer the batch; that made the public
ordering nondeterministic and permanently deprioritized once-verified
queries, so it was removed on advisor direction).

``DRIVER_BATCH`` is revised by hand each round when committing:

* queries that have never had a driver correctness row come first, so
  every entry is eventually independently verified;
* the tail slots are RE-CHECK slots holding previously-verified queries,
  rotated round-robin across rounds, so a regression in old queries is
  still caught by the driver's independent oracle over time (the local
  pytest replica ``tests/test_oracle_parity.py`` covers the whole catalog
  on every run regardless of this ordering).

Round-8 batch (applied): the brand-new round-8 entries (CUSUM alarms;
SCD2 build, distributed skyline, trailing EWMA, ACF, PSI drift;
weighted sampling, naive-Bayes train/score, PMI collocations, seasonal
profile; per-group Gini, Benford forensic profile, n-gram novelty,
trailing trend slope; SCD2 point-in-time lookup, community modularity,
Theil index; streaming SCD2 maintenance hash-verified against the
batch build; one-scan-per-step learning-rate sweep; market-basket
association rules; seasonal-naive forecast backtest; WebDataset tar
shard pack/index round-trip;
repeated-span scrub; shingle containment; interval-overlap join;
partition-skew pre-flight; quarantine decode for malformed media;
temperature-scaled mixture weights; histogram-based per-source quality
percentile; hard-negative mining from the exact sampled shortlist;
compaction planner; star-candidate dedup pipeline; shard fetch and the
end-to-end curation chain — never driver-verified), then the entries
whose CODE changed this round and therefore need a fresh independent row
(llm_shard_assign's moved column is now derived from the actual
reassignment; events_resample_interp shares one events scan via
localCheckpoint; both decode entries gained parser guards and the WAV
encoder an empty-doc filter), then the 3 stalest r4-era re-checks that
fit in the remaining slots (the round produced 43 never-verified
entries, so most of the r4-era backlog rotates to round 9 under the
never-verified-first policy; the full catalog is still locally
replicated green every round — tools/driver_replica.py).
"""

from __future__ import annotations

from .registry import QUERIES, QuerySpec, load_table  # noqa: F401
from . import catalog_core  # noqa: F401  (registers core queries)
from . import catalog_llm  # noqa: F401  (registers LLM queries)
from . import catalog_analytics  # noqa: F401  (registers analytics queries)
from . import catalog_tpch  # noqa: F401  (registers extended TPC-H shapes)
from . import catalog_round3  # noqa: F401  (set ops, range windows, LLM passes)
from . import catalog_round5  # noqa: F401  (two-stage verify, window dedup, PQ, funnel)
from . import catalog_round5b  # noqa: F401  (ANN recall, watermark replay, Z-order layout)
from . import catalog_round6  # noqa: F401  (repetition rules, reservoir sample, power iteration)
from . import catalog_round7  # noqa: F401  (real PPM/WAV decode, top-2 spectral directions)
from . import catalog_round8  # noqa: F401  (quarantine decode for malformed media)
from . import catalog_round8b  # noqa: F401  (robust stats, k-core, edit verify, LR train)
from . import catalog_round8c  # noqa: F401  (SCD2, skyline scan, EWMA, ACF, PSI drift)
from . import catalog_round8d  # noqa: F401  (weighted sample, naive Bayes, PMI, seasonal)
from . import catalog_round8e  # noqa: F401  (Gini, Benford, n-gram novelty, trend slope)
from . import catalog_round8f  # noqa: F401  (SCD2 lookup, modularity, Theil index)

DRIVER_BATCH: list[str] = [
    # -- new this round (18): never driver-verified --------------------
    "events_cusum_alarm",
    "stream_cusum_replay",
    "stream_session_replay",
    "events_mad_outliers",
    "graph_k_core",
    "llm_dedup_edit_verify",
    "llm_logreg_train",
    "llm_repeated_span_scrub",
    "llm_dedup_containment",
    "join_interval_overlap",
    "dq_partition_skew",
    "llm_multimodal_quarantine_ppm",
    "llm_multimodal_quarantine_wav",
    "llm_mixture_weights",
    "llm_quality_percentile",
    "llm_hard_negatives",
    "storage_compaction_plan",
    "llm_dedup_pipeline_star",
    # -- new in session 2 (24): never driver-verified ------------------
    "scd2_build",
    "pareto_frontier",
    "events_ewma",
    "events_acf",
    "dq_psi_drift",
    "llm_weighted_sample",
    "llm_naive_bayes_train",
    "llm_naive_bayes_score",
    "llm_pmi_collocations",
    "events_seasonal_profile",
    "agg_gini_by_group",
    "dq_benford",
    "llm_ngram_novelty",
    "events_trend_slope",
    "join_scd2_lookup",
    "graph_modularity",
    "agg_theil_index",
    "stream_scd2_replay",
    "llm_logreg_sweep",
    "agg_market_basket",
    "events_forecast_backtest",
    "llm_webdataset_index",
    "llm_webdataset_fetch",
    "llm_curation_end_to_end",
    "llm_shard_quarantine",
    # -- changed this round (4): code touched, need fresh driver rows --
    "llm_shard_assign",
    "events_resample_interp",
    "llm_multimodal_decode_ppm",
    "llm_multimodal_decode_wav",
    # -- re-check slots (3): last driver row is round 4 — the stalest
    #    entries in the catalog (tools/batch_staleness.py) -------------
    "agg_cohort_retention",
    "agg_cube",
    "agg_event_funnel",
    # (agg_grouped_topn, graph_pagerank, graph_triangle_count,
    # join_outer_reconcile,
    # join_semi_urgent,
    # llm_bigram_topk,
    # llm_blocklist_filter,
    # llm_bm25_search,
    # llm_bpe_pair_counts,
    # llm_centroid_assign, llm_cross_dedup,
    # llm_dataset_split, llm_decontaminate, llm_dedup_exact_norm,
    # llm_doc_pack, llm_frame_sample, llm_inverted_index, llm_knn_join,
    # llm_knn_join_bucketed, llm_length_histogram,
    # llm_quantize_int8, llm_regex_scrub, llm_repetition_score,
    # llm_sample_stratified, llm_tfidf_topk, tpch_q18_large_orders,
    # tpch_q1_pricing, tpch_q3_priority, tpch_q4_order_priority,
    # tpch_q5_region_volume, tpch_q6_forecast, window_moving_avg,
    # window_running_sum + the stalest r5-era entries displaced to next
    # round's rotation by the 43 new never-verified entries — the
    # never-verified-first policy above; every displaced entry is still
    # verified locally every round by tools/driver_replica.py)
]


def _apply_driver_batch() -> None:
    """Reorder QUERIES in place: DRIVER_BATCH first (in its committed
    order), everything else after in registration order. Unknown names in
    the batch are ignored so a catalog refactor cannot break import."""
    front = {n: QUERIES[n] for n in DRIVER_BATCH if n in QUERIES}
    rest = {n: s for n, s in QUERIES.items() if n not in front}
    QUERIES.clear()
    QUERIES.update(front)
    QUERIES.update(rest)


_apply_driver_batch()

__all__ = ["QUERIES", "QuerySpec", "load_table", "DRIVER_BATCH"]
