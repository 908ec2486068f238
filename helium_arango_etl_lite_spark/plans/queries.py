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

Round-5 batch: the 47 entries with no driver row after rounds 1-4, the
round-5 addition ``llm_semdedup_capped``, and two re-check slots
(``agg_payment_volume`` — core aggregate family, last checked r3;
``follow_replay`` — the end-to-end streaming pipeline, last checked r4).

Round-6 revision plan (apply AFTER the round-5 driver run records
CORRECTNESS_r05): front-load the 25 round-5 additions that registered
too late for this batch (``llm_minhash_verify``, ``llm_window_dedup``,
``llm_quantize_pq``, ``llm_ann_ivf_pq``, ``llm_pipeline_funnel``,
``llm_dedup_pipeline[_staged]``, ``llm_heavy_hitters_cms``,
``agg_hll_distinct``, ``llm_chunk_overlap``, ``llm_span_corruption_mask``,
``llm_semantic_clusters``, ``udtf_sentence_split``, ``llm_ann_recall``,
``llm_ann_recall_sampled``, ``stream_late_replay``,
``stream_dedup_replay``, ``stream_join_replay``,
``zorder_layout_stats``, ``agg_histogram_quantiles``,
``join_bloom_prefilter``, ``llm_knn_label_accuracy``,
``agg_hll_set_algebra``, ``agg_exact_median_refine``,
``llm_embedding_drift``), then
fill the remaining ~25 slots with re-checks round-robin by
least-recently-verified (continue the rotation started with the two
round-5 tail slots).
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

DRIVER_BATCH: list[str] = [
    # -- never driver-verified after rounds 1-4 (47) ------------------
    "json_extract_props",
    "argmin_cheapest_supplier",
    "window_ntile_decile",
    "tpch_q13_custdist",
    "agg_approx_distinct_scale",
    "window_ntile_decile_scalable",
    "llm_doc_pack_scalable",
    "graph_degree_distribution",
    "tpch_q2_min_cost_supplier",
    "tpch_q7_bilateral_volume",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_parts",
    "tpch_q12_late_priority",
    "tpch_q14_promo_share",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_variety",
    "tpch_q17_small_quantity",
    "tpch_q19_disjunctive_revenue",
    "tpch_q20_excess_suppliers",
    "tpch_q21_waiting_supplier",
    "tpch_q22_idle_customers",
    "set_ops_customers",
    "agg_grouping_sets",
    "window_time_range_sum",
    "window_rank_distribution",
    "agg_string_agg",
    "agg_stats_profile",
    "llm_char_entropy",
    "llm_seq_len_buckets",
    "llm_importance_sample",
    "llm_semdedup",
    "window_first_last",
    "llm_oov_rate",
    "llm_ngram_lm_score",
    "llm_paragraph_dedup",
    "llm_kmeans_iter",
    "window_sliding_time",
    "llm_mix_rebalance",
    "llm_dedup_ngram_jaccard_capped",
    "join_salted_skew",
    "graph_label_propagation",
    "llm_ccnet_buckets",
    "graph_common_neighbors",
    "window_gap_islands",
    "events_anomaly_zscore",
    # -- new this round (1) -------------------------------------------
    "llm_semdedup_capped",
    # -- re-check slots (2): previously-green, rotated each round -----
    "agg_payment_volume",
    "follow_replay",
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
