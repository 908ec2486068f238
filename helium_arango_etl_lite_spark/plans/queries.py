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

Standing staleness budget (round 11 onward)
-------------------------------------------
No entry's newest driver correctness row may be older than
``STALENESS_BUDGET_ROUNDS`` = 6 rounds. Six is not arbitrary: with ~290
catalog entries and 50 driver slots per round, a full rotation takes
ceil(290 / 50) = 6 rounds even with ZERO slots spent on new entries, so
6 is the tightest budget that is arithmetically satisfiable. (The
round-10 verdict suggested 4; 4 would require 290/4 ≈ 73 re-check slots
per round — more than the driver writes — so the committed budget is
the feasible one, and every new entry added to the catalog tightens the
rotation further. New-entry additions must stay small enough that
catalog_size / 50 ≤ 6.) ``tools/batch_staleness.py`` recomputes
newest-row ages from the CORRECTNESS_r*.json artifacts and asserts the
proposed batch (a) drains the oldest cohort first and (b) keeps the
post-round staleness floor within budget; run it whenever this list is
revised.

Round-11 batch (applied): exactly the 50 entries the round-10 verdict
prescribed, zero new entries — the 43 shapes whose newest driver row is
r5 (all fifteen extended TPC-H queries, the window family, semdedup /
kmeans / label-propagation / doc-pack, follow_replay, json_extract_props,
the sampling + mixture shapes) followed by the 7 round-10g/h entries
registered after the r10 batch froze and therefore never driver-verified
(RBO, conversion latency, JL projection, timed funnel, bounded BFS,
uncertainty sampling, k-center coreset). After this round every catalog
entry has at least one independent driver row and the staleness floor
rises from r5 to r6. Entries ADDED in round 11 (batched k-center,
persisted ANN graph, vocab KL drift, tolerance as-of join, personalized
PageRank, CUPED) are replica-verified this round
(tools/driver_replica.py) and take the front of the round-12 batch.
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
from . import catalog_round9  # noqa: F401  (PNG decode, capped shards, graph ANN)
from . import catalog_round10  # noqa: F401  (ANN build reuse, capped gzip, salted interval join)
from . import catalog_round10b  # noqa: F401  (zip container, RRF fusion, P/R@K eval)
from . import catalog_round10c  # noqa: F401  (CDC merge, spatial join, bucketed join)
from . import catalog_round10d  # noqa: F401  (HITS, l-diversity, attribution, Zipf)
from . import catalog_round10e  # noqa: F401  (partition pruning, MMR diversify)
from . import catalog_round10f  # noqa: F401  (snapshot diff, schema evolution)
from . import catalog_round10g  # noqa: F401  (RBO agreement, conversion latency)
from . import catalog_round10h  # noqa: F401  (JL projection, timed funnel, BFS)
from . import catalog_round11  # noqa: F401  (batched k-center, persisted ANN graph)

STALENESS_BUDGET_ROUNDS: int = 6

DRIVER_BATCH: list[str] = [
    # -- oldest cohort first (43): every entry whose newest driver row is
    #    r5, five rounds stale — the round-10 verdict's top ask. TPC-H
    #    extended shapes, the window family, graph + semdedup + sampling
    #    shapes, follow_replay. Zero code changes this round; these are
    #    pure re-verification slots. ------------------------------------
    "follow_replay",
    "graph_common_neighbors",
    "graph_degree_distribution",
    "graph_label_propagation",
    "join_salted_skew",
    "json_extract_props",
    "llm_ccnet_buckets",
    "llm_char_entropy",
    "llm_dedup_ngram_jaccard_capped",
    "llm_doc_pack_scalable",
    "llm_importance_sample",
    "llm_kmeans_iter",
    "llm_mix_rebalance",
    "llm_ngram_lm_score",
    "llm_oov_rate",
    "llm_paragraph_dedup",
    "llm_semdedup",
    "llm_semdedup_capped",
    "llm_seq_len_buckets",
    "set_ops_customers",
    "tpch_q2_min_cost_supplier",
    "tpch_q7_bilateral_volume",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_parts",
    "tpch_q12_late_priority",
    "tpch_q13_custdist",
    "tpch_q14_promo_share",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_variety",
    "tpch_q17_small_quantity",
    "tpch_q19_disjunctive_revenue",
    "tpch_q20_excess_suppliers",
    "tpch_q21_waiting_supplier",
    "tpch_q22_idle_customers",
    "window_first_last",
    "window_gap_islands",
    "window_ntile_decile",
    "window_ntile_decile_scalable",
    "window_rank_distribution",
    "window_sliding_time",
    "window_time_range_sum",
    # -- never driver-verified (7): round-10g/h entries registered after
    #    the r10 batch froze; replica-green only until now. -------------
    "llm_eval_rbo",
    "events_conversion_latency",
    "llm_random_projection",
    "events_funnel_timed",
    "graph_bfs_distance",
    "llm_uncertainty_sample",
    "llm_kcenter_coreset",
    # (round-11 additions — llm_kcenter_coreset_batched,
    # llm_ann_graph_persist, llm_vocab_kl_drift, join_asof_tolerance,
    # graph_personalized_pagerank and events_cuped — are intentionally
    # NOT in this batch
    # per the r10 verdict ("zero new entries in the batch"); they are
    # replica-verified this round and take the front of the round-12
    # batch. Changed-in-round-11 notes: llm_kcenter_coreset's traversal
    # moved to similarity.py:kcenter_coreset (shared with the batched
    # form) BEFORE its first driver row, so the batch verifies the
    # current code; llm_zipf_slope's code AND oracle switched to the
    # shared deterministic-ln pipeline (functions/detln.py, ADVICE r10)
    # after its r10 row — replica-green this round, joins the r12 batch
    # front with the two new entries; llm_ann_index_append's oracle
    # generator was refactored for sharing with byte-identical output,
    # which is no change.)
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

__all__ = [
    "QUERIES",
    "QuerySpec",
    "load_table",
    "DRIVER_BATCH",
    "STALENESS_BUDGET_ROUNDS",
]
