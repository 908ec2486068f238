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

Round-9 batch (applied): THE RE-VERIFICATION ROUND the r8 verdict
ordered — never-verified hit zero in round 8, so the batch is spent on
the independent-oracle backlog. Composition: the 6 brand-new round-9
entries (stdlib-zlib PNG decode, its corrupt-container quarantine twin,
member-capped WebDataset sharding, graph-routed ANN whose oracle
unrolls the beam-search walk, multi-member gzip JSONL round-trip and
its quarantine twin — never driver-verified), then the 5
entries whose CODE or ORACLE changed this round and need a fresh
independent row (the four tar-shard entries moved to byte-based
strlen()/octet_length() oracles and gained the trailing-partial-block
truncation guard; llm_weighted_sample now fixed-points its selection
key before the top-k), then ALL 33 r4-era re-checks (the entries whose
newest driver row was 5 rounds old — llm_knn_join, llm_decontaminate,
llm_bm25_search, graph_pagerank, the six TPC-H shapes, both window
entries, and the rest), then the 6 alphabetically-first r5-era entries
that fit the remaining slots (the other 43 r5-era entries rotate to
round 10). After this batch lands, zero catalog entries have a newest
driver row older than r5. The full catalog is still locally replicated
green every round — tools/driver_replica.py.
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

DRIVER_BATCH: list[str] = [
    # -- new this round (6): never driver-verified ----------------------
    "llm_multimodal_decode_png",
    "llm_multimodal_quarantine_png",
    "llm_webdataset_index_capped",
    "llm_ann_graph_route",
    "llm_gzip_jsonl_roundtrip",
    "llm_gzip_quarantine",
    # -- changed this round (5): byte-based tar oracles + truncation
    #    guard; fixed-point weighted-sample selection key ---------------
    "llm_webdataset_index",
    "llm_webdataset_fetch",
    "llm_curation_end_to_end",
    "llm_shard_quarantine",
    "llm_weighted_sample",
    # -- re-checks (33): every entry whose newest driver row is r4 ------
    "agg_grouped_topn",
    "graph_pagerank",
    "graph_triangle_count",
    "join_outer_reconcile",
    "join_semi_urgent",
    "llm_bigram_topk",
    "llm_blocklist_filter",
    "llm_bm25_search",
    "llm_bpe_pair_counts",
    "llm_centroid_assign",
    "llm_cross_dedup",
    "llm_dataset_split",
    "llm_decontaminate",
    "llm_dedup_exact_norm",
    "llm_doc_pack",
    "llm_frame_sample",
    "llm_inverted_index",
    "llm_knn_join",
    "llm_knn_join_bucketed",
    "llm_length_histogram",
    "llm_quantize_int8",
    "llm_regex_scrub",
    "llm_repetition_score",
    "llm_sample_stratified",
    "llm_tfidf_topk",
    "tpch_q18_large_orders",
    "tpch_q1_pricing",
    "tpch_q3_priority",
    "tpch_q4_order_priority",
    "tpch_q5_region_volume",
    "tpch_q6_forecast",
    "window_moving_avg",
    "window_running_sum",
    # -- re-checks (6): the alphabetically-first r5-era entries;
    #    the remaining 43 rotate to round 10 (tools/batch_staleness.py) -
    "agg_grouping_sets",
    "agg_payment_volume",
    "agg_stats_profile",
    "agg_string_agg",
    "argmin_cheapest_supplier",
    "events_anomaly_zscore",
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
