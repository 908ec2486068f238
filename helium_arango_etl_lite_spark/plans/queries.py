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

Round-6 batch (applied): the 25 round-5 additions that registered after
the round-5 batch was committed (so they have never had a driver row),
then ``agg_approx_distinct_scale`` — re-checked because round 6 replaced
its rows-only HLL estimate with an oracle-checked error-band contract —
then the 3 brand-new round-6 entries (never verified), then 21 re-check
slots continuing the least-recently-verified rotation (all 21 are
r3-era entries, the oldest in the catalog; the remaining r3/r4-era
entries rotate in over rounds 7+).
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

DRIVER_BATCH: list[str] = [
    # -- never driver-verified after rounds 1-5 (25) ------------------
    "llm_minhash_verify",
    "llm_window_dedup",
    "llm_quantize_pq",
    "llm_pipeline_funnel",
    "llm_ann_ivf_pq",
    "udtf_sentence_split",
    "llm_dedup_pipeline",
    "llm_heavy_hitters_cms",
    "agg_hll_distinct",
    "llm_chunk_overlap",
    "llm_span_corruption_mask",
    "llm_dedup_pipeline_staged",
    "llm_semantic_clusters",
    "llm_ann_recall",
    "llm_ann_recall_sampled",
    "stream_late_replay",
    "zorder_layout_stats",
    "stream_dedup_replay",
    "stream_join_replay",
    "agg_histogram_quantiles",
    "join_bloom_prefilter",
    "llm_knn_label_accuracy",
    "agg_hll_set_algebra",
    "agg_exact_median_refine",
    "llm_embedding_drift",
    # -- re-oracled this round (1): rows-only HLL estimate replaced by
    #    an error-band contract the oracle value-hashes ----------------
    "agg_approx_distinct_scale",
    # -- new this round (3): never driver-verified ---------------------
    "llm_repetition_stats",
    "agg_reservoir_per_group",
    "llm_power_iteration",
    # -- re-check slots (21): previously-green, least-recently-verified
    #    first (all last checked r3), rotated each round ---------------
    "project_payment_edge",
    "concat_vertex_id",
    "derived_arithmetic",
    "null_tolerant_struct",
    "hash_key_md5",
    "udf_geo_index",
    "regexp_extract_height",
    "dropna_rows",
    "filter_type_dispatch",
    "filter_retention_window",
    "filter_is_valid",
    "explode_payments",
    "explode_witnesses",
    "join_block_broadcast",
    "union_distinct_vertices",
    "dedup_by_key",
    "anti_join_new_keys",
    "join_inventory_enrich",
    "agg_witness_quality",
    "agg_count_distinct",
    "agg_time_window",
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
