"""Round-5 operators: two-stage MinHash verify, sliding-window substring
dedup, product quantization, and the quality-filter funnel.

Value correctness vs DuckDB is covered by test_oracle_parity (all four
register oracles); these tests pin the semantic invariants and the
physical plan shapes the 100 TB design depends on.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from helium_arango_etl_lite_spark.operators.llm import dedup, similarity
from helium_arango_etl_lite_spark.plans.queries import QUERIES


def plan_of(spark, sf_dir, name: str) -> str:
    df = QUERIES[name].spark_fn(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------------------
# semantic invariants
# ---------------------------------------------------------------------------

def test_minhash_verify_covers_exactly_the_candidate_pairs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cands = dedup.minhash_candidate_pairs(docs).collect()
    verified = dedup.minhash_verified_pairs(docs, threshold=0.8).collect()
    assert {(r.doc_a, r.doc_b) for r in cands} == {
        (r.doc_a, r.doc_b) for r in verified
    }
    for r in verified:
        # verified flag consistent with the reported jaccard (round-4dp
        # display can straddle the threshold only within rounding eps)
        if r.verified:
            assert r.jaccard >= 0.8 - 5e-5
        else:
            assert r.jaccard < 0.8 + 5e-5


def test_window_dup_stats_flags_shared_substrings(spark):
    shared = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, shared + " unique tail one two three four five six seven"),
        (2, shared + " completely different ending with other words here"),
        (3, "no overlap at all in this document text body whatsoever okay"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in dedup.window_dup_stats(df, window=32, stride=8).collect()}
    assert out[1].n_shared_windows > 0 and out[2].n_shared_windows > 0
    assert out[3].n_shared_windows == 0 and out[3].dup_ratio == 0.0
    for r in out.values():
        assert 0 <= r.n_shared_windows <= r.n_windows


def test_pq_codebook_members_reconstruct_exactly(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = similarity.pq_quantize(emb, n_blocks=4, n_codes=8)
    rows = {r.vec_id: r for r in out.filter(F.col("vec_id") < 8).collect()}
    ids = sorted(rows)
    assert len(ids) == 8
    # codebook = first 8 vectors by id: the k-th codebook member must snap
    # to its own slice in every block (distance 0) and report zero MSE
    for rank, vid in enumerate(ids):
        r = rows[vid]
        assert r.mse == 0.0
        assert (r.code_0, r.code_1, r.code_2, r.code_3) == (rank + 1,) * 4


def test_pq_codes_in_range_and_mse_nonnegative(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    for r in similarity.pq_quantize(emb).collect():
        for c in (r.code_0, r.code_1, r.code_2, r.code_3):
            assert 1 <= c <= 8
        assert r.mse >= 0.0


def test_funnel_is_monotone_and_chained(spark, sf_dir):
    out = sorted(
        QUERIES["llm_pipeline_funnel"].spark_fn(spark, sf_dir).collect(),
        key=lambda r: r.stage_idx,
    )
    assert [r.stage for r in out] == [
        "raw", "lang_en", "length_100_20000",
        "distinct_token_ratio", "exact_dedup_keeper",
    ]
    for prev, cur in zip(out, out[1:]):
        assert cur.rows_in == prev.rows_out  # stages chain exactly
        assert 0 <= cur.rows_out <= cur.rows_in
        assert cur.dropped == cur.rows_in - cur.rows_out


# ---------------------------------------------------------------------------
# plan shapes (the scale contract)
# ---------------------------------------------------------------------------

def test_pq_assignment_is_map_only(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "llm_quantize_pq")
    # codebook is resolved at build time (bounded 8-row collect); the
    # assignment itself must be a pure scan+project — no key shuffle, no
    # aggregation, no join (load_table's round-robin repartition for
    # small-file parallelism is the only Exchange allowed)
    assert "hashpartitioning" not in plan
    assert "HashAggregate" not in plan
    for node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert node not in plan
    assert "label" not in plan.split("ReadSchema:", 1)[1].splitlines()[0]


def test_window_dedup_joins_are_hash_not_nested_loop(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "llm_window_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_verify_prunes_with_semi_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "llm_minhash_verify")
    assert "LeftSemi" in plan  # shingle arrays built only for candidate docs
    assert "CartesianProduct" not in plan


def test_funnel_single_pass_no_joins(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "llm_pipeline_funnel")
    for node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert node not in plan


def test_adc_topk_invariants(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = similarity.pq_adc_topk(emb, k=10).collect()
    assert len(rows) == 10
    dists = [r.adc_dist for r in rows]
    assert dists == sorted(dists)  # ascending approximate distance
    assert all(d >= 0.0 for d in dists)
    # vectors snapping to the query's own codes have ADC distance 0 —
    # the query vector itself is excluded
    qid = min(r.vec_id for r in emb.select("vec_id").collect())
    assert all(r.vec_id != qid for r in rows)


def test_adc_scan_is_lookup_plus_topk(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "llm_ann_ivf_pq")
    # per-partition heaps + K-row merge, never a global sort; the scan is
    # map-only code lookups (no key shuffle, no join, no aggregation)
    assert "TakeOrderedAndProject" in plan
    assert "hashpartitioning" not in plan
    assert "HashAggregate" not in plan
    for node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert node not in plan


def test_dedup_pipeline_keeper_invariants(spark, sf_dir):
    out = QUERIES["llm_dedup_pipeline"].spark_fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert len(out) == docs.count()  # every document gets a verdict
    by_cluster = {}
    for r in out:
        assert r.cluster_id <= r.doc_id  # label = min reachable id
        assert r.keep == (r.cluster_id == r.doc_id)
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        keepers = [r for r in members if r.keep]
        assert len(keepers) == 1 and keepers[0].doc_id == cid


def test_cms_estimates_dominate_true_counts(spark, sf_dir):
    from helium_arango_etl_lite_spark.operators.llm import text as text_ops

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    est = {
        r.token: r.est_count
        for r in text_ops.cms_heavy_hitters(docs, k=20).collect()
    }
    true = {
        r.t: r.n
        for r in docs.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert est, "sketch returned nothing"
    for tok, e in est.items():
        assert e >= true[tok]  # CMS never underestimates
    # the true heaviest token cannot be missed by the sketch's top-k
    heaviest = max(true, key=lambda t: (true[t], t))
    assert heaviest in est


def test_cms_topk_is_broadcast_plus_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "llm_heavy_hitters_cms")
    assert "TakeOrderedAndProject" in plan  # no global sort for the top-k
    assert "BroadcastHashJoin" in plan      # cell table broadcasts
    assert "SortMergeJoin" not in plan


def test_hll_distinct_accuracy_and_register_bound(spark, sf_dir):
    from helium_arango_etl_lite_spark.operators.aggregates import (
        HLL_M, hll_distinct,
    )
    from helium_arango_etl_lite_spark.plans.registry import load_events

    ev = load_events(spark, sf_dir)
    out = hll_distinct(ev, group="event_type", value="user_id").collect()
    assert out
    for r in out:
        assert r.n_hll > 0
        # m=64 gives ~13% standard error; 3 sigma with margin
        assert r.rel_err < 0.5, (r.event_type, r.n_exact, r.n_hll)
    # the register table the estimate reduces from is bounded by m per
    # group no matter the cardinality — the whole point of the sketch
    from pyspark.sql import functions as SF
    from helium_arango_etl_lite_spark.functions.hashing import hash64

    h = hash64(SF.col("user_id").cast("string"))
    n_regs = (
        ev.select("event_type", (h % HLL_M).alias("b")).distinct()
        .groupBy("event_type").count().agg(SF.max("count")).collect()[0][0]
    )
    assert n_regs <= HLL_M


def test_hll_registers_merge_exactly(spark, sf_dir):
    """Mergeability is THE scale property: registers built on disjoint
    halves of the data and merged max-wise must equal registers built on
    the whole — so 1000 executors (or streaming micro-batches) can sketch
    independently and combine without revisiting values."""
    from pyspark.sql import functions as SF

    from helium_arango_etl_lite_spark.functions.hashing import hash64
    from helium_arango_etl_lite_spark.operators.aggregates import HLL_M
    from helium_arango_etl_lite_spark.plans.registry import load_events

    ev = load_events(spark, sf_dir)
    h = hash64(SF.col("user_id").cast("string"))
    w = SF.floor(h / HLL_M)
    rho = SF.when(w == 0, SF.lit(55)).otherwise(
        SF.lit(55) - SF.length(SF.bin(w)).cast("long")
    )
    base = ev.select("event_type", (h % HLL_M).alias("b"), rho.alias("rho"))

    def regs(df):
        return {
            (r.event_type, r.b): r.r
            for r in df.groupBy("event_type", "b").agg(SF.max("rho").alias("r")).collect()
        }

    # split by ROWS (not by bucket) so both halves hit the same registers
    # and the max-merge is actually exercised
    ev_id = SF.col("event_id")
    full = regs(base)
    base_a = ev.filter(ev_id % 2 == 0).select(
        "event_type", (h % HLL_M).alias("b"), rho.alias("rho")
    )
    base_b = ev.filter(ev_id % 2 == 1).select(
        "event_type", (h % HLL_M).alias("b"), rho.alias("rho")
    )
    half_a = regs(base_a)
    half_b = regs(base_b)
    merged = dict(half_a)
    for k, v in half_b.items():
        merged[k] = max(merged.get(k, 0), v)
    assert merged == full


def test_chunk_overlap_covers_every_token_exactly(spark, sf_dir):
    """Chunks must tile each document: consecutive chunks overlap by
    OVERLAP tokens, the last chunk may be short, and every token index
    is covered by >= 1 chunk."""
    from helium_arango_etl_lite_spark.plans.catalog_round5 import (
        _CHUNK, _CHUNK_STEP,
    )

    out = QUERIES["llm_chunk_overlap"].spark_fn(spark, sf_dir).collect()
    docs = {
        r.doc_id: len(r.text.split(" "))
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for did, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        n = docs[did]
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        for i, c in enumerate(chunks):
            start = i * _CHUNK_STEP  # 0-based
            assert c.n_tokens == min(_CHUNK, n - start)
        # full coverage: last chunk reaches the final token
        last = chunks[-1]
        assert (len(chunks) - 1) * _CHUNK_STEP + last.n_tokens == n


def test_chunk_overlap_is_map_only(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "llm_chunk_overlap")
    assert "hashpartitioning" not in plan
    assert "HashAggregate" not in plan
    for node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert node not in plan


def test_span_mask_deterministic_and_bounded(spark, sf_dir):
    q = QUERIES["llm_span_corruption_mask"].spark_fn
    a = {r.doc_id: r for r in q(spark, sf_dir).collect()}
    b = {r.doc_id: r for r in q(spark, sf_dir).collect()}
    assert a.keys() == b.keys()
    ratios = []
    for did, r in a.items():
        assert r == b[did]  # pure function of (doc_id, position)
        assert 0 <= r.n_masked <= r.n_tokens
        # spans are SPAN_LEN long, merged when overlapping, clipped at end
        assert r.n_masked <= 3 * r.n_spans
        if r.n_spans > 0:
            assert r.n_masked >= 1
        ratios.append(r.mask_ratio)
    # corpus-level mask rate should sit near spans/positions * len = 15%
    mean = sum(ratios) / len(ratios)
    assert 0.05 < mean < 0.30, mean


def test_span_mask_is_map_only(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "llm_span_corruption_mask")
    assert "hashpartitioning" not in plan
    assert "HashAggregate" not in plan
    for node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert node not in plan


def test_staged_pipeline_partitions_clusters_identically(spark, sf_dir):
    """The capped registered pipeline and the cap-free staged audit form
    must produce the same cluster partition on this corpus (both compose
    the exact-collapse pre-stage since round 7; the cap only bites when
    band-collision false positives crowd a doc's candidate list)."""
    capped = QUERIES["llm_dedup_pipeline"].spark_fn(spark, sf_dir).collect()
    staged = QUERIES["llm_dedup_pipeline_staged"].spark_fn(spark, sf_dir).collect()
    assert {(r.doc_id, r.cluster_id, r.keep) for r in capped} == {
        (r.doc_id, r.cluster_id, r.keep) for r in staged
    }


def test_flat_fixture_matches_composed_pipeline(spark, sf_dir):
    """Round-7 composition guard: folding the exact-collapse pre-stage
    into the registered llm_dedup_pipeline must not change its output —
    the truly-flat chain (kept as an unregistered fixture) and the
    composed form agree row-for-row, because verbatim copies always
    share signatures and the per-doc cap ranks by the same doc_b order
    either way on this corpus."""
    from helium_arango_etl_lite_spark.plans.catalog_round5 import (
        flat_dedup_pipeline,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    flat = flat_dedup_pipeline(docs).collect()
    composed = QUERIES["llm_dedup_pipeline"].spark_fn(spark, sf_dir).collect()
    assert {(r.doc_id, r.cluster_id, r.keep) for r in flat} == {
        (r.doc_id, r.cluster_id, r.keep) for r in composed
    }


def test_semantic_clusters_mutuality_and_representatives(spark, sf_dir):
    out = QUERIES["llm_semantic_clusters"].spark_fn(spark, sf_dir).collect()
    emb_n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(out) == emb_n
    by_cluster = {}
    for r in out:
        assert r.cluster_id <= r.vec_id
        assert r.is_representative == (r.cluster_id == r.vec_id)
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        reps = [r for r in members if r.is_representative]
        assert len(reps) == 1 and reps[0].vec_id == cid


def test_dup_clusters_converges_on_a_long_chain(spark):
    """The pointer-jumping regression guard: a 200-node path graph has
    diameter 199 — plain min-label propagation capped at 20 iterations
    would emit split clusters; with path compression the whole chain
    must collapse to cluster 0 within the default budget."""
    n = 200
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["doc_a", "doc_b"]
    )
    labels = dedup.dup_clusters(pairs).collect()
    assert len(labels) == n
    assert {r.cluster_id for r in labels} == {0}


def test_knn_join_sampled_matches_full_exact(spark, sf_dir):
    """knn_join_sampled must equal knn_join restricted to sampled qids:
    per-partition top-k + bounded merge is exactly distributive, and the
    rounding/tie-break contract is shared. This is the invariant that
    lets the recall harness swap the corpus-broadcast GEMM for the
    query-broadcast linear scan at scale."""
    from helium_arango_etl_lite_spark.operators.llm import similarity
    from helium_arango_etl_lite_spark.plans.registry import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "embeddings")
    full = (
        similarity.knn_join(e, k=3, engine="arrow")
        .filter(F.pmod(F.col("qid"), F.lit(4)) == 0)
    )
    sampled = similarity.knn_join_sampled(e, k=3, sample_mod=4)
    a = sorted(map(tuple, full.collect()))
    b = sorted(map(tuple, sampled.collect()))
    assert a == b


def test_knn_join_sampled_caps_broadcast_side(spark, sf_dir):
    """The query sample collect must be bounded: exceeding
    max_sample_rows raises instead of silently collecting the corpus."""
    import pytest

    from helium_arango_etl_lite_spark.operators.llm import similarity
    from helium_arango_etl_lite_spark.plans.registry import load_table

    e = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="max_sample_rows"):
        similarity.knn_join_sampled(e, k=3, sample_mod=1, max_sample_rows=5)


def test_knn_join_sampled_empty_sample_returns_empty(spark, sf_dir):
    """A sample_mod no id satisfies (or an empty input) must yield an
    EMPTY result with the normal output schema, not a numpy AxisError
    from normalising a (0,)-shaped matrix."""
    from helium_arango_etl_lite_spark.operators.llm import similarity
    from helium_arango_etl_lite_spark.plans.registry import load_table

    e = load_table(spark, sf_dir, "embeddings")
    # ids are non-negative and bounded; a huge prime modulus with no
    # multiple in range selects nothing (0 always matches pmod, so shift
    # the frame's ids off zero first)
    from pyspark.sql import functions as F

    shifted = e.withColumn("vec_id", F.col("vec_id") + 1)
    out = similarity.knn_join_sampled(shifted, k=3, sample_mod=2_000_000_011)
    assert out.columns == ["qid", "nid", "cos_sim", "rank"]
    assert out.count() == 0


def test_bloom_prefilter_no_false_negatives(spark, sf_dir):
    """A Bloom filter may pass non-matches but must NEVER drop a true
    match: every true match passes, so n_pass >= n_true and
    n_false_pos == n_pass - n_true exactly."""
    from helium_arango_etl_lite_spark.plans.queries import QUERIES

    row = QUERIES["join_bloom_prefilter"].spark_fn(spark, sf_dir).collect()[0]
    assert row["n_pass"] >= row["n_true"]
    assert row["n_false_pos"] == row["n_pass"] - row["n_true"]
    assert 0.0 <= row["fp_rate"] <= 1.0


def test_histogram_quantiles_bracket_exact(spark, sf_dir):
    """The histogram estimate is a bin LOWER edge, so each estimated
    quantile must sit within one bin width below the exact quantile
    (rank-based, same ceil(q*n) rank the readout uses)."""
    from pyspark.sql import functions as F

    from helium_arango_etl_lite_spark.plans.queries import QUERIES
    from helium_arango_etl_lite_spark.plans.registry import load_table

    est = {
        r["q"]: r["est_price"]
        for r in QUERIES["agg_histogram_quantiles"].spark_fn(spark, sf_dir).collect()
    }
    prices = sorted(
        r[0]
        for r in load_table(spark, sf_dir, "lineitem")
        .select(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .collect()
    )
    n = len(prices)
    width_c = (prices[-1] - prices[0] + 1) / 128
    for q, e in est.items():
        exact_c = prices[-(-q * n // 100) - 1]  # ceil(q*n/100)-th order stat
        assert e * 100 <= exact_c + 1e-6
        assert exact_c - e * 100 <= width_c + 1e-6


def test_auto_planes_tracks_corpus_size():
    """The LSH plane count must grow with the corpus so expected bucket
    size stays ~LSH_TARGET_BUCKET_ROWS: a FIXED plane count makes the
    candidate join quadratic in disguise (3 planes soaked 44.4 s at 20k
    vectors vs 4.0 s with 10 — SCALE_SOAK.md)."""
    from helium_arango_etl_lite_spark.operators.llm.similarity import (
        LSH_MAX_PLANES, LSH_TARGET_BUCKET_ROWS, _auto_planes,
    )

    assert _auto_planes(1) == 3
    assert _auto_planes(2_000) == 3  # catalog scale: unchanged defaults
    assert _auto_planes(20_000) == 6
    assert _auto_planes(200_000) == 9
    assert _auto_planes(10_000_000) == 15
    assert _auto_planes(10**12) == LSH_MAX_PLANES
    for n in (1, 10**3, 10**6, 10**9):
        p = _auto_planes(n)
        # expected bucket size within 2x of target (up to the clamps)
        if 3 < p < LSH_MAX_PLANES:
            assert n / (1 << p) <= LSH_TARGET_BUCKET_ROWS
            assert n / (1 << (p - 1)) > LSH_TARGET_BUCKET_ROWS


def test_topk_composite_key_equals_lexsort_on_ties():
    """The argpartition kernel (round 8) must select and ORDER exactly
    like the lexsort it replaced — (rounded sim DESC, id ASC) — on the
    adversarial case: coarsely quantized sims with massive ties (the
    x100-duplication regime), shuffled non-contiguous ids, and a -inf
    self-mask hole. Property-checked against the naive reference."""
    import numpy as np

    from helium_arango_etl_lite_spark.operators.llm.similarity import (
        _id_rank_penalty, _topk_cols,
    )

    rng = np.random.default_rng(8)
    for trial in range(20):
        nq, nc = rng.integers(1, 40), int(rng.integers(2, 300))
        k = int(rng.integers(1, 12))
        # quantized to 1dp at round_dp=4: tie groups hundreds wide
        sims = np.round(rng.random((nq, nc)), 1)
        sims[rng.random((nq, nc)) < 0.02] = -np.inf
        ids = rng.choice(np.arange(0, 10 * nc, dtype=np.int64), nc,
                         replace=False)
        kk = min(k, nc)
        ref = np.lexsort((ids[None, :].repeat(nq, 0), -sims), axis=1)[:, :kk]
        got = _topk_cols(sims - _id_rank_penalty(ids, 4)[None, :], kk)
        assert np.array_equal(ref, got), f"trial {trial}"
