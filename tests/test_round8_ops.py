"""Round-8 additions: parser guards from the round-7 ADVICE (PPM maxval,
WAV truncated-chunk, WAV empty-data) and the quarantine decode split
(oracle parity for the registered entries is covered by
test_oracle_parity.py; these pin the guard semantics and the plan
shapes the oracle can't express)."""

from __future__ import annotations

import io
import struct
from contextlib import redirect_stdout

import pytest

from helium_arango_etl_lite_spark.operators.llm import multimodal as mm
from helium_arango_etl_lite_spark.plans.queries import QUERIES

from test_round7_ops import _wav_bytes


def plan_of(spark, sf_dir, name: str) -> str:
    df = QUERIES[name].spark_fn(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_parse_ppm_rejects_out_of_range_maxval():
    raster16 = bytes(24)  # 2 bytes/sample form for maxval >= 256
    with pytest.raises(ValueError, match="maxval"):
        mm.parse_ppm(b"P6\n2 2\n999\n" + raster16)
    with pytest.raises(ValueError, match="maxval"):
        mm.parse_ppm(b"P6\n2 2\n0\n" + bytes(12))
    # 255 stays accepted
    meta, _ = mm.parse_ppm(b"P6\n2 2\n255\n" + bytes(12))
    assert meta["maxval"] == 255


def test_parse_wav_rejects_truncated_chunk():
    good = _wav_bytes(bytes([1, 2, 3, 4, 5, 6, 7, 8]))
    with pytest.raises(ValueError, match="truncated chunk"):
        mm.parse_wav(good[:-3])  # data declares 8 bytes, 5 remain
    # 16-bit odd-length truncation used to surface as an opaque numpy
    # frombuffer error; now it is the same typed ValueError
    good16 = _wav_bytes(struct.pack("<4h", 1, 2, 3, 4), bits=16)
    with pytest.raises(ValueError, match="truncated chunk"):
        mm.parse_wav(good16[:-1])


def test_parse_wav_empty_data_chunk_is_container_valid():
    meta, s = mm.parse_wav(_wav_bytes(b""))
    assert meta["sample_rate"] == 8000 and len(s) == 0


def test_quarantine_reason_codes_are_distinct_per_guard():
    cases = [
        (lambda: mm.parse_ppm(b"Q6\n1 1\n255\n" + bytes(3)), "bad_magic"),
        (lambda: mm.parse_ppm(b"P6\n1 1\n999\n" + bytes(6)), "bad_maxval"),
        (lambda: mm.parse_ppm(b"P6\n2 2\n255\n" + bytes(11)), "truncated"),
        (lambda: mm.parse_wav(b"RIFX" + bytes(40)), "not_riff"),
        (lambda: mm.parse_wav(_wav_bytes(b"abcd")[:-2]), "truncated"),
        (
            lambda: mm.parse_wav(
                b"RIFF" + struct.pack("<I", 4) + b"WAVE"
            ),
            "missing_chunk",
        ),
    ]
    for fn, code in cases:
        with pytest.raises((ValueError, NotImplementedError)) as ei:
            fn()
        assert mm.quarantine_reason(ei.value) == code, code
    # non-PCM is NotImplementedError (honest), classified not crashed
    nonpcm = bytearray(_wav_bytes(b"ab"))
    nonpcm[20] = 2  # fmt audio_format field -> ADPCM
    with pytest.raises(NotImplementedError) as ei:
        mm.parse_wav(bytes(nonpcm))
    assert mm.quarantine_reason(ei.value) == "non_pcm"


def test_quarantine_split_every_class_and_exact_ok_stats(spark):
    # one doc per corruption class (doc_id % 10 = 3,5,7,9) plus clean
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " * 3)
         for i in range(10, 20)],
        "doc_id long, text string",
    )
    wav = {
        r["media_id"]: r
        for r in mm.decode_wav_quarantine(
            mm.encode_wav_corrupted(docs)
        ).collect()
    }
    assert wav[13]["reason"] == "not_riff"
    assert wav[15]["reason"] == "non_pcm"
    assert wav[17]["reason"] == "truncated"
    assert wav[19]["reason"] == "empty_data"
    clean = [wav[i] for i in (10, 11, 12, 14, 16, 18)]
    text = "the quick brown fox jumps over the lazy dog " * 3
    expect = sum(ord(c) for c in text[:64])
    assert all(
        r["status"] == "ok" and r["n_samples"] == 64
        and r["sum_amp"] == expect
        for r in clean
    )
    ppm = {
        r["media_id"]: r
        for r in mm.decode_ppm_quarantine(
            mm.encode_ppm_corrupted(docs)
        ).collect()
    }
    assert ppm[13]["reason"] == "bad_magic"
    assert ppm[15]["reason"] == "bad_maxval"
    assert ppm[17]["reason"] == "truncated"
    assert ppm[19]["status"] == "ok"  # class 9 is WAV-only
    h = min(8, len(text) // 24)
    assert ppm[10]["n_pixels"] == 8 * h
    assert ppm[10]["sum_rgb"] == sum(ord(c) for c in text[: 24 * h])


def test_quarantine_entries_are_map_only(spark, sf_dir):
    """The quarantine split must keep the decode stage's shape: mapInPandas
    over the scan, no exchange of binary payloads, no join."""
    for name in (
        "llm_multimodal_quarantine_ppm",
        "llm_multimodal_quarantine_wav",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "hashpartitioning" not in plan, name
        assert "SortMergeJoin" not in plan, name
        assert "BroadcastHashJoin" not in plan, name


def test_mixture_weights_single_corpus_shuffle(spark, sf_dir):
    """One source-keyed partial agg over the corpus; every normalization
    join must broadcast (the per-source table is ~|sources| rows)."""
    plan = plan_of(spark, sf_dir, "llm_mixture_weights")
    # the per-source aggregate is localCheckpointed: every normalization
    # branch must read the checkpointed ~|sources|-row RDD, leaving ZERO
    # visible corpus scans (before the fix this plan scanned the parquet
    # four times — once per consumer of `per`)
    assert plan.count("Scan parquet") == 0
    assert "ExistingRDD" in plan
    assert "BroadcastNestedLoopJoin" in plan  # the two 1-row cross joins
    assert "SortMergeJoin" not in plan


def test_quality_percentile_no_corpus_sort(spark, sf_dir):
    """The percentile must come from the histogram join-back — a
    percent_rank-style sort of the corpus within source partitions is
    exactly the skew hazard this operator exists to avoid."""
    plan = plan_of(spark, sf_dir, "llm_quality_percentile")
    assert "BroadcastHashJoin" in plan      # histogram joins back broadcast
    assert "SortMergeJoin" not in plan
    # the only window runs over the <= |sources| x bins histogram rows,
    # which sit beneath a HashAggregate, never directly over the scan
    assert plan.count("Window (") <= 2  # cumulative + per-source total


def test_hard_negatives_no_cartesian(spark, sf_dir):
    """Mining runs on the sampled-GEMM shortlist: no corpus x corpus
    join may appear, and the rerank window is per-qid (bounded rows)."""
    plan = plan_of(spark, sf_dir, "llm_hard_negatives")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_compaction_plan_window_is_per_day_not_per_row(spark, sf_dir):
    """The unpartitioned running-sum window is safe ONLY because it runs
    over one row per day (bounded by time span, not corpus size): it
    must sit above the day-keyed aggregate in the plan."""
    plan = plan_of(spark, sf_dir, "storage_compaction_plan")
    # in the root-first tree the final group agg sits above the window,
    # and the window sits above the day-keyed aggregate that bounds its
    # input to one row per day
    tree = plan.split("\n\n")[0]
    assert tree.index("HashAggregate") < tree.index("Window")
    assert tree.rindex("HashAggregate") > tree.index("Window")
    assert "hashpartitioning" in plan  # the day agg exchange


def test_mixture_weights_invariants(spark, sf_dir):
    """mix_share sums to ~1 and the temperature tilts weights the right
    way: below-average sources get weight > 1, dominant ones < 1."""
    from helium_arango_etl_lite_spark.plans.queries import QUERIES

    rows = QUERIES["llm_mixture_weights"].spark_fn(
        spark, sf_dir
    ).collect()
    assert abs(sum(r["mix_share"] for r in rows) - 1.0) < 1e-4
    mean_share = 1.0 / len(rows)
    for r in rows:
        if r["share"] < mean_share:
            assert r["sample_weight"] > 1.0, r
        elif r["share"] > mean_share:
            assert r["sample_weight"] < 1.0, r


def test_quality_percentile_is_valid_percentile(spark, sf_dir):
    """Mid-bin percentiles are in (0,1) and monotone in the bin index
    within each source."""
    from collections import defaultdict

    from helium_arango_etl_lite_spark.plans.queries import QUERIES

    rows = QUERIES["llm_quality_percentile"].spark_fn(
        spark, sf_dir
    ).collect()
    per = defaultdict(dict)
    for r in rows:
        assert 0.0 < r["pct_in_source"] < 1.0
        per[r["source"]][r["q_bin"]] = r["pct_in_source"]
    for src, bins in per.items():
        ks = sorted(bins)
        assert all(
            bins[a] < bins[b] for a, b in zip(ks, ks[1:])
        ), src


def test_hard_negatives_are_below_dup_threshold(spark, sf_dir):
    from helium_arango_etl_lite_spark.plans.queries import QUERIES

    rows = QUERIES["llm_hard_negatives"].spark_fn(spark, sf_dir).collect()
    assert rows
    per_qid = {}
    for r in rows:
        assert r["qid"] % 4 == 0 and r["cos_sim"] < 0.98
        per_qid.setdefault(r["qid"], []).append(r)
    for qid, rs in per_qid.items():
        ranks = sorted(r["neg_rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        sims = [r["cos_sim"] for r in sorted(rs, key=lambda r: r["neg_rank"])]
        assert sims == sorted(sims, reverse=True)


def test_compaction_groups_are_contiguous_and_bounded(spark, sf_dir):
    from helium_arango_etl_lite_spark.plans.queries import QUERIES

    rows = sorted(
        QUERIES["storage_compaction_plan"].spark_fn(
            spark, sf_dir
        ).collect(),
        key=lambda r: r["group_id"],
    )
    assert rows[0]["group_id"] == 0
    for a, b in zip(rows, rows[1:]):
        assert b["group_id"] == a["group_id"] + 1
        assert a["last_day"] < b["first_day"]  # time order preserved
