"""Streaming semantics tests (SURVEY.md section 2.6): watermarked windowed
aggregation with late-data drop, bounded-state streaming dedup, and the
applyInPandasWithState custom stateful operator. File-source streams with
maxFilesPerTrigger=1 make micro-batch boundaries deterministic."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType, TimestampType,
)

from helium_arango_etl_lite_spark.streaming import (
    dedup_within_watermark,
    running_totals,
    windowed_activity,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
    ]
)


def _ev(eid, ts, uid=1, etype="click", value=1.0):
    return {"event_id": eid, "ts": ts, "user_id": uid,
            "event_type": etype, "value": value}


def _land(dirpath, name, rows, mtime):
    p = os.path.join(dirpath, name)
    with open(p, "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows) + "\n")
    os.utime(p, (mtime, mtime))  # file source orders batches by mtime
    return p


def _run_stream(spark, src_dir, transform, output_mode):
    """availableNow + maxFilesPerTrigger=1: one micro-batch per file, in
    mtime order; capture each batch's output rows via foreachBatch."""
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src_dir)
    )
    batches: list[list] = []
    q = (
        transform(stream)
        .writeStream.foreachBatch(lambda df, eid: batches.append(df.collect()))
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return batches


def test_windowed_activity_drops_late_data(spark, tmp_path):
    src = str(tmp_path / "ev")
    os.mkdir(src)
    now = time.time()
    _land(src, "f1.jsonl", [
        _ev(1, "2024-01-01 10:05:00"),
        _ev(2, "2024-01-01 10:15:00"),
        _ev(3, "2024-01-01 11:05:00"),   # advances watermark to 10:05
    ], now - 30)
    _land(src, "f2.jsonl", [
        _ev(4, "2024-01-01 08:30:00"),   # late; wm filter lags one batch
        _ev(5, "2024-01-01 11:10:00"),
    ], now - 20)
    _land(src, "f3.jsonl", [
        _ev(6, "2024-01-01 08:40:00"),   # late beyond settled wm -> DROPPED
        _ev(7, "2024-01-01 11:20:00"),
    ], now - 10)

    batches = _run_stream(
        spark, src, lambda s: windowed_activity(s, watermark="1 hour"), "update"
    )
    non_empty = [b for b in batches if b]
    assert len(non_empty) >= 3, "expected one micro-batch per file"
    b1 = {str(r["window_start"]): r for r in non_empty[0]}
    b3 = {str(r["window_start"]): r for r in non_empty[2]}

    assert b1["2024-01-01 10:00:00"]["n_events"] == 2
    assert b1["2024-01-01 11:00:00"]["n_events"] == 1
    # The watermark filter applies with one batch of propagation delay
    # (the filter for batch N uses the watermark settled before batch N-1
    # completed), so event 4 may still land; event 6 at 08:40 arrives when
    # the settled watermark is 10:05 and MUST be dropped: batch 3 updates
    # only the on-time window.
    assert set(b3) == {"2024-01-01 11:00:00"}
    assert b3["2024-01-01 11:00:00"]["n_events"] == 3
    # the 08:00 window never saw event 6: at most one update with n=1
    for b in non_empty:
        d = {str(r["window_start"]): r for r in b}
        if "2024-01-01 08:00:00" in d:
            assert d["2024-01-01 08:00:00"]["n_events"] == 1


def test_dedup_within_watermark_bounded_state(spark, tmp_path):
    src = str(tmp_path / "ev")
    os.mkdir(src)
    now = time.time()
    _land(src, "f1.jsonl", [
        _ev(1, "2024-01-01 10:00:00"),
        _ev(1, "2024-01-01 10:01:00"),   # dup in same batch
        _ev(2, "2024-01-01 10:02:00"),
    ], now - 20)
    _land(src, "f2.jsonl", [
        _ev(1, "2024-01-01 10:03:00"),   # dup across batches, within watermark
        _ev(3, "2024-01-01 10:04:00"),
    ], now - 10)

    batches = _run_stream(
        spark, src,
        lambda s: dedup_within_watermark(s, ["event_id"], watermark="1 hour"),
        "append",
    )
    seen = [r["event_id"] for b in batches for r in b]
    assert sorted(seen) == [1, 2, 3]


def test_running_totals_stateful(spark, tmp_path):
    src = str(tmp_path / "ev")
    os.mkdir(src)
    now = time.time()
    _land(src, "f1.jsonl", [
        _ev(1, "2024-01-01 10:00:00", uid=1, value=1.0),
        _ev(2, "2024-01-01 10:01:00", uid=1, value=2.0),
        _ev(3, "2024-01-01 10:02:00", uid=2, value=3.0),
    ], now - 20)
    _land(src, "f2.jsonl", [
        _ev(4, "2024-01-01 10:03:00", uid=1, value=4.0),
    ], now - 10)

    batches = _run_stream(spark, src, running_totals, "update")
    non_empty = [b for b in batches if b]
    assert len(non_empty) >= 2
    b1 = {r["user_id"]: r for r in non_empty[0]}
    assert b1[1]["n_events_total"] == 2 and b1[1]["total_value"] == 3.0
    assert b1[2]["n_events_total"] == 1 and b1[2]["total_value"] == 3.0
    # state carries across micro-batches: user 1 accumulates
    b2 = {r["user_id"]: r for r in non_empty[1]}
    assert b2[1]["n_events_total"] == 3 and b2[1]["total_value"] == 7.0
    assert b2[1]["batch_rows"] == 1
    assert 2 not in b2  # user 2 absent from batch 2 -> no emission


def test_continuous_rollup_incremental_merge(spark, tmp_path):
    """Hypertable-style continuous aggregate: two micro-batches (the second
    overlapping the first's hour bucket AND adding a new day) must merge to
    exactly the batch-recompute result, rewriting only affected day
    partitions."""
    from helium_arango_etl_lite_spark.streaming.rollup import continuous_rollup

    src = str(tmp_path / "ev")
    os.mkdir(src)
    now = time.time()
    _land(src, "f1.jsonl", [
        _ev(1, "2024-01-01 10:05:00", etype="click", value=1.0),
        _ev(2, "2024-01-01 10:20:00", etype="click", value=2.0),
        _ev(3, "2024-01-01 11:05:00", etype="view", value=3.0),
    ], now - 20)
    _land(src, "f2.jsonl", [
        _ev(4, "2024-01-01 10:40:00", etype="click", value=4.0),  # merges into 10:00
        _ev(5, "2024-01-02 09:00:00", etype="click", value=5.0),  # new day partition
    ], now - 10)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    out = str(tmp_path / "rollup")
    q = continuous_rollup(spark, stream, out, str(tmp_path / "ckpt"))
    q.awaitTermination()

    got = {
        (str(r["bucket"]), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        ("2024-01-01 10:00:00", "click"): (3, 7.0),
        ("2024-01-01 11:00:00", "view"): (1, 3.0),
        ("2024-01-02 09:00:00", "click"): (1, 5.0),
    }
    days = {n for n in os.listdir(out) if n.startswith("bucket_day=")}
    assert days == {"bucket_day=2024-01-01", "bucket_day=2024-01-02"}
