"""Focused tests for streaming/tuning.py (optimization round 13): the
size-derived stateful-shuffle partition count and the scoped conf."""
import os

import pytest

from helium_arango_etl_lite_spark.streaming.tuning import (
    stream_partitions,
    stream_shuffle_partitions,
)


def _mkfile(path, n):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"\0" * n)


def test_floor_for_tiny_sources(tmp_path):
    _mkfile(str(tmp_path / "src" / "b0.parquet"), 1024)
    assert stream_partitions(str(tmp_path / "src")) == 8


def test_scales_linearly_with_bytes(tmp_path, monkeypatch):
    # 1 MB target so the test doesn't write gigabytes: 10 MB -> 10 parts
    monkeypatch.setenv("SPARK_GRAFT_STREAM_TARGET_MB", "1")
    _mkfile(str(tmp_path / "a" / "x"), 10 * (1 << 20))
    assert stream_partitions(str(tmp_path / "a")) == 10
    # multiple source dirs sum (the stream-stream join case)
    _mkfile(str(tmp_path / "b" / "y"), 6 * (1 << 20))
    assert stream_partitions(str(tmp_path / "a"), str(tmp_path / "b")) == 16


def test_cap_and_floor_env_overrides(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_STREAM_TARGET_MB", "1")
    monkeypatch.setenv("SPARK_GRAFT_STREAM_MAX_PARTS", "8")
    _mkfile(str(tmp_path / "a" / "x"), 100 * (1 << 20))
    assert stream_partitions(str(tmp_path / "a")) == 8
    monkeypatch.setenv("SPARK_GRAFT_STREAM_MIN_PARTS", "16")
    _mkfile(str(tmp_path / "c" / "z"), 1)
    assert stream_partitions(str(tmp_path / "c")) == 16


def test_missing_dir_gives_floor(tmp_path):
    assert stream_partitions(str(tmp_path / "nope")) == 8


@pytest.mark.usefixtures()
def test_conf_scoped_and_restored(spark):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    with stream_shuffle_partitions(spark, 7):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    # restored even when the body raises
    with pytest.raises(RuntimeError):
        with stream_shuffle_partitions(spark, 9):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
