"""Tests for the bucketed-layout join path (no Exchange on either side)
and the ArangoDB bulk-import sink (batch rendering + distributed post)."""

from __future__ import annotations

import io
import json
import os
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from helium_arango_etl_lite_spark.operators.storage import (
    cobucketed_join, write_bucketed,
)
from helium_arango_etl_lite_spark.sinks import (
    arango_bulk_import, render_import_batches,
)
from helium_arango_etl_lite_spark.sinks.arango import import_url


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_cobucketed_join_has_no_exchange(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    write_bucketed(
        orders.select("o_orderkey", F.col("o_custkey").alias("custkey"), "o_totalprice"),
        "orders_b", ["custkey"], num_buckets=8, sort_cols=["custkey"],
    )
    write_bucketed(
        customer.select(F.col("c_custkey").alias("custkey"), "c_name"),
        "customer_b", ["custkey"], num_buckets=8, sort_cols=["custkey"],
    )
    # forbid broadcast so the test discriminates bucketing from small-table
    # shortcuts; restore after
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cobucketed_join(spark, "orders_b", "customer_b", on=["custkey"])
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "co-bucketed join still shuffles"
        assert "SelectedBucketsCount" in plan
        # and it computes the right thing
        n = joined.count()
        plain = orders.join(
            customer, orders["o_custkey"] == customer["c_custkey"]
        ).count()
        assert n == plain
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_render_import_batches_shapes():
    rows = [{"_key": f"k{i}", "v": i} for i in range(7)]
    payloads = list(render_import_batches(rows, batch_size=3))
    assert len(payloads) == 3  # 3 + 3 + 1
    docs = [json.loads(line) for p in payloads for line in p.decode().splitlines()]
    assert [d["_key"] for d in docs] == [f"k{i}" for i in range(7)]


def test_import_url_contract():
    url = import_url("http://db:8529/", "helium", "payments")
    assert url == (
        "http://db:8529/_db/helium/_api/import"
        "?collection=payments&type=documents&onDuplicate=ignore"
        "&complete=false&details=false"
    )


def test_arango_bulk_import_posts_from_executors(spark, tmp_path):
    """Injectable poster writes payloads to the shared FS — proves the
    partition fan-out, batching, and document rendering without a server."""
    out = str(tmp_path / "posts")
    os.mkdir(out)

    def fake_poster(url: str, payload: bytes) -> None:
        import uuid

        assert "/_api/import" in url and "onDuplicate=ignore" in url
        with open(os.path.join(out, uuid.uuid4().hex), "wb") as f:
            f.write(payload)

    df = spark.range(10).select(
        F.concat(F.lit("k"), F.col("id")).alias("_key"), F.col("id").alias("v")
    ).repartition(4)
    arango_bulk_import(
        df, "http://db:8529", "helium", "payments", batch_size=2, poster=fake_poster
    )

    docs = []
    for name in os.listdir(out):
        with open(os.path.join(out, name), "rb") as f:
            docs += [json.loads(x) for x in f.read().decode().splitlines()]
    assert sorted(d["_key"] for d in docs) == sorted(f"k{i}" for i in range(10))
    assert all(set(d) == {"_key", "v"} for d in docs)

def test_arango_writer_batches_and_accounts():
    """Task-level write(): bounded batches, exact doc accounting in the
    commit message."""
    from helium_arango_etl_lite_spark.sinks.arango import ArangoWriter

    writer = ArangoWriter(
        {"collection": "payments", "endpoint": "mock://db", "batch_size": "4"}
    )
    rows = [{"_key": f"k{i}", "amount": i} for i in range(10)]
    msg = writer.write(iter(rows))
    assert msg.docs == 10
    assert msg.batches == 3  # ceil(10 / 4)


def test_arango_datasource_write_path(spark, tmp_path):
    """df.write.format("arango"): the full executor write path runs (rows
    render, batches flow, commit aggregates) against a mock endpoint; the
    commit log records the job's import accounting."""
    from helium_arango_etl_lite_spark.sinks.arango import ArangoDataSource

    spark.dataSource.register(ArangoDataSource)
    log = tmp_path / "commits.jsonl"
    df = spark.range(100).select(
        F.format_string("k%d", "id").alias("_key"), F.col("id").alias("amount")
    )
    (
        df.write.format("arango")
        .option("collection", "payments")
        .option("endpoint", "mock://db")
        .option("batch_size", 16)
        .option("commit_log", str(log))
        .mode("append")
        .save()
    )
    (record,) = [json.loads(line) for line in log.read_text().splitlines()]
    assert record["collection"] == "payments"
    assert record["docs"] == 100
    assert record["tasks"] >= 1


def test_arango_datasource_rejects_overwrite(spark):
    import pytest

    from helium_arango_etl_lite_spark.sinks.arango import ArangoDataSource

    spark.dataSource.register(ArangoDataSource)
    df = spark.range(3).select(F.col("id").alias("_key"))
    with pytest.raises(Exception, match="append-only"):
        (
            df.write.format("arango")
            .option("collection", "payments")
            .mode("overwrite")
            .save()
        )


def test_compact_small_files_merges_and_preserves_rows(spark, tmp_path):
    from helium_arango_etl_lite_spark.operators.storage import compact_small_files

    path = str(tmp_path / "frag")
    # simulate many tiny micro-batch appends
    for i in range(8):
        spark.range(i * 100, (i + 1) * 100).withColumn(
            "k", F.col("id") % 7
        ).repartition(4).write.mode("append").parquet(path)
    import os

    before = sum(f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs)
    assert before >= 32
    rows_before = spark.read.parquet(path).count()

    n = compact_small_files(spark, path)
    after = sum(f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs)
    assert n == 1 and after == 1  # tiny data -> one target-size file
    assert spark.read.parquet(path).count() == rows_before


def test_compact_with_sort_clusters_ranges(spark, tmp_path):
    from helium_arango_etl_lite_spark.operators.storage import compact_small_files

    path = str(tmp_path / "frag2")
    spark.range(0, 10_000).withColumn("k", (F.col("id") * 37) % 1000).repartition(
        16
    ).write.parquet(path)
    compact_small_files(spark, path, target_bytes=16 * 1024, sort_cols=["k"])
    # each output file must hold a disjoint k-range (min/max skipping works)
    import duckdb

    spans = duckdb.sql(
        f"SELECT filename, min(k) AS lo, max(k) AS hi FROM "
        f"read_parquet('{path}/*.parquet', filename=true) GROUP BY 1 ORDER BY lo"
    ).fetchall()
    assert len(spans) > 1
    for (_, _, hi_prev), (_, lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next
