"""Bucketed table layout — shuffle-free co-located joins (SURVEY.md
section 4 "layout" + the 100 TB join strategy).

A 100 TB fact-to-fact join (payments x receipts on account, edges x
vertices on key) shuffles both sides on every query unless the layout
already co-locates join keys. Bucketing is Spark's persistent hash
partitioning: ``bucketBy(N, key)`` at write time hashes rows into N files
per partition; two tables bucketed by the same key with the same N join
bucket-to-bucket with NO Exchange — the single biggest repeated-query win
available at scale. (AQE can coalesce or skew-split shuffles, but only a
bucketed layout removes them.)

Bucketed tables must be saved via the catalog (``saveAsTable``) — plain
``parquet(path)`` cannot record bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
    partition_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) catalog table.

    ``sort_cols`` additionally sorts within each bucket file, upgrading
    later joins from hash to merge-without-sort and making per-key range
    scans sequential. ``path`` makes the table EXTERNAL at that
    location — callers that may run concurrently (pytest alongside the
    driver replica) must pass a per-process scratch path so two
    sessions' ``_temporary`` staging dirs cannot collide; ``mode=
    "append"`` with a matching bucket spec adds files to an existing
    table (the incremental-index ingest path). ``partition_cols``
    composes directory partitioning WITH bucketing: rows are laid out
    as ``<path>/<pcol>=<value>/bucket-files``, so an equality/IN filter
    on a partition column prunes whole directories at plan time
    (PartitionFilters in the scan) while joins on the bucket key stay
    shuffle-free within what survives pruning — the layout a persisted
    IVF index wants (partition by cell for probe pruning, bucket by id
    for fetch joins).
    """
    writer = df.write.format("parquet").mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer = writer.bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key. With matching
    bucket specs Catalyst plans a SortMergeJoin with zero Exchange on
    either side (verify: no Exchange above either scan in .explain)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Small-file compaction — the lakehouse maintenance pass every
    streaming/append sink eventually needs (our idempotent_append writes
    one file set per micro-batch; a day of micro-batches is thousands of
    KB-sized files whose per-file open/footer cost dominates scans).

    Rewrites ``path`` into ceil(bytes / target_bytes) files (coalesce —
    no shuffle — when only merging; repartitionByRange when ``sort_cols``
    asks for clustering, which buys parquet min/max row-group skipping on
    those columns). Returns the new file count. On Delta/Iceberg this is
    OPTIMIZE / rewrite_data_files; this is the plain-parquet equivalent,
    staged through a sibling temp dir then atomically swapped.
    """
    import math
    import os
    import shutil

    size = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(size / target_bytes))
    df = spark.read.parquet(path)
    if sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.coalesce(n_files)
    tmp = path.rstrip("/") + "._compact_tmp"
    out.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "._compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files
