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
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) catalog table.

    ``sort_cols`` additionally sorts within each bucket file, upgrading
    later joins from hash to merge-without-sort and making per-key range
    scans sequential.
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key. With matching
    bucket specs Catalyst plans a SortMergeJoin with zero Exchange on
    either side (verify: no Exchange above either scan in .explain)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
