"""Continuous time-bucket rollup — the hypertable/continuous-aggregate
pattern (TimescaleDB-style) on Spark primitives.

A rollup table holds pre-aggregated (bucket, key) partials so dashboards
never re-scan raw events. Maintaining it incrementally under streaming
ingest needs an UPSERT of exactly the buckets each micro-batch touches:

1. aggregate the micro-batch to partial (bucket, key, count, sum);
2. read ONLY the affected bucket partitions of the rollup table
   (partition-pruned — the table is ``partitionBy(bucket_day)``);
3. merge partials (counts and sums are reassociable) and rewrite just
   those partitions via dynamic partition overwrite.

Cost per batch is proportional to the batch's time span, never the table
size — the property that makes continuous aggregates viable at 100 TB.
On Delta/Iceberg step 2+3 collapse into ``MERGE INTO``; the partition
algebra below is the same decision the MERGE planner makes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

DAY_COL = "bucket_day"


def _partials(batch: DataFrame, ts: str, key: str, value: str, bucket: str) -> DataFrame:
    return (
        batch.groupBy(
            F.date_trunc(bucket, F.col(ts)).alias("bucket"), F.col(key)
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(value).alias("sum_value"))
        .withColumn(DAY_COL, F.to_date("bucket"))
    )


def merge_rollup(
    spark: SparkSession,
    partials: DataFrame,
    path: str,
    key: str,
) -> None:
    """Merge batch partials into the rollup table, touching only the
    affected day partitions (read pruned, written with dynamic partition
    overwrite)."""
    partials = partials.cache()
    days = [r[0] for r in partials.select(DAY_COL).distinct().collect()]
    if not days:
        return
    merged = partials
    if os.path.isdir(path) and any(
        n.startswith(f"{DAY_COL}=") for n in os.listdir(path)
    ):
        existing = spark.read.parquet(path).filter(F.col(DAY_COL).isin(days))
        merged = (
            existing.unionByName(partials)
            .groupBy("bucket", key, DAY_COL)
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").alias("sum_value"),
            )
        )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(DAY_COL).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def continuous_rollup(
    spark: SparkSession,
    events_stream: DataFrame,
    path: str,
    checkpoint_dir: str,
    ts: str = "ts",
    key: str = "event_type",
    value: str = "value",
    bucket: str = "hour",
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain an hourly rollup table incrementally from a stream."""

    def batch_fn(batch: DataFrame, epoch_id: int) -> None:
        merge_rollup(spark, _partials(batch, ts, key, value, bucket), path, key)

    writer = events_stream.writeStream.foreachBatch(batch_fn).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
