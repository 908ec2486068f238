"""The assembled follower service (reference etl.py:3-5 + Follower.run,
follower.py:55-75) — everything wired together:

    chain (JSON-RPC / mock) --readStream--> blocks micro-batches
        -> per-batch txn-envelope fetch (distributed DataSource read)
        -> graph transforms (operators/graph.py)
        -> idempotent block-bucketed sink (streaming/sink.py)
        -> retention partition drop (follower.py:210-214 analog)

Run offline/demo:  ``python -m helium_arango_etl_lite_spark --start 100
--end 160`` (mock chain); point ``--endpoint`` at a real node for live
follow. The checkpoint dir replaces the reference's ``follower_info``
resume doc; stop/restart continues where the last committed batch ended.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.datasource import HeliumChainDataSource
from .follow import process_batch, sync_state
from .sink import RETENTION_BLOCKS, apply_retention


def run_service(
    spark: SparkSession,
    out_dir: str,
    checkpoint_dir: str,
    endpoint: str = "mock://chain",
    start: int = 1,
    end: int | None = None,
    batch_heights: int = 32,
    retention_window: int = RETENTION_BLOCKS,
    poll_s: float = 0.5,
    timeout_s: float | None = None,
    strict_path0: bool = True,
) -> dict[str, int | None]:
    """Follow the chain from ``start`` and materialize the graph tables.

    With ``end`` set the service drains up to that height and returns
    (offline parity mode); without it, it follows until ``timeout_s``.
    Returns the final sync state (max block per edge table).
    """
    spark.dataSource.register(HeliumChainDataSource)

    reader = (
        spark.readStream.format("helium_chain")
        .option("endpoint", endpoint)
        .option("start", str(start))
        .option("max_heights_per_batch", str(batch_heights))
    )
    if end is not None:
        reader = reader.option("end", str(end))
    blocks_stream = reader.load()

    def batch_fn(batch_blocks: DataFrame, epoch_id: int) -> None:
        if batch_blocks.isEmpty():
            return
        bounds = batch_blocks.agg(
            F.min("height").alias("lo"), F.max("height").alias("hi")
        ).collect()[0]
        txns = (
            spark.read.format("helium_chain")
            .option("endpoint", endpoint)
            .option("what", "txns")
            .option("start", str(bounds["lo"]))
            .option("end", str(bounds["hi"]))
            .load()
        )
        process_batch(spark, batch_blocks, txns, out_dir, strict_path0=strict_path0)

    query = (
        blocks_stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="1 second")
        .start()
    )

    deadline = time.time() + timeout_s if timeout_s else None
    try:
        while query.isActive:
            state = sync_state(spark, out_dir)
            tip = state.get("payments")
            if end is not None and tip is not None and tip >= end:
                break
            if deadline is not None and time.time() > deadline:
                break
            time.sleep(poll_s)
    finally:
        query.stop()
        query.awaitTermination(30)

    state = sync_state(spark, out_dir)
    tip = max((h for h in state.values() if h is not None), default=None)
    if tip is not None:
        for table in ("payments", "poc_receipts"):
            apply_retention(spark, f"{out_dir}/{table}", tip, retention_window)
    return state
