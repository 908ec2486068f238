"""Temporal joins — operators Spark's built-in join set lacks.

As-of join: for every left row, attach the MOST RECENT right row of the
same key with right.ts <= left.ts (the time-series/training-data staple:
price as of trade time, feature snapshot as of example time, latest prior
purchase per event).

Spark has no ASOF JOIN operator; the scalable composition is
**union + last-ignorenulls window**: tag both inputs, union them, and run
one window pass per key ordered by (ts, side) where right rows sort before
left rows at equal timestamps. Right-row values forward-fill; each left
row then reads the latest right value at or before its own timestamp.

Why not a range-join? ``left JOIN right ON key AND r.ts <= l.ts`` +
row_number explodes to O(|L| * avg right history) intermediate rows before
pruning; the union+window form moves each input row through the shuffle
exactly once — one sort per key partition, linear intermediate state. This
is the 100 TB shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    value_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance=None,
) -> DataFrame:
    """Left as-of join (right.ts <= left.ts, latest wins).

    ``right`` must be unique per (key, ts) — pre-aggregate ties (e.g.
    ``max_by``) so the result is deterministic; equal timestamps across
    sides match (right sorts first), mirroring SQL ``ASOF ... ON l.ts >=
    r.ts``. Output: every left row + the ``value_cols`` of its as-of
    match (NULL when no prior right row exists).

    ``tolerance`` (optional) is the max-staleness bound pandas calls
    ``merge_asof(tolerance=)``: a Column the engine can compare against
    ``left.ts - matched.right.ts`` (e.g. ``F.expr("INTERVAL 30
    MINUTES")`` for timestamps, a numeric literal for integer clocks).
    A match older than the bound is nulled — correct by construction
    because the as-of match IS the closest prior row, so nothing newer
    could have qualified instead. Same plan shape: the matched right
    timestamp rides the one forward-fill window; no extra shuffle.
    """
    left_cols = left.columns
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in value_cols],
        *[F.lit(None).alias(c) for c in left_cols if c != key],
    )
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
        *[F.col(c) for c in left_cols if c != key],
    )
    unioned = r.unionByName(l)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fill_cols = list(value_cols)
    if tolerance is not None:
        unioned = unioned.withColumn(
            "_rts", F.when(F.col("_side") == 0, F.col("_ts"))
        )
        fill_cols.append("_rts")
    filled = unioned.select(
        "*",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in fill_cols
        ],
    )
    if tolerance is not None:
        fresh = F.col("_ts") - F.col("_asof__rts") <= tolerance
        return filled.filter(F.col("_side") == 1).select(
            *[F.col(c) for c in left_cols],
            *[
                F.when(fresh, F.col(f"_asof_{c}")).alias(c)
                for c in value_cols
            ],
        )
    return filled.filter(F.col("_side") == 1).select(
        *[F.col(c) for c in left_cols],
        *[F.col(f"_asof_{c}").alias(c) for c in value_cols],
    )
