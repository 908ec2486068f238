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
from pyspark.sql import types as T


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

    The fill carries ONE STRUCT per right row (timestamp + all value
    columns together), not per-column fills: an ignorenulls fill per
    column would skip a NULL value in the newest prior row and carry a
    STALER row's value for that column only — splicing columns from
    different right rows and, under ``tolerance``, certifying a
    beyond-tolerance value as fresh (review r11). The struct is
    non-null for every right row even when its members are null, so
    the filled struct is always exactly the newest prior right row —
    matching SQL ASOF JOIN, which attaches whole rows.
    """
    left_cols = left.columns
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(right_ts).alias("__rts"),
            *[F.col(c) for c in value_cols],
        ).alias("_vals"),
        *[F.lit(None).alias(c) for c in left_cols if c != key],
    )
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None)
        .cast(
            T.StructType(
                [T.StructField("__rts", right.schema[right_ts].dataType)]
                + [
                    T.StructField(c, right.schema[c].dataType)
                    for c in value_cols
                ]
            )
        )
        .alias("_vals"),
        *[F.col(c) for c in left_cols if c != key],
    )
    unioned = r.unionByName(l)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        F.last(F.col("_vals"), ignorenulls=True).over(w).alias("_asof"),
    )
    out = filled.filter(F.col("_side") == 1)
    if tolerance is not None:
        fresh = F.col("_ts") - F.col("_asof.__rts") <= tolerance
        return out.select(
            *[F.col(c) for c in left_cols],
            *[
                F.when(fresh, F.col(f"_asof.{c}")).alias(c)
                for c in value_cols
            ],
        )
    return out.select(
        *[F.col(c) for c in left_cols],
        *[F.col(f"_asof.{c}").alias(c) for c in value_cols],
    )
