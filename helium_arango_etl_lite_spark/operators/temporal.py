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

# scratch column names the union+window plan injects; user columns of
# these names would be silently shadowed, so both joins reject them
_RESERVED = ("_ts", "_side", "_vals", "_asof", "_back", "_fwd")


def _check_reserved(left: DataFrame, right: DataFrame) -> None:
    clash = [
        c for c in _RESERVED if c in left.columns or c in right.columns
    ]
    if clash:
        raise ValueError(
            f"as-of join inputs use reserved internal column names "
            f"{clash}; rename them before joining"
        )


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
    _check_reserved(left, right)
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


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    value_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Left as-of join, NEAREST direction (pandas
    ``merge_asof(direction="nearest")``): each left row attaches the
    right row of the same key whose timestamp is closest in EITHER
    direction; exact ties go to the prior (backward) row, matching the
    convention the backward form establishes for equal timestamps.

    Same one-shuffle plan as :func:`asof_join`: tag, union, and run BOTH
    fills over the SAME (key, ts, side) sort — a backward
    last-ignorenulls over the preceding frame and a forward
    first-ignorenulls over the following frame. Two frames on one window
    spec stay inside one WindowExec after one Exchange, so the nearest
    direction costs the same single shuffle as backward-only (no
    range-join blow-up, no second sort). Whole-row structs fill (never
    per-column — the r11 splice lesson), and the winner is chosen per
    row by comparing the two distances (interval or numeric — any type
    supporting subtraction and <=).

    Equal-timestamp notes: a right row at exactly left.ts is a
    backward match at distance zero (right sorts before left at equal
    ts), so it always wins the tie. Both frames are anchored at
    ``Window.currentRow``; on a LEFT row the current row's ``_vals`` is
    NULL, and any same-timestamp right row sorts BEFORE it — landing in
    the backward frame, never the forward one — so the forward fill
    only ever sees strictly-later right rows even though its frame
    bound includes the current row.
    """
    _check_reserved(left, right)
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
    wb = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = unioned.select(
        "*",
        F.last(F.col("_vals"), ignorenulls=True).over(wb).alias("_back"),
        F.first(F.col("_vals"), ignorenulls=True).over(wf).alias("_fwd"),
    )
    out = filled.filter(F.col("_side") == 1)
    db = F.col("_ts") - F.col("_back.__rts")
    df_ = F.col("_fwd.__rts") - F.col("_ts")
    take_back = F.col("_back").isNotNull() & (
        F.col("_fwd").isNull() | (db <= df_)
    )
    chosen = F.when(take_back, F.col("_back")).otherwise(F.col("_fwd"))
    return out.select(
        *[F.col(c) for c in left_cols],
        *[chosen[c].alias(c) for c in value_cols],
    )
