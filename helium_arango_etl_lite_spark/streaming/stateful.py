"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md section 2.6 — the engine's extension point for semantics the
built-in windowed aggregates can't express).

Example operator: per-key running totals that survive across micro-batches
— the streaming analog of the reference's ever-growing follower state, but
partitioned by key across executors with explicit, schema-declared state.

Scale notes: state lives in the state store partitioned by group key; each
micro-batch touches only the keys present in that batch (plus timeouts).
The per-group pandas iteration is Arrow-batched. This is the pattern to
extend for sessionization with custom emission rules, CDC-style merge, or
online sketch maintenance.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events_total", LongType(), False),
        StructField("total_value", DoubleType(), True),
        StructField("batch_rows", LongType(), False),
    ]
)

RUNNING_TOTALS_STATE = StructType(
    [
        StructField("n", LongType(), False),
        StructField("v", DoubleType(), True),
    ]
)


def _update_running_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, sum(value)) per key across micro-batches; emit the
    running totals once per key per batch it appears in."""
    n, v = state.get if state.exists else (0, 0.0)
    batch_rows = 0
    for pdf in pdfs:  # Arrow-batched chunks of this key's rows in the batch
        batch_rows += len(pdf)
        n += len(pdf)
        v += float(pdf["value"].fillna(0.0).sum())
    state.update((n, v))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events_total": [n],
            "total_value": [round(v, 6)],
            "batch_rows": [batch_rows],
        }
    )


def running_totals(
    events: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Per-key running totals over an unbounded stream.

    Built-in windowed aggregation cannot emit a *cumulative* (all-time)
    value per key in update mode with bounded state semantics under the
    engine's control — this operator can, and is the template for any
    custom state machine.
    """
    sel = events.select(
        events[key_col].alias("user_id"), events[value_col].alias("value")
    )
    return sel.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=RUNNING_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
