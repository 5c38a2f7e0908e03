"""Custom stateful streaming operators via applyInPandasWithState.

The escape hatch for streaming semantics the built-in windows can't
express: per-key state lives in the state store, updates arrive as Arrow
batches, and the operator emits incremental results. Used here for a
running per-user accumulator (count + exact cents total) whose state must
survive micro-batch boundaries — the property tests/test_streaming.py pins
with a two-batch stream.

State is integer cents (not float) so cross-batch accumulation stays exact
regardless of batch slicing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total_cents", LongType()),
    ]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Running (count, exact total) per user, one update row per user per
    micro-batch; state persists across batches in the state store.

    The state function is a CLOSURE, deliberately: cloudpickle ships a
    nested function by VALUE, while a module-level function pickles by
    reference and requires every Python worker to import this package —
    which breaks when the driver harness imports `__spark_entry__` via a
    file-location spec from a foreign cwd (workers inherit no repo path).
    """

    def accumulate(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, total_cents = state.get if state.exists else (0, 0)
        for pdf in batches:
            n += len(pdf)
            total_cents += int(
                round(pdf["value"].astype(float).sum() * 100)
            )
        state.update((n, total_cents))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total_cents / 100.0],
            }
        )

    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        accumulate,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
