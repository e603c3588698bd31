"""Custom stateful streaming operator via ``applyInPandasWithState``:
arbitrary per-key state beyond what built-in window aggregations can
express (the escape hatch for bespoke streaming semantics).

The example operator keeps running per-user totals across
micro-batches — state is a (count, sum) pair per user, updated with
Arrow-batched pandas, emitted on every batch that touches the key.
State is partitioned by user_id, so it scales horizontally like any
keyed state store.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("v", DoubleType())]
)


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Running (count, sum(value)) per user, maintained in explicit
    group state across micro-batches."""

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [v]}
        )

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------- E10
_SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("closed_by_timeout", LongType()),
    ]
)
_SESSION_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("v", DoubleType()), StructField("last_us", LongType())]
)


def timeout_closed_sessions(stream: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Session aggregates emitted ONLY when the session closes: state
    accumulates per user and registers an event-time timeout at
    last_event + gap; when the watermark passes that point with no new
    events, the timeout fires, the session row is emitted, and the
    state is dropped. This is the arbitrary-stateful counterpart of
    session_window — needed when close-of-session must trigger a side
    effect (emit exactly one row per session), which windowed
    aggregation cannot express in update mode."""

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            n, v, _last = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [v], "closed_by_timeout": [1]}
            )
            return
        n, v, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
            last_us = max(last_us, int(pdf["ts"].max().value // 1000))
        state.update((n, v, last_us))
        state.setTimeoutTimestamp(last_us // 1000 + gap_s * 1000)
        yield from ()

    return (
        stream.withWatermark("ts", "10 seconds")
        .select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_SESSION_OUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
