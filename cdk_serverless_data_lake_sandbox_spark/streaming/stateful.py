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
    StringType,
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


# ---------------------------------------------------------------- E13
_QUOTA_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_accepted", LongType()),
        StructField("n_rejected", LongType()),
    ]
)
_QUOTA_STATE_SCHEMA = StructType(
    [StructField("acc", LongType()), StructField("rej", LongType())]
)


def quota_enforcer(stream: DataFrame, quota: int = 100) -> DataFrame:
    """Per-key admission control: each user may contribute at most
    ``quota`` events to the downstream pipeline; the rest are counted
    as rejected. State is a two-counter pair per user, so the store
    stays O(distinct users) regardless of stream length — the
    ingest-side rate-limit / abuse-cap every multi-tenant event
    pipeline needs. Emits the running (accepted, rejected) pair for
    every key touched by the micro-batch (update mode)."""

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        acc, rej = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n = len(pdf)
            take = min(n, quota - acc)
            acc += take
            rej += n - take
        state.update((acc, rej))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_accepted": [acc], "n_rejected": [rej]}
        )

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_QUOTA_OUT_SCHEMA,
            stateStructType=_QUOTA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------- E15
_EVICT_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("evicted", LongType()),
    ]
)
_EVICT_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("v", DoubleType())]
)


def idle_key_eviction(stream: DataFrame, ttl_ms: int = 10) -> DataFrame:
    """Processing-time TTL eviction: per-user running totals whose
    state is DROPPED after ``ttl_ms`` of wall-clock inactivity, with
    a final flush row (evicted=1) emitted on the way out. This is the
    state-hygiene pattern for unbounded key spaces (user/session/IP
    keyed state where most keys go quiet forever): without a TTL the
    store grows with every key ever seen; with it, the store holds
    only the working set. Event-time timeouts (E10) close *sessions*;
    processing-time timeouts bound *memory* even when the event-time
    watermark stalls."""

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, v = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [v],
                    "evicted": [1],
                }
            )
            return
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [v],
                "evicted": [0],
            }
        )

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_EVICT_OUT_SCHEMA,
            stateStructType=_EVICT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


# ---------------------------------------------------------------- E19
def tws_user_totals(stream: DataFrame) -> DataFrame:
    """Running per-user totals on ``transformWithStateInPandas`` —
    the modern arbitrary-state API (Spark 4) that supersedes
    applyInPandasWithState: state lives in named, typed handles
    (ValueState here; ListState/MapState/timers for richer shapes)
    backed by the RocksDB state store, so per-key state is no longer
    one opaque tuple and state evolution / TTL / timers compose
    declaratively. Semantics here are the exact twin of
    :func:`running_user_totals`, pinned by a batch-parity test.

    Scale: state partitions by user_id like every keyed store, and
    the RocksDB provider keeps it off-heap + changelog-checkpointed
    — the store the big-state deployments run.

    Environment note: the TWS Python runner imports google.protobuf;
    containers without it get the vendored clean-room mini-runtime
    (vendor/google/protobuf, activated by compat.ensure_protobuf()
    inside session.get_spark before the gateway launches), so the
    batch-parity test executes the real runner end-to-end — RocksDB
    state store, socket state-server handshake and all."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, v = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                v += float(pdf["value"].sum())
            self._state.update((n, v))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [v]}
            )

        def close(self) -> None:
            pass

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            Totals(),
            outputStructType=_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


_TWS_MAP_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("n_events", LongType()),
    ]
)


def tws_type_counts(stream: DataFrame) -> DataFrame:
    """Per-(user, event_type) running counts on
    ``transformWithStateInPandas`` with a **MapState** handle — the
    typed per-key dictionary (getMapState / containsKey / getValue /
    updateValue / iterator) that replaces packing a whole dict into
    one opaque state tuple. Each micro-batch increments the per-type
    counters for the touched user and re-emits that user's full map,
    so the sink converges to the batch groupBy twin (parity-tested).

    Beyond the semantics, this operator deliberately walks the map-
    state RPC surface (ContainsKey / GetValue / UpdateValue /
    Iterator request+response messages between the Python worker and
    the JVM state server) — the paths the vendored protobuf
    mini-runtime must encode byte-exactly; the parity test is
    therefore also an end-to-end conformance check on it.

    Scale: state partitions by user_id; map entries live in the
    RocksDB store per key, so cardinality in BOTH dimensions (users x
    types) stays off-heap and changelog-checkpointed."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    key_schema = StructType([StructField("event_type", StringType())])
    val_schema = StructType([StructField("n", LongType())])

    class TypeCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState("type_counts", key_schema, val_schema)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            for pdf in rows:
                for et, n_new in pdf["event_type"].value_counts().items():
                    k = (et,)
                    if self._counts.containsKey(k):
                        (n_old,) = self._counts.getValue(k)
                    else:
                        n_old = 0
                    self._counts.updateValue(k, (n_old + int(n_new),))
            types, counts = [], []
            for (et,), (n,) in self._counts.iterator():
                types.append(et)
                counts.append(n)
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(types),
                    "event_type": types,
                    "n_events": counts,
                }
            )

        def close(self) -> None:
            pass

    return (
        stream.select("user_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            TypeCounts(),
            outputStructType=_TWS_MAP_OUTPUT,
            outputMode="Update",
            timeMode="None",
        )
    )


_TWS_RECENT_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_kept", LongType()),
        StructField("latest_event_id", LongType()),
    ]
)


def tws_recent_events(stream: DataFrame, keep: int = 5) -> DataFrame:
    """Last-N event buffer per user on ``transformWithStateInPandas``
    with a **ListState** handle: every micro-batch appends the batch's
    event ids (appendList), trims the buffer to the newest ``keep``
    via clear+appendList, and emits the kept count + latest id — the
    bounded per-key replay buffer a feature-store / sessionizer keeps
    ("last N actions per user") without unbounded state.

    Like tws_type_counts for MapState, this walks the list-state RPC
    surface (ListStatePut / AppendList / ListStateGet paging) through
    the vendored protobuf mini-runtime end-to-end; parity-tested
    against a batch window twin."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    elem_schema = StructType([StructField("event_id", LongType())])

    class Recent(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._buf = handle.getListState("recent", elem_schema)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            new_ids = []
            for pdf in rows:
                new_ids.extend(int(x) for x in pdf["event_id"])
            if new_ids:
                self._buf.appendList([(i,) for i in new_ids])
            ids = [t[0] for t in self._buf.get()]
            if len(ids) > keep:
                ids = sorted(ids)[-keep:]
                self._buf.put([(i,) for i in ids])
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_kept": [len(ids)],
                    "latest_event_id": [max(ids) if ids else None],
                }
            )

        def close(self) -> None:
            pass

    return (
        stream.select("user_id", "event_id")
        .groupBy("user_id")
        .transformWithStateInPandas(
            Recent(),
            outputStructType=_TWS_RECENT_OUTPUT,
            outputMode="Update",
            timeMode="None",
        )
    )


_TWS_SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def tws_session_flush(stream: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Close-of-session flush on ``transformWithStateInPandas`` with
    EVENT-TIME TIMERS: state accumulates per user; each batch
    re-registers a timer at last_event + gap; when the watermark
    passes it, ``handleExpiredTimer`` fires once, emits the session
    row, and clears the state — the TWS twin of the
    applyInPandasWithState E10 operator, on the modern API where
    timers are first-class (register/delete/list) instead of a single
    per-key timeout slot.

    Completes the TWS conformance sweep over the vendored protobuf
    runtime: ValueState (E19), MapState (E25), ListState (E26), and
    here the timer RPC surface (RegisterTimer / DeleteTimer /
    ExpiredTimerRequest paging) plus the expired-timer callback
    protocol."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("v", DoubleType()),
            StructField("last_ms", LongType()),
        ]
    )

    class SessionFlush(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState("sess", state_schema)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, v, last_ms = (
                self._state.get() if self._state.exists() else (0, 0.0, 0)
            )
            old_timer = last_ms + gap_s * 1000 if last_ms else None
            for pdf in rows:
                n += len(pdf)
                v += float(pdf["value"].sum())
                last_ms = max(last_ms, int(pdf["ts"].max().value // 1_000_000))
            self._state.update((n, v, last_ms))
            if old_timer is not None:
                self._handle.deleteTimer(old_timer)
            self._handle.registerTimer(last_ms + gap_s * 1000)
            return iter(())

        def handleExpiredTimer(
            self, key, timerValues, expiredTimerInfo
        ) -> Iterator[pd.DataFrame]:
            if not self._state.exists():
                return iter(())
            n, v, _last = self._state.get()
            self._state.clear()
            return iter(
                [
                    pd.DataFrame(
                        {
                            "user_id": [key[0]],
                            "n_events": [n],
                            "total_value": [v],
                        }
                    )
                ]
            )

        def close(self) -> None:
            pass

    return (
        stream.withWatermark("ts", "10 seconds")
        .select("user_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            SessionFlush(),
            outputStructType=_TWS_SESSION_OUTPUT,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


# ---------------------------------------------------------------- E42
def tws_ttl_totals(stream: DataFrame, ttl_ms: int) -> DataFrame:
    """Running per-user totals whose ValueState carries a TTL
    (``getValueState(..., ttlDurationMs=...)``): state untouched for
    longer than the TTL is expired by the store itself — the
    DECLARATIVE form of E15's hand-rolled processing-time eviction,
    and the last piece of the transformWithStateInPandas conformance
    sweep over the vendored protobuf runtime (ValueState E19,
    MapState E25, ListState E26, event-time timers E27, TTLConfig
    here — the registration RPC now carries the ttl message). With a
    long TTL the operator is exactly :func:`tws_user_totals`; with a
    short one, keys quiet for a TTL restart from zero on their next
    event — bounded state for eternal streams, enforced by the store
    instead of user timer code.

    TTL is only legal in timeMode=ProcessingTime (Spark raises
    STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL otherwise),
    and under that mode an availableNow query does NOT self-terminate
    — callers gate on their sink's semantic condition and stop() the
    query, the same contract as the processing-time-timeout jobs
    (E10/E15)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TtlTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", _STATE_SCHEMA, ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, v = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                v += float(pdf["value"].sum())
            self._state.update((n, v))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [v]}
            )

        def close(self) -> None:
            pass

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            TtlTotals(),
            outputStructType=_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="ProcessingTime",
        )
    )
