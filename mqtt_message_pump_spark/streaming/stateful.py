"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's only cross-record state is a set of process-global atomic
counters feeding the monitor (``monitor.go:12-66,191-260``) -- lost on
crash, single-process by construction.  The keyed-state upgrade: counters
partitioned by topic, held in Spark's versioned state store, checkpointed
with the query, and scaled horizontally (state lives with its shuffle
partition, so 1000 executors hold 1/1000th each).

``applyInPandasWithState`` is the right tool (vs built-in windowed aggs)
exactly when the per-key logic is imperative: monotone counters, custom
eviction, session logic.  Arrow batches in, one pandas DataFrame out per
key per trigger.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

COUNTER_OUTPUT = T.StructType(
    [
        T.StructField("topic", T.StringType()),
        T.StructField("lifetime_msgs", T.LongType()),
        T.StructField("lifetime_bytes", T.LongType()),
    ]
)

COUNTER_STATE = T.StructType(
    [
        T.StructField("n_msgs", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _update_counters(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n_msgs, n_bytes = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n_msgs += len(pdf)
        n_bytes += int(pdf["msg_bytes"].sum())
    state.update((n_msgs, n_bytes))
    yield pd.DataFrame(
        {
            "topic": [key[0]],
            "lifetime_msgs": [n_msgs],
            "lifetime_bytes": [n_bytes],
        }
    )


def keyed_lifetime_counters(messages: DataFrame) -> DataFrame:
    """Streaming per-topic lifetime counters (msgs + bytes, the reference's
    ``AvgPeriod*`` numerators, ``monitor.go:138-146``) as keyed state.

    Input: streaming DataFrame with (topic, payload); emits one row per
    topic per trigger with cumulative totals.  Message size follows the
    reference's accounting: len(topic) + len(payload) + 4
    (``pump_pipe.go:50``).
    """
    sized = messages.select(
        "topic",
        (F.length("topic") + F.length("payload") + F.lit(4)).alias("msg_bytes"),
    )
    return sized.groupBy("topic").applyInPandasWithState(
        _update_counters,
        outputStructType=COUNTER_OUTPUT,
        stateStructType=COUNTER_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
    ]
)

EWMA_STATE = T.StructType(
    [
        T.StructField("ewma", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def _update_ewma(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    ewma, n = state.get if state.exists else (0.0, 0)
    # A key's trigger slice can arrive as SEVERAL Arrow chunks (rows >
    # arrow.maxRecordsPerBatch); sorting each chunk alone would fold
    # across chunk boundaries out of order -- concatenate, then sort.
    chunks = list(pdfs)
    full = pd.concat(chunks) if chunks else pd.DataFrame()
    if len(full):
        full = full.sort_values(["ts", "event_id"])
        for v in full["value"]:
            ewma = float(v) if n == 0 else 0.5 * ewma + 0.5 * float(v)
            n += 1
    state.update((ewma, n))
    yield pd.DataFrame(
        {"user_id": [key[0]], "ewma": [ewma], "n_events": [n]}
    )


def keyed_ewma(events: DataFrame) -> DataFrame:
    """Streaming twin of ``q_ewma_smooth``: per-user EWMA (alpha 0.5)
    carried in keyed state across micro-batches.  Each trigger sorts its
    own slice by (ts, event_id) and folds it into the checkpointed
    (ewma, n) pair -- O(1) state per key, identical arithmetic to the
    batch operator, so in-order delivery reproduces the batch fold
    bit-for-bit (asserted in tests).  Out-of-order arrivals fold in
    arrival order, the documented streaming semantics (an event-time-
    exact variant would buffer per key behind a watermark)."""
    return events.select(
        "user_id", "event_id", "ts", "value"
    ).groupBy("user_id").applyInPandasWithState(
        _update_ewma,
        outputStructType=EWMA_OUTPUT,
        stateStructType=EWMA_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TRANSITION_OUTPUT = T.StructType(
    [
        T.StructField("src", T.StringType()),
        T.StructField("dst", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
)

TRANSITION_STATE = T.StructType([T.StructField("last", T.StringType())])


def _update_transitions(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    last = state.get[0] if state.exists else None
    chunks = list(pdfs)
    full = pd.concat(chunks) if chunks else pd.DataFrame()
    counts: dict[tuple[str, str], int] = {}
    if len(full):
        full = full.sort_values(["ts", "event_id"])
        for t in full["event_type"]:
            if last is not None:
                pair = (last, t)
                counts[pair] = counts.get(pair, 0) + 1
            last = t
    state.update((last,))
    if counts:
        srcs, dsts, ns = zip(*((s, d, n) for (s, d), n in counts.items()))
        yield pd.DataFrame({"src": srcs, "dst": dsts, "n": ns})


def keyed_transitions(events: DataFrame) -> DataFrame:
    """Streaming twin of ``q_event_transitions``: per-user Markov
    transition INCREMENTS carried across micro-batches with one string
    of keyed state (the user's last event type), so a transition that
    straddles a trigger -- or a restart -- is still counted exactly once.
    Each trigger sorts its own slice by (ts, event_id) and emits
    (src, dst, n) increment rows; the sink aggregates increments into
    the lifetime matrix (sum by (src, dst)), which converges to the
    batch operator's counts under in-order delivery.  O(1) state per
    key; out-of-order arrivals fold in arrival order, the documented
    streaming semantics (q_ewma_smooth's contract)."""
    return (
        events.select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_transitions,
            outputStructType=TRANSITION_OUTPUT,
            stateStructType=TRANSITION_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
