"""Custom stateful streaming operator: conversation sessionizer.

Demonstrates the applyInPandasWithState pattern for semantics Spark's
built-in streaming operators can't express: per-conversation session
assignment where state (last event time + running session counter) must
persist across micro-batches. Timed-out conversations flush their state
via ProcessingTime timeout.

Batch equivalent: operators/windows.with_sessions (same gap rule) — the
test drains a stream and compares against it.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("session_idx", T.LongType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("last_us", T.LongType()),
    T.StructField("session_idx", T.LongType()),
])


def make_sessionizer(gap_seconds: int = 3600, with_timeout: bool = False):
    gap_us = gap_seconds * 1_000_000

    def sessionize(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        last_us, session_idx = state.get if state.exists else (None, -1)
        # A conversation's rows may span several Arrow chunks within one
        # micro-batch; sorting chunks individually would compute session
        # indices out of turn order. Concatenate the whole group first.
        chunks = list(pdfs)
        if not chunks:
            state.update((last_us, session_idx))
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values("turn_idx")
        us = pdf["ts"].astype("int64") // 1000  # ns -> us
        sessions = []
        for u in us:
            if last_us is None or (u - last_us) > gap_us:
                session_idx += 1
            last_us = int(u)
            sessions.append(session_idx)
        state.update((last_us, session_idx))
        if with_timeout:
            state.setTimeoutDuration(24 * 3600 * 1000)
        yield pd.DataFrame({
            "conv_id": key[0],
            "turn_idx": pdf["turn_idx"].values,
            "session_idx": sessions,
        })

    return sessionize


def stream_sessions(
    stream: DataFrame, gap_seconds: int = 3600, with_timeout: bool = False
) -> DataFrame:
    """Per-turn session ids over a streaming transcripts source.

    with_timeout enables ProcessingTime state eviction for long-running
    continuous triggers; leave False under ``availableNow`` — a pending
    processing-time timeout makes the drain trigger spin on empty
    "cleaning up state" batches and never terminate.
    """
    return (
        stream.select("conv_id", "turn_idx", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            make_sessionizer(gap_seconds, with_timeout),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if with_timeout
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
