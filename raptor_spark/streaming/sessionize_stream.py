"""Streaming gap sessionization — a CUSTOM STATEFUL operator via
``applyInPandasWithState`` (the API Spark provides for operators its
built-ins can't express; here: per-key session numbering must carry
(last_ts, session_idx) state across micro-batches).

Semantics identical to the batch operator
(``operators/sessionize.py`` / SURVEY W7): within a key, a new session
starts when ts − prev_ts > gap; rows get (session_idx, session_id).
State per key = (last_ts_us, session_idx); expired by event-time
timeout after ``gap`` + watermark so idle conversations release state
(the reference's bucket TTL discipline, api/windows.go:110-113,
applied to sessions).

Scale notes: state is O(#active keys) × 16 bytes — at 10⁹ live
conversations this shards across executors by the groupBy hash;
watermark-driven timeout bounds it to active conversations only.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..durations import parse_duration_us

STATE_SCHEMA = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("session_idx", IntegerType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("turn_idx", IntegerType()),
        StructField("session_idx", IntegerType()),
        StructField("session_id", StringType()),
    ]
)


def _make_fn(gap_us: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            # timeout invocation: no new rows; idle past gap+watermark
            # → a future row starts a fresh session anyway
            state.remove()
            return iter(())
        if state.exists:
            last_ts_us, session_idx = state.get
        else:
            last_ts_us, session_idx = None, 0
        outs = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts", kind="stable")
            ts_us = (pdf["ts"].astype("datetime64[us]").astype("int64")).to_numpy()
            idxs = []
            for t in ts_us:
                if last_ts_us is not None and t - last_ts_us > gap_us:
                    session_idx += 1
                idxs.append(session_idx)
                last_ts_us = int(t)
            outs.append(
                pd.DataFrame(
                    {
                        "conv_id": conv_id,
                        "ts": pdf["ts"].values,
                        "turn_idx": pdf["turn_idx"].values,
                        "session_idx": pd.array(idxs, dtype="int32"),
                        "session_id": [f"{conv_id}#{i}" for i in idxs],
                    }
                )
            )
        state.update((last_ts_us, session_idx))
        # Evict only when the WATERMARK passes last_event_ts + gap: at
        # that point any new row is either late (dropped by the
        # watermark) or starts a new session anyway. Anchoring the
        # timeout at the watermark instead (review r3) evicted state
        # for sessions whose last event was far AHEAD of the watermark
        # — a still-open session would be split and its session_idx
        # reused for different rows. Spark requires the timestamp to
        # exceed the current watermark, hence the max().
        timeout_ms = max(
            state.getCurrentWatermarkMs() + 1,
            last_ts_us // 1000 + gap_us // 1000 + 1,
        )
        state.setTimeoutTimestamp(timeout_ms)
        return iter(outs)

    return fn


def sessionize_stream(
    events: DataFrame,
    gap: str | int = "30m",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming sessionize over (conv_id, turn_idx, ts) rows.

    NOTE append-mode caveat: rows are emitted with the session they
    belong to AT PROCESSING TIME; a micro-batch boundary inside a
    still-open session is handled correctly because (last_ts,
    session_idx) persist in state.
    """
    gap_us = parse_duration_us(gap)
    missing = {"conv_id", "turn_idx", ts_col} - set(events.columns)
    if missing:
        raise ValueError(
            f"sessionize_stream needs columns {sorted(missing)} "
            f"(schema: conv_id, turn_idx, {ts_col})"
        )
    src = events
    if ts_col != "ts":
        # the stateful fn and output schema speak 'ts'
        src = src.withColumn("ts", F.col(ts_col))
    if events.isStreaming:
        src = src.withWatermark("ts", watermark)
    return src.groupBy("conv_id").applyInPandasWithState(
        _make_fn(gap_us),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
