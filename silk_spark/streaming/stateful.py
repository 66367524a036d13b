"""Custom stateful Structured Streaming operators.

The CDC merge path deliberately needs no event-time state (version
resolution at merge time — streaming/stream.py). These operators cover
the OTHER streaming shape the reference's users need: continuous
aggregation with per-key state that outlives a micro-batch, expressed
with `applyInPandasWithState` (Arrow-batched per-group state functions
— the custom-stateful-operator escape hatch) and watermarks for late
data.

Reference analogue: Silk's activity/execution stream reporting
(silk-core/.../execution/ExecutionReport.scala) has no distributed
equivalent; the sessionizer mirrors the batch gap-window operator
(__spark_entry__.q_events_sessionize) so the two faces can be
cross-checked: every session the stream CLOSES is byte-identical to a
session of the batch operator over the same prefix.

Scale notes: state lives in the state store, partitioned by the group
key — hot keys are bounded by per-key state size (three scalars here),
not event volume; each micro-batch shuffles only that batch's rows.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

# (session_start_epoch_us, last_ts_epoch_us, n_events)
_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)

_US = 1_000_000


def _session_fn(gap_us: int):
    """Per-key state function: maintain the open session; emit every
    session CLOSED either by a later event beyond the gap or by the
    watermark passing last_ts + gap (event-time timeout)."""

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        def row(start_us: int, last_us: int, n: int) -> dict:
            return {
                "user_id": key[0],
                "session_start": pd.Timestamp(start_us, unit="us"),
                "session_end": pd.Timestamp(last_us, unit="us"),
                "n_events": n,
            }

        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame([row(start_us, last_us, n)])
            return

        ts_us = (
            pd.concat([pdf["ts"] for pdf in pdfs])
            .astype("datetime64[us]")
            .astype("int64")
            .sort_values()
        )
        # drop rows older than the watermark OURSELVES: unlike windowed
        # aggregations, arbitrary-stateful operators receive late rows
        # as-is — without this a too-late event would resurrect or
        # extend a session the watermark already promised was closed
        wm_us = state.getCurrentWatermarkMs() * 1000
        if wm_us > 0:
            ts_us = ts_us[ts_us >= wm_us]
        if ts_us.empty and not state.exists:
            return
        start_us, last_us, n = state.get if state.exists else (None, None, 0)
        closed = []
        for t in ts_us:
            t = int(t)
            if start_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us > gap_us:
                closed.append(row(start_us, last_us, n))
                start_us, last_us, n = t, t, 1
            else:
                last_us, n = max(last_us, t), n + 1
        state.update((start_us, last_us, n))
        # close the open session when the watermark passes its gap end
        # (a timeout must sit beyond the current watermark, so clamp —
        # it then fires on the very next micro-batch)
        state.setTimeoutTimestamp(
            max(last_us // 1000 + gap_us // 1000, state.getCurrentWatermarkMs() + 1)
        )
        if closed:
            yield pd.DataFrame(closed)

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-window sessionization of a STREAMING events frame.

    Emits one row per CLOSED session (append mode): a session closes
    when a later event of the same user arrives more than
    `gap_minutes` after it, or when the event-time watermark passes
    its gap horizon (no more on-time events can extend it). Late rows
    inside `watermark` still extend their session; later ones are
    dropped by the watermark, matching the batch operator on the
    on-time prefix."""
    src = events.select(
        F.col(user_col).cast("long").alias("user_id"), F.col(ts_col).alias("ts")
    ).withWatermark("ts", watermark)
    return src.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes * 60 * _US),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    within: str = "1 hour",
) -> DataFrame:
    """Streaming exactly-once-per-key emission: keep the FIRST arrival
    of each key, dropping re-deliveries that arrive within the
    watermark horizon — the built-in watermarked-state operator
    (`dropDuplicatesWithinWatermark`), which bounds state by time
    instead of keeping every key forever like plain dropDuplicates."""
    return events.withWatermark(ts_col, within).dropDuplicatesWithinWatermark(keys)
