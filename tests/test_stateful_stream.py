"""Stateful Structured Streaming operators: gap sessionization via
applyInPandasWithState (event-time timeouts close idle sessions) and
watermarked streaming dedup. Files are fed one per micro-batch so the
watermark advances between batches — the only way timeouts fire
deterministically in a test."""

import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from silk_spark.streaming.stateful import dedup_stream, sessionize_stream

T0 = pd.Timestamp("2024-01-01 00:00:00")
MIN = pd.Timedelta(minutes=1)


def _write_batches(dirpath, batches):
    """One parquet file per micro-batch with strictly increasing
    mtimes (the file source processes oldest-modified first)."""
    os.makedirs(dirpath, exist_ok=True)
    now = time.time()
    for i, pdf in enumerate(batches):
        p = os.path.join(dirpath, f"b{i}.parquet")
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False).cast(
                pa.schema([("user_id", pa.int64()), ("ts", pa.timestamp("us"))])
            ),
            p,
        )
        os.utime(p, (now + i, now + i))


def _drain(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    if q.isActive:
        q.stop()


@pytest.fixture()
def stream_reader(spark, tmp_path):
    def make(batches):
        d = str(tmp_path / "in")
        _write_batches(d, batches)
        return (
            spark.readStream.schema("user_id bigint, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )

    return make


def test_sessionize_stream_closes_by_gap_and_watermark(spark, stream_reader):
    sentinel = lambda d: pd.DataFrame(  # noqa: E731
        {"user_id": [999], "ts": [T0 + pd.Timedelta(days=d)]}
    )
    batches = [
        # u1: two events 5m apart (one session); u2: one event
        pd.DataFrame({"user_id": [1, 1, 2], "ts": [T0, T0 + 5 * MIN, T0 + 2 * MIN]}),
        # u1: 60m later -> closes session 1 by GAP; u2: +1m extends
        pd.DataFrame({"user_id": [1, 2], "ts": [T0 + 65 * MIN, T0 + 3 * MIN]}),
        # two sentinel batches: the first advances the watermark past
        # every real session's gap horizon, the second triggers the
        # resulting event-time timeouts (timeouts fire one batch late)
        sentinel(3),
        sentinel(3) .assign(ts=lambda p: p.ts + MIN),
    ]
    out = sessionize_stream(stream_reader(batches), gap_minutes=30, watermark="10 minutes")
    _drain(out, "sess")
    got = (
        spark.sql("select * from sess")
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "session_start": [T0, T0 + 65 * MIN, T0 + 2 * MIN],
            "session_end": [T0 + 5 * MIN, T0 + 65 * MIN, T0 + 3 * MIN],
            "n_events": [2, 1, 2],
        }
    )
    # the sentinel user's own session never closes -> never emitted
    assert (got.user_id != 999).all()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_sessionize_stream_drops_rows_later_than_watermark(spark, stream_reader):
    batches = [
        pd.DataFrame({"user_id": [1], "ts": [T0 + 60 * MIN]}),
        # 50 minutes late vs the u1 event above with a 10m watermark:
        # dropped, so it can neither extend nor create a session
        pd.DataFrame({"user_id": [1, 2], "ts": [T0, T0 + 61 * MIN]}),
        pd.DataFrame({"user_id": [999], "ts": [T0 + pd.Timedelta(days=3)]}),
        pd.DataFrame({"user_id": [999], "ts": [T0 + pd.Timedelta(days=3, minutes=1)]}),
    ]
    out = sessionize_stream(stream_reader(batches), gap_minutes=30, watermark="10 minutes")
    _drain(out, "sess_late")
    got = spark.sql("select * from sess_late").toPandas()
    u1 = got[got.user_id == 1]
    assert len(u1) == 1
    assert u1.iloc[0]["session_start"] == T0 + 60 * MIN  # the late T0 row is gone
    assert u1.iloc[0]["n_events"] == 1


def test_dedup_stream_keeps_first_arrival(spark, stream_reader):
    batches = [
        pd.DataFrame({"user_id": [1, 2], "ts": [T0, T0 + MIN]}),
        # re-delivery of user 1 within the watermark horizon: dropped
        pd.DataFrame({"user_id": [1, 3], "ts": [T0 + 2 * MIN, T0 + 3 * MIN]}),
    ]
    out = dedup_stream(stream_reader(batches), keys=["user_id"], within="1 hour")
    _drain(out, "dedup")
    got = spark.sql("select * from dedup").toPandas().sort_values("user_id")
    assert list(got.user_id) == [1, 2, 3]
    assert got[got.user_id == 1].iloc[0]["ts"] == T0  # first arrival won
