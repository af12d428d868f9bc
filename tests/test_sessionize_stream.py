"""Custom stateful streaming operator (applyInPandasWithState):
streaming gap sessionization ≡ batch sessionize, including state
carried across micro-batches."""

from pyspark.sql import functions as F

from raptor_spark.operators.sessionize import sessionize
from raptor_spark.sources.transcripts import transcripts
from raptor_spark.streaming.sessionize_stream import sessionize_stream
from raptor_spark.streaming.windows import run_stream_to_memory


def _rows(df):
    cols = ["conv_id", "turn_idx", "session_idx", "session_id"]
    return [tuple(r) for r in df.select(*cols).orderBy("conv_id", "turn_idx").collect()]


def test_stream_sessionize_matches_batch(spark, tmp_path):
    src = transcripts(spark, n_convs=10).select("conv_id", "turn_idx", "ts")
    path = str(tmp_path / "turns")
    src.write.parquet(path)

    stream = spark.readStream.schema(src.schema).parquet(path)
    out = sessionize_stream(stream, gap="30m", watermark="2 hours")
    assert out.isStreaming
    run_stream_to_memory(out, "t_sessions")
    streamed = spark.table("t_sessions")

    batch = sessionize(
        spark.read.parquet(path), ["conv_id"], "ts", 30 * 60 * 1_000_000
    )
    assert _rows(streamed) == _rows(batch)


def test_stream_sessionize_state_across_batches(spark, tmp_path):
    """Split one conversation across two files processed as separate
    micro-batches (maxFilesPerTrigger=1): session numbering must
    continue via state, not restart."""
    src = transcripts(spark, n_convs=3).select("conv_id", "turn_idx", "ts").cache()
    early = src.filter(F.col("turn_idx") < 10)
    late = src.filter(F.col("turn_idx") >= 10)
    path = str(tmp_path / "turns2")
    early.coalesce(1).write.parquet(path)
    late.coalesce(1).write.mode("append").parquet(path)

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = sessionize_stream(stream, gap="30m", watermark="2 hours")
    run_stream_to_memory(out, "t_sessions2")
    streamed = spark.table("t_sessions2")

    batch = sessionize(src, ["conv_id"], "ts", 30 * 60 * 1_000_000)
    assert _rows(streamed) == _rows(batch)


def test_state_timeout_anchored_at_last_event(spark):
    """The eviction timestamp must be last_event_ts + gap, NOT
    watermark + gap — a watermark-anchored timeout evicts state for a
    session whose last event is far ahead of the watermark, splitting
    it and reusing its session_id (review r3). Pinned by driving the
    stateful fn directly with a stub GroupState."""
    import datetime as dt

    import pandas as pd

    from raptor_spark.streaming.sessionize_stream import _make_fn

    class StubState:
        hasTimedOut = False
        exists = False

        def __init__(self, watermark_ms):
            self._wm = watermark_ms
            self.timeout_ms = None

        def update(self, v):
            self.exists = True
            self.get = v

        def getCurrentWatermarkMs(self):
            return self._wm

        def setTimeoutTimestamp(self, ms):
            self.timeout_ms = ms

        def remove(self):
            self.exists = False

    gap_us = 30 * 60 * 1_000_000
    fn = _make_fn(gap_us)
    last_event = dt.datetime(2024, 1, 1, 10, 0, 0)
    watermark_ms = int(dt.datetime(2024, 1, 1, 8, 0, 0).timestamp() * 1000)
    state = StubState(watermark_ms)
    pdf = pd.DataFrame({"ts": [last_event], "turn_idx": [0]})
    list(fn(("c1",), iter([pdf]), state))
    last_ms = int(last_event.timestamp() * 1000)
    # strictly AFTER last_event + gap (and after the watermark)
    assert state.timeout_ms > last_ms + gap_us // 1000
    assert state.timeout_ms > watermark_ms


def test_sessionize_stream_validates_columns(spark):
    import pytest

    bad = spark.createDataFrame([("c1",)], "conv_id string")
    with pytest.raises(ValueError, match="needs columns"):
        from raptor_spark.streaming.sessionize_stream import sessionize_stream

        sessionize_stream(bad)
