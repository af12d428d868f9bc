"""Structured-Streaming bucket maintenance — the online half of the
two-phase windowed aggregation (SURVEY.md §2.7 T1-T4).

Reference semantics being reproduced (Spark-first, no Redis):

- T1 bucket naming: events land in ``granularity``-sized tumbling
  buckets (``/root/reference/api/windows.go:96-108``) →
  ``F.window(ts, granularity)``.
- T2 alive vs dead buckets + DeadGracePeriod: a bucket stops accepting
  updates ``staleness + grace`` after its end
  (``api/windows.go:27-29,116-138``) → ``withWatermark(ts,
  staleness + grace)`` with append output: Spark emits a bucket row
  exactly when it dies — the streaming analog of the historian's
  ``bucket_active=false`` flush (``internal/historian/collect.go:72-145``).
- T3 incremental partial update (WindowAdd HINCRBY / lua min-max,
  ``redis/windows.go:229-265``) → Spark's stateful partial agg holds
  {count,sum,min,max} per (keys, bucket) and updates per micro-batch.
- T4 late data: rows older than the watermark are dropped from state —
  the retrospective path (``engine_pipeline.go:153-157``); in batch
  backfill they are naturally included.

The emitted rows are phase-1 partials in the canonical bucket layout;
the phase-2 range-window merge (`operators.window_agg.merge_buckets`)
runs downstream — identically over batch- or stream-produced buckets.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..durations import duration_to_interval_str as _us_to_interval
from ..durations import parse_duration_us


def stream_bucket_partials(
    events: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    granularity: str | int = "10m",
    staleness: str | int = "1h",
    grace: str | int = "10m",
) -> DataFrame:
    """Streaming phase-1: per (keys, bucket) partial {count,sum,min,max}
    with watermark = staleness + grace (bucket TTL, api/windows.go:110-113).

    Works on a streaming OR batch DataFrame (same plan; watermark is a
    no-op in batch) — the two-phase merge downstream cannot tell which
    produced the buckets.
    """
    gran_us = parse_duration_us(granularity)
    wm_us = parse_duration_us(staleness) + parse_duration_us(grace)
    v = F.col(value_col).cast("double")
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, _us_to_interval(wm_us))
    return (
        src.groupBy(
            *[F.col(k) for k in keys],
            F.window(F.col(ts_col), _us_to_interval(gran_us)).alias("bucket"),
        )
        .agg(
            F.count(v).alias("count"),
            F.sum(v).alias("sum"),
            F.min(v).alias("min"),
            F.max(v).alias("max"),
        )
        .select(
            *keys,
            F.col("bucket.start").alias("bucket_start"),
            F.col("bucket.end").alias("bucket_end"),
            "count",
            "sum",
            "min",
            "max",
        )
    )


def partials_to_bucket_layout(
    partials: DataFrame, granularity: str | int = "10m"
) -> DataFrame:
    """Adapt stream-emitted bucket rows to the batch two-phase layout
    (numeric bucket index + ``_p_*`` partials) so
    ``operators.window_agg.merge_buckets`` consumes them unchanged —
    one merge implementation for both online and backfill paths."""
    gran_us = parse_duration_us(granularity)
    return partials.select(
        "*",
        # FLOOR division, matching bucket_partials' floor(µs/g) — a
        # float-divide + cast('long') TRUNCATES toward zero and would
        # disagree on pre-epoch (negative-µs) timestamps
        F.floor(F.unix_micros(F.col("bucket_start")) / F.lit(gran_us))
        .cast("long")
        .alias("bucket"),
    ).withColumnsRenamed(
        {"count": "_p_count", "sum": "_p_sum", "min": "_p_min", "max": "_p_max"}
    ).drop("bucket_start", "bucket_end")


def run_stream_to_memory(
    partials: DataFrame,
    table_name: str,
    mode: str = "append",
) -> None:
    """Drain a streaming partials plan into an in-memory sink with
    availableNow (process-everything-then-stop) — the test/backfill
    trigger; production uses a real sink + continuous trigger."""
    q = (
        partials.writeStream.outputMode(mode)
        .format("memory")
        .queryName(table_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
