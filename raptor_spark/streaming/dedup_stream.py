"""Streaming exact dedup — the dedup-at-ingest pass.

Batch dedup (functions/dedup.exact_dedup) picks the min-id
representative per fingerprint over the whole corpus; at ingest time
the stream equivalent keeps the FIRST arrival per fingerprint and
drops later copies, with state bounded by the watermark horizon —
the same alive/dead + grace state-expiry model as the reference's
streaming buckets (internal/plugins/builders/streaming/streaming.go
ingest path; behavior-only reference).

Spark-first: ``dropDuplicatesWithinWatermark`` is the built-in
stateful operator for exactly this — per-key state in the state
store, evicted once the event-time watermark passes, no custom
applyInPandasWithState needed. The fingerprint is computed map-side
with the SAME normalization + md5 expression as batch
``exact_dedup``, so a doc kept by the stream and a doc kept by the
batch pass agree on identity (the surviving representative may
differ: first-seen vs min-id — pinned in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint


def dedup_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first-arriving document per text fingerprint; drop
    duplicates that arrive within ``watermark`` of the kept row's
    event time. State per distinct fingerprint is evicted when the
    watermark passes it, so memory is bounded by the dedup horizon —
    at 100 TB/day ingest the state store holds one row per distinct
    doc seen in the horizon, not per doc ever seen.

    Duplicates farther apart than the horizon are NOT caught (state
    already evicted) — that is the documented streaming contract;
    the batch passes (exact_dedup / fuzzy_dedup_corpus) are the
    full-corpus guarantee.
    """
    if not stream.isStreaming:
        raise ValueError(
            "dedup_stream needs a streaming DataFrame; use "
            "functions.dedup.exact_dedup for batch inputs"
        )
    return (
        stream.withColumn("fp", fingerprint(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )
