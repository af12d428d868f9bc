"""Streaming exact dedup: stream ≡ batch on fingerprint identity,
bounded-state contract, batch-input guard."""

import pytest
from pyspark.sql import functions as F

from raptor_spark.functions.dedup import exact_dedup
from raptor_spark.streaming.dedup_stream import dedup_stream
from raptor_spark.streaming.windows import run_stream_to_memory


@pytest.fixture()
def doc_stream(spark, tmp_path):
    rows = []
    # 20 distinct texts, each duplicated 3x at 1-minute spacing
    for d in range(20):
        for rep in range(3):
            rows.append(
                (
                    d * 10 + rep,
                    f"2024-01-01 00:{d:02d}:{rep:02d}",
                    f"document number {d} body text",
                )
            )
    # formatting-noise duplicate of doc 0 (case/whitespace)
    rows.append((900, "2024-01-01 00:00:30", "  Document   NUMBER 0 body TEXT "))
    df = spark.createDataFrame(rows, ["doc_id", "ts_s", "text"]).select(
        "doc_id", F.col("ts_s").cast("timestamp").alias("ts"), "text"
    )
    path = str(tmp_path / "docs")
    df.write.parquet(path)
    return df, spark.readStream.schema(df.schema).parquet(path)


def test_stream_dedup_matches_batch_identity(spark, doc_stream):
    batch_df, stream = doc_stream
    out = dedup_stream(stream, ts_col="ts", text_col="text", watermark="1 hour")
    assert out.isStreaming
    run_stream_to_memory(out, "t_dedup")
    kept = spark.table("t_dedup")

    batch = exact_dedup(batch_df, "doc_id")
    kept_fps = {r["fp"] for r in kept.select("fp").collect()}
    batch_fps = {r["fp"] for r in batch.select("fp").collect()}
    # same identity decision: the normalized-noise copy of doc 0
    # collapses into doc 0's fingerprint in BOTH passes
    assert kept_fps == batch_fps
    assert kept.count() == 20  # one survivor per distinct text
    assert batch.count() == 20


def test_stream_dedup_rejects_batch_input(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="streaming"):
        dedup_stream(df)
