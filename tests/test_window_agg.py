"""Sliding-window aggregates vs the reference pandas recipe
(replay.py:129-146) and the two-phase ≡ direct property."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from raptor_spark.operators.window_agg import (
    sliding_agg_bucketed,
    sliding_agg_exact,
)
from tests.oracles import allclose_frames, rolling_agg

FNS = ["count", "sum", "avg", "min", "max"]


def test_exact_window_matches_pandas_rolling(spark, transcripts_pair):
    sdf, pdf = transcripts_pair
    over_us = 10 * 60 * 1_000_000  # 10m

    got = (
        sliding_agg_exact(
            sdf.withColumn("v", F.length("text").cast("double")),
            ["conv_id"],
            "ts",
            "v",
            over_us,
            FNS,
        )
        .select("conv_id", "turn_idx", *FNS)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )

    p = pdf.assign(v=pdf["text"].str.len().astype(float))
    exp = (
        rolling_agg(p, ["conv_id"], "ts", "v", pd.Timedelta(minutes=10), FNS)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    allclose_frames(got, exp, FNS)


def test_exact_window_left_open_interval(spark):
    """pandas offset windows are (t−over, t] — a row exactly `over`
    old must NOT be included (the −1µs bound)."""
    pdf = pd.DataFrame(
        {
            "k": ["a"] * 3,
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:10:00", "2024-01-01 00:20:00"]
            ),
            "v": [1.0, 10.0, 100.0],
        }
    )
    sdf = spark.createDataFrame(pdf)
    got = (
        sliding_agg_exact(sdf, ["k"], "ts", "v", 10 * 60 * 1_000_000, ["sum"])
        .orderBy("ts")
        .toPandas()
    )
    # at 00:10 the window (00:00, 00:10] EXCLUDES the 00:00 row (exactly
    # `over` old); at 00:20, (00:10, 00:20] excludes the 00:10 row
    assert got["sum"].tolist() == [1.0, 10.0, 100.0]
    exp = rolling_agg(pdf, ["k"], "ts", "v", pd.Timedelta(minutes=10), ["sum"])
    assert exp["sum"].tolist() == got["sum"].tolist()


def test_distinct_count_window(spark, transcripts_pair):
    sdf, pdf = transcripts_pair
    over_us = 3600 * 1_000_000
    got = (
        sliding_agg_exact(
            sdf.filter(F.col("tool").isNotNull()),
            ["conv_id"],
            "ts",
            "tool",
            over_us,
            ["distinct_count"],
        )
        .select("conv_id", "turn_idx", "distinct_count")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    p = pdf[pdf["tool"].notna()].copy()
    # factorize strings first (replay.py:135-137)
    p["tool_f"] = pd.factorize(p["tool"])[0].astype(float)
    exp = (
        rolling_agg(p, ["conv_id"], "ts", "tool_f", pd.Timedelta(hours=1), ["distinct_count"])
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    allclose_frames(got, exp.rename(columns={"distinct_count": "distinct_count"}), ["distinct_count"])


def test_two_phase_equals_direct_at_bucket_ends(spark, transcripts_pair):
    """Property (SURVEY.md §7.4): the bucketed two-phase result at each
    bucket end equals the exact sliding window evaluated over bucketed
    timestamps — i.e. both aggregate events in (end − over, end] when
    over % granularity == 0 (window = n whole buckets)."""
    sdf, pdf = transcripts_pair
    over_us = 3600 * 1_000_000  # 1h
    gran_us = 300 * 1_000_000  # 5m
    fns = ["count", "sum", "avg", "min", "max", "distinct_count"]

    v = F.length("text").cast("double")
    got = (
        sliding_agg_bucketed(
            sdf.withColumn("v", v), ["conv_id"], "ts", "v", over_us, gran_us, fns
        )
        .select("conv_id", "ts", *fns)
        .toPandas()
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )

    # oracle: per (conv, bucket-end), aggregate events in (end-over, end]
    p = pdf.assign(v=pdf["text"].str.len().astype(float))
    p["bucket"] = (p["ts"].astype("int64") // 1000 // gran_us * gran_us).astype("int64")
    rows = []
    for (conv, bucket), _ in p.groupby(["conv_id", "bucket"]):
        end = bucket + gran_us
        m = p[(p["conv_id"] == conv)]
        ts_us = m["ts"].astype("int64") // 1000
        m = m[(ts_us > end - over_us) & (ts_us <= end)]
        # note: all events in the current bucket have ts < end ⇒ ≤ holds
        rows.append(
            (
                conv,
                pd.Timestamp(end * 1000),
                float(len(m)),
                m["v"].sum(),
                m["v"].mean(),
                m["v"].min(),
                m["v"].max(),
                float(m["v"].nunique()),
            )
        )
    exp = pd.DataFrame(
        rows, columns=["conv_id", "ts", "count", "sum", "avg", "min", "max", "distinct_count"]
    ).sort_values(["conv_id", "ts"]).reset_index(drop=True)
    assert len(got) == len(exp)
    allclose_frames(got, exp, fns)


def test_approx_distinct_bucketed_close_to_exact(spark, transcripts_pair):
    sdf, _ = transcripts_pair
    over_us = 3600 * 1_000_000
    gran_us = 600 * 1_000_000
    both = sliding_agg_bucketed(
        sdf.withColumn("v", F.length("text").cast("double")),
        ["conv_id"],
        "ts",
        "v",
        over_us,
        gran_us,
        ["distinct_count", "approx_distinct_count"],
    ).toPandas()
    # HLL estimate within 10% of exact
    rel = (
        (both["approx_distinct_count"] - both["distinct_count"]).abs()
        / both["distinct_count"].clip(lower=1)
    )
    assert rel.max() < 0.10


def test_long_window_distinct_warns(spark, transcripts_pair):
    """Exact distinct beyond 24h warns, steering to the bucketed HLL
    path (the per-row collect_set memory cliff); short windows and
    mergeable fns stay silent."""
    import warnings as _w

    sdf, _ = transcripts_pair
    df = sdf.withColumn("v", F.length("text").cast("double"))
    h25 = 25 * 3_600_000_000
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        sliding_agg_exact(df, ["conv_id"], "ts", "v", h25, ["distinct_count"])
        assert any("bucketed" in str(r.message) for r in rec)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        sliding_agg_exact(df, ["conv_id"], "ts", "v", h25, ["sum", "count"])
        sliding_agg_exact(
            df, ["conv_id"], "ts", "v", 6 * 3_600_000_000, ["distinct_count"]
        )
        assert not rec
