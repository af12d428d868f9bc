"""PIT as-of join vs the backward-merge oracle
(featureset.tmpl.sql:104-122 semantics) + leakage probes."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from raptor_spark.operators.asof import asof_join
from tests.oracles import asof_backward


def _frames(spark, transcripts_pair):
    sdf, pdf = transcripts_pair
    # feature: length(text) of assistant turns; spine: user turns
    fv_s = sdf.filter(F.col("role") == "assistant").select(
        "conv_id", "ts", F.length("text").cast("double").alias("alen")
    )
    spine_s = sdf.filter(F.col("role") == "user").select("conv_id", "turn_idx", "ts")
    fv_p = pdf[pdf["role"] == "assistant"].assign(
        alen=lambda d: d["text"].str.len().astype(float)
    )[["conv_id", "ts", "alen"]]
    spine_p = pdf[pdf["role"] == "user"][["conv_id", "turn_idx", "ts"]]
    return fv_s, spine_s, fv_p, spine_p


def test_asof_backward_no_staleness(spark, transcripts_pair):
    fv_s, spine_s, fv_p, spine_p = _frames(spark, transcripts_pair)
    got = (
        asof_join(spine_s, fv_s, ["conv_id"], "ts", ["alen"])
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp = spine_p.copy().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    exp["alen"] = asof_backward(exp, fv_p, ["conv_id"], "ts", "alen", None)
    pd.testing.assert_series_equal(
        got["alen"], exp["alen"].astype(float), check_names=False
    )


def test_asof_staleness_cutoff(spark, transcripts_pair):
    fv_s, spine_s, fv_p, spine_p = _frames(spark, transcripts_pair)
    st_us = 60 * 1_000_000  # 60s — tighter than many gaps
    got = (
        asof_join(spine_s, fv_s, ["conv_id"], "ts", ["alen"], staleness_us=st_us)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp = spine_p.copy().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    exp["alen"] = asof_backward(
        exp, fv_p, ["conv_id"], "ts", "alen", pd.Timedelta(seconds=60)
    )
    assert got["alen"].isna().any(), "staleness should null some values"
    pd.testing.assert_series_equal(
        got["alen"], exp["alen"].astype(float), check_names=False
    )


def test_asof_zero_temporal_leakage(spark):
    """Plant a future-only sentinel: no spine row before it may see it —
    even when the sentinel is the NEAREST value (this is where the
    LabSDK's merge_asof(direction='nearest') would leak;
    we implement the production backward semantics)."""
    spine = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a"],
                "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:00:10"]),
            }
        )
    )
    fv = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a"],
                "ts": pd.to_datetime(["2023-12-31 00:00:00", "2024-01-01 00:00:11"]),
                "v": [1.0, 666.0],  # 666 = future sentinel, 1s after spine
            }
        )
    )
    got = (
        asof_join(spine, fv, ["k"], "ts", ["v"])
        .orderBy("ts")
        .toPandas()
    )
    assert got["v"].tolist() == [1.0, 1.0], "future value leaked into the past"


def test_asof_same_ts_visible(spark):
    """A feature row AT the spine ts is visible (ts ≤ spine ts)."""
    spine = spark.createDataFrame(
        pd.DataFrame({"k": ["a"], "ts": pd.to_datetime(["2024-01-01 12:00:00"])})
    )
    fv = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a"],
                "ts": pd.to_datetime(["2024-01-01 11:00:00", "2024-01-01 12:00:00"]),
                "v": [1.0, 2.0],
            }
        )
    )
    got = asof_join(spine, fv, ["k"], "ts", ["v"]).toPandas()
    assert got["v"].tolist() == [2.0]


def test_asof_multi_value_columns_one_pass(spark, transcripts_pair):
    """Several features with different staleness merge in one call."""
    sdf, pdf = transcripts_pair
    fv = sdf.select(
        "conv_id",
        "ts",
        F.when(F.col("role") == "assistant", F.length("text").cast("double")).alias(
            "alen"
        ),
        F.when(F.col("role") == "tool", F.col("tool")).alias("last_tool"),
    ).filter(F.col("alen").isNotNull() | F.col("last_tool").isNotNull())
    spine = sdf.filter(F.col("role") == "user").select("conv_id", "turn_idx", "ts")
    got = (
        asof_join(
            spine,
            fv,
            ["conv_id"],
            "ts",
            ["alen", "last_tool"],
            staleness_us={"alen": 0, "last_tool": 30 * 60 * 1_000_000},
        )
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp = (
        pdf[pdf["role"] == "user"][["conv_id", "turn_idx", "ts"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    fv_alen = pdf[pdf["role"] == "assistant"].assign(
        alen=lambda d: d["text"].str.len().astype(float)
    )
    fv_tool = pdf[pdf["role"] == "tool"]
    exp["alen"] = asof_backward(exp, fv_alen, ["conv_id"], "ts", "alen", None)
    exp["last_tool"] = asof_backward(
        exp, fv_tool, ["conv_id"], "ts", "tool", pd.Timedelta(minutes=30)
    )
    pd.testing.assert_series_equal(
        got["alen"], exp["alen"].astype(float), check_names=False
    )
    pd.testing.assert_series_equal(
        got["last_tool"].fillna("∅"), exp["last_tool"].fillna("∅"), check_names=False
    )


def test_asof_duplicate_ts_deterministic_with_feature_order(spark):
    """Same-(key, ts) feature rows: feature_order_col makes the joined
    value deterministic (highest order id wins) regardless of physical
    layout. At 10^12 rows same-microsecond collisions are certain."""
    import datetime as dt

    from pyspark.sql import functions as F

    from raptor_spark.operators.asof import asof_join

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    fv_rows = [("k", t, float(i), i) for i in range(50)]  # 50 ties
    spine = spark.createDataFrame([("k", t)], "key string, ts timestamp")
    for rp in (1, 7):
        fv = spark.createDataFrame(
            fv_rows, "key string, ts timestamp, v double, seq long"
        ).repartition(rp)
        out = asof_join(
            spine, fv, ["key"], "ts", ["v"], feature_order_col="seq"
        ).collect()
        assert out[0]["v"] == 49.0  # max seq wins, any partitioning
