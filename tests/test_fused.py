"""Fused single-pass historical plan ≡ general union-merge plan."""

import datetime as dt

from pyspark.sql import functions as F

from raptor_spark.backfill import transcript_feature_set
from raptor_spark.plans.historical import get_historical, get_historical_fused
from raptor_spark.sources.transcripts import transcripts


def _rows(df):
    cols = sorted(df.columns)
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_fused_equals_general(spark):
    src = transcripts(spark, n_convs=30).cache()
    fs = transcript_feature_set()
    fused = get_historical(src, fs)                # auto-fuses
    general = get_historical(src, fs, fuse=False)  # union-merge as-of
    assert sorted(fused.columns) == sorted(general.columns)
    assert _rows(fused) == _rows(general)


def test_fused_is_selected(spark):
    """The transcript feature set must hit the fused plan: no Union in
    the optimized plan, exactly one Exchange (one shuffle)."""
    src = transcripts(spark, n_convs=5)
    plan = get_historical(src, transcript_feature_set())._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    assert plan.count("Exchange") == 1


def test_fused_since_until(spark):
    src = transcripts(spark, n_convs=30).cache()
    fs = transcript_feature_set()
    since = dt.datetime(2023, 11, 15, 2, 0, 0)
    until = dt.datetime(2023, 11, 15, 8, 0, 0)
    fused = get_historical(src, fs, since=since, until=until)
    general = get_historical(src, fs, since=since, until=until, fuse=False)
    assert _rows(fused) == _rows(general)
    ts = [r["ts"] for r in fused.select("ts").collect()]
    assert ts and all(since <= t <= until for t in ts)


def test_filtered_keep_previous_fuses_and_matches_general(spark):
    """filter + keep_previous now joins the fused plan (lag IGNORE
    NULLS walks update rows): one shuffle, same rows as the general
    union-merge path."""
    from raptor_spark.specs import FeatureSetSpec, feature

    fs = FeatureSetSpec(
        features=[
            feature("turn_len", "conv_id", "cast(length(text) as double)",
                    staleness="1h"),
            feature("last_tool_len", "conv_id", "cast(length(text) as double)",
                    staleness="2h", filter="role = 'tool'",
                    keep_previous=(2, "2h")),
            feature("last_user_len", "conv_id", "cast(length(text) as double)",
                    filter="role = 'user'",
                    keep_previous=(1, "0")),
        ],
        key_feature="turn_len",
    )
    src = transcripts(spark, n_convs=20).cache()
    fused = get_historical(src, fs)
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan and plan.count("Exchange") == 1
    general = get_historical(src, fs, fuse=False)
    assert sorted(fused.columns) == sorted(general.columns)
    assert _rows(fused) == _rows(general)


def test_aggr_keep_previous_falls_back(spark):
    """keep_previous on an aggregated feature needs a second window
    pass — must take the general union-merge path and still compute."""
    from raptor_spark.specs import FeatureSetSpec, feature

    fs = FeatureSetSpec(
        features=[
            feature("turn_len", "conv_id", "cast(length(text) as double)",
                    staleness="1h"),
            feature("chars_1h", "conv_id", "cast(length(text) as double)",
                    aggr=["sum"], over="1h", keep_previous=(1, "0")),
        ],
        key_feature="turn_len",
    )
    src = transcripts(spark, n_convs=10)
    out = get_historical(src, fs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Union" in plan  # general union-merge path
    assert out.count() == src.count()
    assert "chars_1h_sum_prev1" in out.columns
