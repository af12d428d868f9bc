"""historical_from_store: the production-shaped historical query — PIT
training set read from the MATERIALIZED feature-values table
(partition-pruned per-fqn scans, joined on encoded KEYS), equal to the
recompute-from-source path."""

from pyspark.sql import functions as F

from raptor_spark.plans.historical import get_historical, historical_from_store
from raptor_spark.plans.replay import replay
from raptor_spark.sources.catalog import Catalog
from raptor_spark.sources.transcripts import transcripts
from raptor_spark.specs import FeatureSetSpec, feature


def _rows(df):
    cols = sorted(df.columns)
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_store_read_equals_recompute(spark, tmp_path):
    src = transcripts(spark, 10).cache()
    turn_len = feature(
        "turn_len", "conv_id", "cast(length(text) as double)", staleness="30m"
    )
    chars_1h = feature(
        "chars_1h", "conv_id", "cast(length(text) as double)",
        aggr=["sum", "avg"], over="1h",
    )
    fs = FeatureSetSpec(features=[turn_len, chars_1h], key_feature="turn_len")

    cat = Catalog(spark, root=str(tmp_path))
    for spec in fs.features:
        cat.write_feature_values(replay(src, spec), "features")

    spine = src.filter(F.col("role") == "user").select("conv_id", "turn_idx", "ts")
    from_store = historical_from_store(cat, "features", fs, spine)
    recomputed = get_historical(src, fs, spine=spine)
    assert sorted(from_store.columns) == sorted(recomputed.columns)
    assert _rows(from_store) == _rows(recomputed)

    # the per-feature scan is partition-pruned to its fqn dirs
    one = cat.read_feature_values("features", ["default.turn_len"])
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "fqn" in plan and "PartitionFilters" in plan


def test_store_read_keep_previous_equals_recompute(spark, tmp_path):
    """keep_previous from the store: version columns are lagged over
    the materialized per-fqn update stream — equal to the
    recompute-from-source path (silently dropped before ADVICE r2)."""
    src = transcripts(spark, 10).cache()
    turn_len = feature(
        "turn_len", "conv_id", "cast(length(text) as double)",
        staleness="30m", keep_previous=(2, "1h"),
    )
    fs = FeatureSetSpec(features=[turn_len], key_feature="turn_len")

    cat = Catalog(spark, root=str(tmp_path))
    cat.write_feature_values(replay(src, turn_len), "features")

    spine = src.filter(F.col("role") == "user").select("conv_id", "ts")
    from_store = historical_from_store(cat, "features", fs, spine)
    recomputed = get_historical(src, fs, spine=spine)
    assert "turn_len_prev1" in from_store.columns
    assert "turn_len_prev2" in from_store.columns
    assert sorted(from_store.columns) == sorted(recomputed.columns)
    assert _rows(from_store) == _rows(recomputed)


def test_store_read_heterogeneous_families(spark, tmp_path):
    src = transcripts(spark, 8).cache()
    turn_len = feature(
        "turn_len", "conv_id", "cast(length(text) as double)", staleness="30m"
    )
    role_len = feature(
        "role_len", "role", "cast(length(text) as double)", staleness="30m"
    )
    fs = FeatureSetSpec(features=[turn_len, role_len], key_feature="turn_len")

    cat = Catalog(spark, root=str(tmp_path))
    for spec in fs.features:
        cat.write_feature_values(replay(src, spec), "features")

    spine = src.select("conv_id", "role", "ts")
    from_store = historical_from_store(cat, "features", fs, spine)
    recomputed = get_historical(src, fs, spine=spine)
    assert _rows(from_store) == _rows(recomputed)
