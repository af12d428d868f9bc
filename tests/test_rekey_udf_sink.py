"""P6 keys_expr re-keying, vectorized pandas_udf features, and the
feature-values sink layout."""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from raptor_spark.plans.replay import replay
from raptor_spark.sources.catalog import Catalog
from raptor_spark.sources.transcripts import transcripts
from raptor_spark.specs import FeatureSpec, feature


def test_keys_expr_rekeys(spark):
    """A feature can attribute its value to a different entity (the
    3-tuple return override): key by role instead of conv_id."""
    src = transcripts(spark, 6)
    spec = FeatureSpec(
        name="len_by_role",
        keys=("conv_id",),
        expr="cast(length(text) as double)",
        keys_expr="role",
    )
    fv = replay(src, spec)
    keys = {r["keys"] for r in fv.select("keys").distinct().collect()}
    assert keys == {"system", "user", "assistant", "tool"}
    n = fv.count()
    assert n == src.count()


def test_keys_expr_composite_rekeys(spark):
    """Multi-key re-keying: one expr per key column (the reference's
    composite-key dict return, runtime/svc.py:132-142)."""
    src = transcripts(spark, 6)
    spec = FeatureSpec(
        name="len_by_role_tool",
        keys=("role", "tool_bucket"),
        expr="cast(length(text) as double)",
        keys_expr=("role", "coalesce(tool, 'none')"),
    )
    fv = replay(src, spec)
    keys = {r["keys"] for r in fv.select("keys").distinct().collect()}
    # encoded as 'role;tool' (';'.join, types/feature.py:259-266)
    assert all(";" in k for k in keys)
    assert any(k.endswith(";none") for k in keys)
    assert fv.count() == src.count()


def test_keys_expr_arity_mismatch_raises(spark):
    import pytest

    src = transcripts(spark, 2)
    spec = FeatureSpec(
        name="bad",
        keys=("a", "b"),
        expr="1.0",
        keys_expr="role",
    )
    with pytest.raises(ValueError, match="keys_expr provides 1"):
        replay(src, spec).count()


def test_pandas_udf_feature(spark):
    """The escape hatch for handlers Column exprs can't express:
    a vectorized (Arrow-batched) pandas_udf as the feature expr —
    never row-at-a-time Python."""

    @pandas_udf("double")
    def question_marks(text: pd.Series) -> pd.Series:
        return text.str.count("!").astype("float64")

    src = transcripts(spark, 6).withColumn(
        "text", F.concat("text", F.lit("!!"))
    )
    spec = feature(
        "excl", "conv_id", lambda df: question_marks(df["text"]),
        staleness="1h",
    )
    fv = replay(src, spec)
    vals = {r["value"] for r in fv.select("value").distinct().collect()}
    assert vals == {2.0}


def test_feature_values_sink_layout(spark, tmp_path):
    src = transcripts(spark, 8)
    fv = replay(
        src,
        feature("turn_len", "conv_id", "cast(length(text) as double)",
                staleness="1h"),
    )
    cat = Catalog(spark, root=str(tmp_path))
    cat.write_feature_values(fv, "fv")
    back = spark.read.parquet(str(tmp_path / "fv"))
    assert back.count() == fv.count()
    # fqn is a partition dir → scans for one feature prune all others
    import os

    dirs = os.listdir(str(tmp_path / "fv"))
    assert any(d.startswith("fqn=") for d in dirs)
    one = back.filter(F.col("fqn") == "default.turn_len")
    assert one.count() == fv.count()
