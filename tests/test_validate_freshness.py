"""P9 plan-build type validation and W5 freshness flag."""

import pytest
from pyspark.sql import functions as F

from raptor_spark.operators.laglead import with_freshness_flag
from raptor_spark.plans.validate import validate_feature_set, validate_spec
from raptor_spark.sources.transcripts import transcripts
from raptor_spark.specs import FeatureSetSpec, feature


def test_numeric_aggr_over_string_rejected(spark):
    src = transcripts(spark, 3)
    bad = feature("roles_sum", "conv_id", "role", aggr=["sum"], over="1h")
    with pytest.raises(TypeError, match="require a numeric value"):
        validate_spec(src, bad)


def test_count_over_string_ok(spark):
    src = transcripts(spark, 3)
    ok = feature("roles_cnt", "conv_id", "role",
                 aggr=["count", "distinct_count"], over="1h")
    validate_spec(src, ok)  # no raise


def test_unresolvable_expr_raises_at_build(spark):
    from pyspark.sql.utils import AnalysisException

    src = transcripts(spark, 3)
    bad = feature("oops", "conv_id", "no_such_column + 1", staleness="1h")
    with pytest.raises(AnalysisException):
        validate_spec(src, bad)


def test_validate_feature_set(spark):
    from raptor_spark.backfill import transcript_feature_set

    validate_feature_set(transcripts(spark, 3), transcript_feature_set())


def test_freshness_flag(spark):
    df = spark.createDataFrame(
        [("2024-01-01 10:00:00", "2024-01-01 10:30:00"),
         ("2024-01-01 10:00:00", "2024-01-01 12:00:00")],
        "vts string, ats string",
    ).select(
        F.to_timestamp("vts").alias("vts"), F.to_timestamp("ats").alias("ats")
    )
    out = with_freshness_flag(df, "vts", "ats", 3_600_000_000)
    flags = [r["fresh"] for r in out.orderBy("ats").collect()]
    assert flags == [True, False]
