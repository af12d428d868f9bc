"""Batch inference op: mapInPandas scoring over a PIT feature frame."""

from pyspark.sql import functions as F

from raptor_spark.backfill import transcript_feature_set
from raptor_spark.functions.inference import linear_model, predict
from raptor_spark.plans.historical import get_historical
from raptor_spark.sources.transcripts import transcripts


def test_predict_over_historical(spark):
    src = transcripts(spark, 8)
    wide = get_historical(src, transcript_feature_set())
    cols = ["turn_len", "turns_10m_count"]
    scored = predict(
        wide, cols, model_id="m1",
        make_scorer=lambda: linear_model([0.5, 2.0], bias=1.0),
    )
    assert scored.schema["prediction"].dataType.typeName() == "double"
    bad = scored.filter(
        F.abs(
            F.col("prediction")
            - (1.0 + 0.5 * F.col("turn_len") + 2.0 * F.col("turns_10m_count"))
        ) > 1e-9
    ).count()
    assert bad == 0
    assert scored.count() == wide.count()


def test_predict_handles_nulls(spark):
    df = spark.createDataFrame(
        [(1.0, None), (None, 2.0)], "a double, b double"
    )
    out = predict(df, ["a", "b"], "m2", lambda: linear_model([1.0, 1.0]))
    vals = sorted(r["prediction"] for r in out.collect())
    assert vals == [1.0, 2.0]  # nulls score as 0 contribution
