"""Type-system coverage (SURVEY §1.2): list- and timestamp-valued
features flow through replay, the as-of merge, and the fused plan
(reference primitives: string/int/float/bool/timestamp + []T,
api/primitives.go:27-42)."""

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, TimestampType

from raptor_spark.plans.historical import get_historical
from raptor_spark.plans.replay import replay_wide
from raptor_spark.sources.transcripts import transcripts
from raptor_spark.specs import FeatureSetSpec, feature


def test_list_valued_feature(spark):
    src = transcripts(spark, 5)
    words = feature(
        "words", "conv_id", "split(text, ' ')", staleness="1h"
    )
    fv = replay_wide(src, words)
    assert isinstance(fv.schema["words"].dataType, ArrayType)

    fs = FeatureSetSpec(
        features=[
            feature("turn_len", "conv_id", "cast(length(text) as double)"),
            words,
        ],
        key_feature="turn_len",
    )
    wide = get_historical(src, fs)
    assert isinstance(wide.schema["words"].dataType, ArrayType)
    row = wide.filter(F.col("words").isNotNull()).first()
    assert isinstance(row["words"], list) and len(row["words"]) >= 1


def test_timestamp_valued_feature(spark):
    src = transcripts(spark, 5)
    fs = FeatureSetSpec(
        features=[
            feature("turn_len", "conv_id", "cast(length(text) as double)"),
            feature("tool_seen_at", "conv_id", "ts", staleness="2h",
                    filter="role = 'tool'"),
        ],
        key_feature="turn_len",
    )
    wide = get_historical(src, fs)
    assert isinstance(wide.schema["tool_seen_at"].dataType, TimestampType)
    # PIT: the joined timestamp never exceeds the spine ts (no leakage)
    assert wide.filter(F.col("tool_seen_at") > F.col("ts")).count() == 0


def test_bool_and_string_features_fused(spark):
    src = transcripts(spark, 5)
    fs = FeatureSetSpec(
        features=[
            feature("turn_len", "conv_id", "cast(length(text) as double)"),
            feature("is_tool", "conv_id", "role = 'tool'"),
            feature("last_role", "conv_id", "role"),
        ],
        key_feature="turn_len",
    )
    wide = get_historical(src, fs)
    assert wide.schema["is_tool"].dataType.simpleString() == "boolean"
    assert isinstance(wide.schema["last_role"].dataType, StringType)
    assert wide.count() == src.count()


def test_marker_hits_counts_adjacent_tokens(spark):
    """'the the' = TWO stopword tokens (the padded substring-replace
    counted one — review r3); tab/newline separators count too."""
    from raptor_spark.functions.text import stopword_ratio

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("the the",), ("the\tthe\nthe",), ("spam ham",), ("",)],
        "text string",
    )
    got = [
        r["r"]
        for r in df.select(stopword_ratio("text").alias("r")).collect()
    ]
    assert got == [1.0, 1.0, 0.0, 0.0]


def test_minhash_rejects_bad_band_split(spark):
    import pytest

    from raptor_spark.functions.dedup import minhash_lsh_pairs

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="multiple of bands"):
        minhash_lsh_pairs(df, "doc_id", k=4, bands=8)
    with pytest.raises(ValueError, match="multiple of bands"):
        minhash_lsh_pairs(df, "doc_id", k=16, bands=5)
