"""Iceberg-path exercise, gated on a configured runtime (the sandbox
ships no iceberg-spark-runtime jar, so these SKIP here — on a cluster
with `spark.sql.catalog.ice` configured they run the real DDL + append
+ partition-pruned read path the parquet tests mirror). Same gating
pattern as the Kafka `kafka_available` tests."""

import pytest

from pyspark.sql import functions as F

from raptor_spark.sources.catalog import Catalog, iceberg_available
from raptor_spark.sources.transcripts import transcripts


def _require_iceberg(spark):
    if not iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime jar / catalog not configured")


def test_iceberg_transcript_roundtrip(spark):
    """CREATE TABLE PARTITIONED BY (bucket(conv_id), days(ts)) +
    overwritePartitions + read-back equality."""
    _require_iceberg(spark)
    cat = Catalog(spark, kind="iceberg", n_buckets=4)
    src = transcripts(spark, n_convs=5)
    cat.write_transcripts(src, "t_roundtrip")
    got = cat.read("t_roundtrip")
    assert got.count() == src.count()
    assert sorted(got.columns) == sorted(src.columns)


def test_iceberg_feature_values_pruned_scan(spark):
    """Feature-values table partitioned by (fqn, days(ts)): a
    single-fqn read must carry a partition/file filter on fqn."""
    _require_iceberg(spark)
    from raptor_spark.plans.replay import replay
    from raptor_spark.specs import feature

    cat = Catalog(spark, kind="iceberg", n_buckets=4)
    src = transcripts(spark, n_convs=5)
    spec = feature("turn_len", "conv_id", "cast(length(text) as double)")
    cat.write_feature_values(replay(src, spec), "t_features")
    one = cat.read_feature_values("t_features", [spec.fqn])
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "fqn" in plan
    assert one.count() == src.count()


def test_iceberg_bucket_dedup_merge(spark):
    """The cleanup-MERGE analog over Iceberg: re-flushed window buckets
    (alive + final rows for the same (fqn, keys, bucket)) collapse to
    the final row through dedup_bucket_writes on the table read."""
    _require_iceberg(spark)
    from raptor_spark.operators.window_agg import dedup_bucket_writes

    cat = Catalog(spark, kind="iceberg", n_buckets=4)
    rows = [
        ("f.x", "k1", 1, True, 1.0),
        ("f.x", "k1", 1, False, 2.0),   # final flush of same bucket
        ("f.x", "k2", 1, True, 3.0),
    ]
    fv = spark.createDataFrame(
        rows, "fqn string, keys string, bucket long, bucket_active boolean, value double"
    ).withColumn("ts", F.timestamp_micros(F.col("bucket") * 600_000_000))
    cat.write_feature_values(fv, "t_buckets")
    got = dedup_bucket_writes(
        spark.table(cat._ident("t_buckets"))
    ).orderBy("keys").collect()
    assert [(r["keys"], r["bucket_active"], r["value"]) for r in got] == [
        ("k1", False, 2.0),
        ("k2", True, 3.0),
    ]
