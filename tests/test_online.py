"""Online store analog (S10): latest-per-key materialization, staleness
at read time, log-structured upsert + compaction, streaming upsert."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from raptor_spark.online import OnlineStore, online_from_historical
from raptor_spark.plans.replay import replay
from raptor_spark.sources.transcripts import transcripts
from raptor_spark.specs import feature


@pytest.fixture(scope="module")
def fv(spark):
    src = transcripts(spark, 6)
    spec = feature(
        "turn_len", "conv_id", "cast(length(text) as double)", staleness="1h"
    )
    return replay(src, spec).cache()


def test_materialize_serves_latest(spark, fv, tmp_path):
    store = OnlineStore(spark, str(tmp_path / "online"))
    online_from_historical(store, [fv])
    latest = store.read_latest()
    # one row per (fqn, keys)
    assert latest.count() == fv.select("fqn", "keys").distinct().count()
    # value == the max-ts row's value for a sample key
    k = fv.select("keys").first()["keys"]
    want = (
        fv.filter(F.col("keys") == k).orderBy(F.col("ts").desc()).first()["value"]
    )
    got = store.get(["default.turn_len"], k)
    assert got["default.turn_len"] == want


def test_get_staleness_and_missing(spark, fv, tmp_path):
    store = OnlineStore(spark, str(tmp_path / "online"))
    store.materialize(fv)
    k = fv.select("keys").first()["keys"]
    newest = fv.filter(F.col("keys") == k).agg(F.max("ts")).first()[0]
    st = {"default.turn_len": 3_600_000_000}
    fresh = store.get(
        ["default.turn_len"], k,
        as_of=newest + dt.timedelta(minutes=30), staleness_us=st,
    )
    assert fresh["default.turn_len"] is not None
    stale = store.get(
        ["default.turn_len"], k,
        as_of=newest + dt.timedelta(hours=2), staleness_us=st,
    )
    assert stale["default.turn_len"] is None  # older than max_stale → None
    missing = store.get(["default.nope"], k)
    assert missing["default.nope"] is None


def test_upsert_wins_and_compact(spark, fv, tmp_path):
    store = OnlineStore(spark, str(tmp_path / "online"))
    store.materialize(fv)
    k = fv.select("keys").first()["keys"]
    newer = spark.createDataFrame(
        [("default.turn_len", k, dt.datetime(2030, 1, 1), 999.0)],
        "fqn string, keys string, ts timestamp, value double",
    )
    store.upsert(newer)
    assert store.get(["default.turn_len"], k)["default.turn_len"] == 999.0
    n_latest = store.read_latest().count()
    store.compact()
    assert spark.read.parquet(store.path).count() == n_latest
    assert store.get(["default.turn_len"], k)["default.turn_len"] == 999.0


def test_upsert_same_ts_correction_wins(spark, tmp_path):
    """Last-write-wins at the SAME event ts: a later-generation upsert
    with a SMALLER value must beat the snapshot row (review r3 — a
    (ts, value)-desc tie rule served the stale 5.0 forever and compact
    discarded the correction)."""
    t = dt.datetime(2025, 6, 1, 12, 0, 0)
    store = OnlineStore(spark, str(tmp_path / "online"))
    base = spark.createDataFrame(
        [("f.x", "k1", t, 5.0)], "fqn string, keys string, ts timestamp, value double"
    )
    fix = spark.createDataFrame(
        [("f.x", "k1", t, 2.0)], "fqn string, keys string, ts timestamp, value double"
    )
    store.materialize(base, gen=0)
    store.upsert(fix, gen=1)
    assert store.get(["f.x"], "k1")["f.x"] == 2.0
    store.compact()
    assert store.get(["f.x"], "k1")["f.x"] == 2.0


def test_streaming_upsert(spark, fv, tmp_path):
    store = OnlineStore(spark, str(tmp_path / "online"))
    store.materialize(fv.filter(F.col("value") >= 0))
    src_path = str(tmp_path / "stream_src")
    fv.limit(50).write.parquet(src_path)
    stream = spark.readStream.schema(
        "fqn string, keys string, ts timestamp, value double"
    ).parquet(src_path)
    q = store.upsert_stream(stream, str(tmp_path / "ckpt"))
    q.awaitTermination()
    # read path still collapses to one row per key
    latest = store.read_latest()
    assert latest.groupBy("fqn", "keys").count().filter("count > 1").count() == 0
