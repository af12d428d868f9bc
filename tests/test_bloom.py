"""Distributed mergeable Bloom filter (functions/sketches.py) — the
bounded-memory membership primitive. Corpus parity is pinned by the
bloom_dedup driver oracle row; these pin the guarantees and the merge
algebra."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from raptor_spark.functions.sketches import bloom_build, bloom_probe

M, K = 4096, 5


def _items(spark, lo, hi):
    return spark.createDataFrame(
        [(f"item{i}",) for i in range(lo, hi)], "fp string"
    )


def test_no_false_negatives(spark):
    corpus = _items(spark, 0, 200)
    bloom = bloom_build(corpus, "fp", m_bits=M, k=K)
    hits = {
        r["fp"]: r["bloom_hit"]
        for r in bloom_probe(bloom, corpus, "fp", m_bits=M, k=K).collect()
    }
    assert all(hits.values()) and len(hits) == 200


def test_absent_items_mostly_miss(spark):
    bloom = bloom_build(_items(spark, 0, 100), "fp", m_bits=M, k=K)
    probe = bloom_probe(
        bloom, _items(spark, 1000, 1100), "fp", m_bits=M, k=K
    )
    n_fp = probe.where("bloom_hit").count()
    # 100*5 bits of 4096 -> theoretical fp ~ 2e-5; even 10x that
    # rounds to zero hits out of 100
    assert n_fp == 0


def test_merge_is_union(spark):
    """bit_or merge of two corpora's filters == the filter of their
    union (the mergeable-sketch property the build docstring sells);
    the constant geometry columns ride along via max."""
    a = bloom_build(_items(spark, 0, 50), "fp", m_bits=M, k=K)
    b = bloom_build(_items(spark, 50, 100), "fp", m_bits=M, k=K)
    merged = (
        a.unionByName(b)
        .groupBy("word")
        .agg(
            F.bit_or("bits").alias("bits"),
            F.max("m_bits").alias("m_bits"),
            F.max("k").alias("k"),
        )
    )
    direct = bloom_build(_items(spark, 0, 100), "fp", m_bits=M, k=K)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_word_count_bounded(spark):
    bloom = bloom_build(_items(spark, 0, 10_000), "fp", m_bits=M, k=K)
    assert bloom.count() <= M // 63 + 1


def test_sign_bit_never_set(spark):
    """63 bits/word keeps every stored long non-negative — the
    portability contract with the DuckDB oracle."""
    bloom = bloom_build(_items(spark, 0, 5000), "fp", m_bits=M, k=K)
    assert bloom.where(F.col("bits") < 0).count() == 0


def test_rejects_nonpositive_params(spark):
    with pytest.raises(ValueError):
        bloom_build(_items(spark, 0, 5), "fp", m_bits=0, k=K)
    with pytest.raises(ValueError):
        bloom_build(_items(spark, 0, 5), "fp", m_bits=M, k=0)


def test_geometry_mismatch_raises_not_false_negatives(spark):
    """Probing with different m_bits/k than the build must FAIL, not
    silently report every member absent."""
    from py4j.protocol import Py4JJavaError

    bloom = bloom_build(_items(spark, 0, 50), "fp", m_bits=M, k=K)
    bad = bloom_probe(bloom, _items(spark, 0, 10), "fp",
                      m_bits=2 * M, k=K)
    with pytest.raises(Exception) as exc:
        bad.collect()
    assert "geometry mismatch" in str(exc.value)


def test_null_items_excluded_both_sides(spark):
    docs = spark.createDataFrame(
        [("item1",), (None,), ("item2",)], "fp string"
    )
    bloom = bloom_build(docs, "fp", m_bits=M, k=K)
    assert bloom.where(F.col("word").isNull()).count() == 0
    out = bloom_probe(bloom, docs, "fp", m_bits=M, k=K)
    rows = {r["fp"]: r["bloom_hit"] for r in out.collect()}
    assert rows == {"item1": True, "item2": True}  # null row excluded


def test_reserved_name_collision_raises(spark):
    bloom = bloom_build(_items(spark, 0, 5), "fp", m_bits=M, k=K)
    batch = _items(spark, 0, 5).withColumn("bits", F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        bloom_probe(bloom, batch, "fp", m_bits=M, k=K)
