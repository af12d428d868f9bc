"""Distributed sequence packing (functions/packing.py) invariants.

Reference has no packing stage — this is a training-pipeline
extension; semantics also pinned by the pack_sequences oracle row.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from raptor_spark.functions.packing import pack_sequences


def _docs(spark, n=400, seed_mod=37):
    """n docs with deterministic, varied token counts (1..~120, plus
    a few giants longer than any seq_len under test and some zeros)."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 53 == 0, F.lit(0))  # excluded
        .when(F.col("id") % 41 == 0, F.lit(777))  # spans many seqs
        .otherwise((F.col("id") * seed_mod) % 120 + 1)
        .cast("int")
        .alias("n_tokens"),
    )


def test_pack_conserves_doc_tokens(spark):
    docs = _docs(spark)
    out = pack_sequences(docs, seq_len=256, eod=1, n_blocks=16).cache()
    per_doc = (
        out.groupBy("doc_id").agg(F.sum("len").alias("tot")).join(docs, "doc_id")
    )
    # every positive-token doc fully placed, nothing else
    assert per_doc.filter(F.col("tot") != F.col("n_tokens")).count() == 0
    assert out.select("doc_id").distinct().count() == docs.filter(
        F.col("n_tokens") > 0
    ).count()
    out.unpersist()


def test_pack_sequences_exactly_filled(spark):
    """Sequences are contiguously filled: within a sequence,
    consecutive slices are separated by exactly one position (the eod
    between docs), the first slice starts at 0 or 1 (1 when the
    previous doc's eod landed on the boundary position), and every
    non-final sequence is filled to seq_len-1 or seq_len (seq_len-1
    when the closing eod is its last position)."""
    seq_len = 256
    docs = _docs(spark)
    out = pack_sequences(docs, seq_len=seq_len, eod=1, n_blocks=16).cache()
    w = Window.partitionBy("seq_id").orderBy("seq_off")
    g = out.withColumn(
        "prev_end", F.lag(F.col("seq_off") + F.col("len")).over(w)
    )
    assert (
        g.filter(
            F.col("prev_end").isNotNull()
            & (F.col("seq_off") != F.col("prev_end") + 1)
        ).count()
        == 0
    )
    assert (
        g.filter(F.col("prev_end").isNull() & (F.col("seq_off") > 1)).count()
        == 0
    )
    ends = out.groupBy("seq_id").agg(
        F.max(F.col("seq_off") + F.col("len")).alias("end")
    )
    last_seq = ends.agg(F.max("seq_id")).collect()[0][0]
    assert (
        ends.filter(
            (F.col("seq_id") != last_seq) & (F.col("end") < seq_len - 1)
        ).count()
        == 0
    )
    out.unpersist()


def test_pack_deterministic_under_partitioning(spark):
    docs = _docs(spark, n=300)
    a = pack_sequences(docs, seq_len=128, n_blocks=8)
    b = pack_sequences(docs.repartition(13, "doc_id"), seq_len=128, n_blocks=8)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # and independent of n_blocks (two-level scan is exact)
    c = pack_sequences(docs, seq_len=128, n_blocks=64)
    assert a.exceptAll(c).count() == 0 and c.exceptAll(a).count() == 0


def test_pack_slices_within_bounds(spark):
    out = pack_sequences(_docs(spark), seq_len=100, n_blocks=4)
    bad = out.filter(
        (F.col("seq_off") < 0)
        | (F.col("seq_off") + F.col("len") > 100)
        | (F.col("len") <= 0)
        | (F.col("doc_off") < 0)
    )
    assert bad.count() == 0


def test_pack_validates_args(spark):
    docs = _docs(spark, n=10)
    with pytest.raises(ValueError):
        pack_sequences(docs, seq_len=0)
    with pytest.raises(ValueError):
        pack_sequences(docs, eod=-1)
    with pytest.raises(ValueError):
        pack_sequences(docs, n_blocks=12)  # not a power of 2
