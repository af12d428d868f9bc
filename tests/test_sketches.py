"""Count-min sketch (functions/sketches.py) properties.

Reference has no sketch operators beyond approx-distinct — this is a
training-pipeline extension; estimate parity also pinned by the
cms_heavy_hitters oracle row (the md5 hash rows make estimates
bit-reproducible across engines).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from raptor_spark.functions.sketches import cms_build, cms_estimate

D, W = 4, 64


def _items(spark, n=3000):
    """Zipf-ish stream: item 'tok<k>' appears roughly n/(k+1) times."""
    return spark.range(n).select(
        F.concat(
            F.lit("tok"), (F.col("id") % (F.col("id") % 37 + 1)).cast("string")
        ).alias("token")
    )


def test_cms_overestimates_never_under(spark):
    items = _items(spark).cache()
    cells = cms_build(items, "token", depth=D, width=W)
    exact = items.groupBy("token").agg(F.count(F.lit(1)).alias("exact_n"))
    est = cms_estimate(exact, cells, "token", depth=D, width=W)
    assert est.filter(F.col("est_n") < F.col("exact_n")).count() == 0
    items.unpersist()


def test_cms_cells_bounded_and_mass_conserved(spark):
    items = _items(spark)
    cells = cms_build(items, "token", depth=D, width=W).cache()
    assert cells.count() <= D * W
    # every hash row carries the full stream mass
    per_row = cells.groupBy("row").agg(F.sum("cell").alias("mass")).collect()
    n = items.count()
    assert len(per_row) == D and all(r["mass"] == n for r in per_row)
    cells.unpersist()


def test_cms_mergeable(spark):
    """Sketch of a union == union of sketches re-aggregated (the
    property that lets partial sketches merge across corpora/days)."""
    a = _items(spark, 1000)
    b = _items(spark, 2200).exceptAll(_items(spark, 1000))
    whole = cms_build(_items(spark, 2200), "token", depth=D, width=W)
    merged = (
        cms_build(a, "token", depth=D, width=W)
        .unionByName(cms_build(b, "token", depth=D, width=W))
        .groupBy("row", "col")
        .agg(F.sum("cell").alias("cell"))
    )
    assert whole.exceptAll(merged).count() == 0
    assert merged.exceptAll(whole).count() == 0


def test_cms_absent_item_estimates_from_collisions_only(spark):
    items = _items(spark, 500)
    cells = cms_build(items, "token", depth=D, width=W)
    probe = items.sparkSession.createDataFrame(
        [("never-seen-token-xyz",)], ["token"]
    )
    [row] = cms_estimate(probe, cells, "token", depth=D, width=W).collect()
    assert row["est_n"] >= 0  # collisions may inflate, never negative


def test_cms_weighted(spark):
    df = _items(spark, 200).withColumn("w", F.lit(3).cast("long"))
    cells = cms_build(df, "token", depth=D, width=W, weight_col="w")
    mass = cells.filter(F.col("row") == 0).agg(F.sum("cell")).collect()[0][0]
    assert mass == 600


def test_cms_validates_args(spark):
    with pytest.raises(ValueError):
        cms_build(_items(spark, 10), "token", depth=0)
