"""Self-test for tools/plan_audit.py's scale-killer detector.

Round 3 found the no-partition-window regex dead on Spark 4.1 (it
expected a literal ``, []`` which this version never prints — empty
lists are OMITTED), so every "1-part window: no" cell in PLANS.md was
unverified. These tests pin the detector against real plans from this
JVM: a deliberately global window MUST be flagged, partitioned windows
(ordered or not) must NOT."""

from __future__ import annotations

import os
import sys

from pyspark.sql import Window as W
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tools")
)
from plan_audit import partitionless_windows  # noqa: E402


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _base(spark):
    return spark.range(100).select(
        F.col("id"), (F.col("id") % 3).alias("k")
    )


def test_global_ordered_window_is_flagged(spark):
    df = _base(spark).withColumn("r", F.row_number().over(W.orderBy("id")))
    unbounded, limit_fed = partitionless_windows(_plan(df))
    assert unbounded, "global ordered window (2-group print form) not detected"


def test_global_unordered_window_is_flagged(spark):
    df = _base(spark).withColumn("m", F.max("id").over(W.partitionBy()))
    unbounded, limit_fed = partitionless_windows(_plan(df))
    assert unbounded, "global unordered window (1-group print form) not detected"


def test_partitioned_windows_not_flagged(spark):
    ordered = _base(spark).withColumn(
        "r", F.row_number().over(W.partitionBy("k").orderBy("id"))
    )
    unordered = _base(spark).withColumn(
        "s", F.sum("id").over(W.partitionBy("k"))
    )
    both = _base(spark).withColumn(
        "r", F.row_number().over(W.partitionBy("k").orderBy("id"))
    ).withColumn("s", F.sum("id").over(W.partitionBy("k")))
    for df in (ordered, unordered, both):
        assert partitionless_windows(_plan(df)) == ([], [])


def test_mixed_plan_flags_only_the_global_one(spark):
    df = (
        _base(spark)
        .withColumn("s", F.sum("id").over(W.partitionBy("k").orderBy("id")))
        .withColumn("r", F.row_number().over(W.orderBy(F.col("s").desc())))
    )
    unbounded, limit_fed = partitionless_windows(_plan(df))
    assert len(unbounded) == 1 and limit_fed == []
    assert "row_number" in unbounded[0]


def test_limit_on_one_join_side_does_not_launder_global_window(spark):
    """A Limit feeding ONE side of a join below the window does not
    bound the window's frame — must stay flagged unbounded even when
    'TakeOrderedAndProject' appears within the lookahead lines."""
    small = spark.range(10).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    ).orderBy(F.col("v").desc()).limit(5)
    big = _base(spark)
    joined = big.join(small, "k").withColumn(
        "r", F.row_number().over(W.orderBy(F.col("id").desc()))
    )
    unbounded, limit_fed = partitionless_windows(_plan(joined))
    assert unbounded, "global window over a joined frame must stay flagged"


def test_limit_fed_global_window_classified_bounded(spark):
    """A global rank window directly above TakeOrderedAndProject runs
    over <= k rows — must be reported as limit-fed, not unbounded
    (the bm25/token_freq top-k shape)."""
    df = (
        _base(spark)
        .orderBy(F.col("id").desc())
        .limit(5)
        .withColumn("r", F.row_number().over(W.orderBy(F.col("id").desc())))
    )
    unbounded, limit_fed = partitionless_windows(_plan(df))
    assert unbounded == []
    assert len(limit_fed) == 1
