"""Mergeable frequency sketches: count-min (CMS) cells + point
estimates, fully JVM-side and DETERMINISTIC — the d hash rows are
md5-derived (engine-portable, DuckDB can replay them bit-for-bit), so
unlike most sketch implementations the estimates themselves are
oracle-checkable, not just accuracy-gated.

Scale shape (the reason a 100 TB pipeline carries a CMS instead of a
token groupBy): the sketch build explodes each item into its d
(row, col) cells and aggregates counts per cell — map-side combine
collapses every partition to ≤ d·width partial rows, so the ONLY
shuffle moves ≤ partitions·d·width pre-aggregated rows regardless of
corpus size, and the finished sketch (d·width longs) broadcasts for
estimate joins. Exact per-token counts, by contrast, shuffle the
whole vocabulary. The classic CMS point-estimate guarantee applies
(est ≥ true; est ≤ true + εN w.p. 1−δ for width=⌈e/ε⌉, depth=⌈ln 1/δ⌉
— Cormode & Muthukrishnan 2005).

Reference has no sketch operators beyond approx-distinct; this is a
training-pipeline extension (corpus token statistics at scale), built
on the same md5-portability idiom as functions/dedup.md5_long.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_long


def cms_hash(item: Column, row: int, width: int) -> Column:
    """Column: CMS column index of ``item`` for hash row ``row`` —
    md5_long("cms{row}|" + item) % width (md5_long is 60-bit
    non-negative, so % is already a pmod)."""
    return md5_long(
        F.concat(F.lit(f"cms{row}|"), item.cast("string"))
    ) % width


def cms_build(
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch cells of an item stream: one row per occupied
    (row, col) cell with the summed count/weight. ≤ depth·width rows
    out; map-side combine keeps the shuffle bounded by d·width per
    input partition. Merging sketches of two corpora = union +
    re-groupBy (cells are additive)."""
    if depth <= 0 or width <= 0:
        raise ValueError(f"depth/width must be > 0, got {depth}/{width}")
    it = F.col(item_col)
    w = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    rows = F.explode(
        F.array(*[
            F.struct(
                F.lit(r).alias("row"),
                cms_hash(it, r, width).alias("col"),
            )
            for r in range(depth)
        ])
    ).alias("_rc")
    return (
        items.select(rows, w.alias("_w"))
        .select("_rc.row", "_rc.col", "_w")
        .groupBy("row", "col")
        .agg(F.sum("_w").alias("cell"))
    )


def cms_estimate(
    queries: DataFrame,
    cells: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate each query item's frequency: min over the d
    cells it hashes to. ``cells`` (≤ d·width rows) is broadcast, so
    the estimate pass is a map-side join — no shuffle of the corpus,
    one tiny shuffle for the per-item min."""
    it = F.col(item_col)
    probes = queries.select(
        "*",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("row"),
                    cms_hash(it, r, width).alias("col"),
                )
                for r in range(depth)
            ])
        ).alias("_rc"),
    ).select("*", "_rc.row", "_rc.col").drop("_rc")
    other = [c for c in queries.columns]
    return (
        probes.join(F.broadcast(cells), ["row", "col"], "left")
        # an empty cell means the item never occurred
        .withColumn("cell", F.coalesce(F.col("cell"), F.lit(0)))
        .groupBy(*other)
        .agg(F.min("cell").alias("est_n"))
    )
