"""Corpus / table profiling: per-column stats in long format — the
standard pre-training data-audit step (null rates, cardinalities,
value ranges, text lengths) run before a 100 TB corpus is admitted to
a mix.

Plan shape (both modes Expand-free — a multi-countDistinct Expand
multiplies every corpus row by n_cols through the partial aggregate,
the one shape that must NOT appear in a 100 TB audit):

* non-distinct metrics (null counts, native min/max, avg length) ride
  ONE wide aggregate — single scan, map-side combined, one result row
  unpivoted into (column, metric...) rows.
* ``exact_distinct=True``: cardinalities come from a SECOND pass that
  stacks (col_name, value) pairs and runs a single
  ``countDistinct`` per group — Spark rewrites a lone distinct
  aggregate into two-phase partial-distinct (dedup map-side, shuffle
  only unique (col_name, value) pairs), NO Expand. Exact distinct
  inherently moves unique values; this is its minimal shuffle.
* ``exact_distinct=False``: ``approx_count_distinct`` (HLL++) joins
  the wide aggregate — ONE scan, one map-side-combined agg, no second
  pass and no value shuffle at all. The 100 TB default when estimates
  suffice.

min/max are computed on the NATIVE type, then cast to string for the
uniform long schema — profile numeric columns knowing engines format
doubles differently (int/string/date columns round-trip exactly; the
driver query sticks to those). Exact cardinality counts distinct
STRINGIFIED values: injective for int/string/date/double columns
(Spark's shortest-repr double formatting), the types a profile audits.
Injectivity alone is not enough for float/double — native
COUNT(DISTINCT) is COARSER at ±0.0 (engines normalize -0.0 == 0.0 in
agg keys while the string reprs differ), so float/double values are
normalized with IEEE ``x + 0.0`` before the cast.

No reference analog — training-pipeline extension per the brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rounding import round6


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Long-format profile: one output row per column with
    ``(col_name, n_rows, n_null, n_distinct, min_s, max_s, avg_len6)``.
    ``n_distinct`` ignores NULLs (COUNT(DISTINCT) semantics in both
    engines); ``avg_len6`` is round6(avg(char_length(cast as string)))
    over non-null values, NULL for all-null columns."""
    cols = list(cols) if cols is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.count(F.when(col.isNull(), F.lit(1))).alias(f"__nn_{c}"))
        if not exact_distinct:
            aggs.append(F.approx_count_distinct(col).alias(f"__nd_{c}"))
        aggs.append(F.min(col).cast("string").alias(f"__mn_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"__mx_{c}"))
        aggs.append(
            round6(F.avg(F.length(col.cast("string")))).alias(f"__al_{c}")
        )
    one = df.agg(*aggs)
    parts = []
    for c in cols:
        parts.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n_rows"),
                F.col(f"__nn_{c}").alias("n_null"),
                (
                    F.col(f"__nd_{c}")
                    if not exact_distinct
                    else F.lit(None).cast("long")
                ).alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_s"),
                F.col(f"__mx_{c}").alias("max_s"),
                F.col(f"__al_{c}").alias("avg_len6"),
            )
        )
    long = one.select(F.explode(F.array(*parts)).alias("p")).select("p.*")
    if not exact_distinct:
        return long
    # exact cardinalities WITHOUT an Expand: stack (col_name, value)
    # and run ONE countDistinct per group — Catalyst rewrites the lone
    # distinct into two-phase partial-distinct (map-side dedup, shuffle
    # of unique pairs only). 5-row result broadcasts back onto the
    # unpivoted frame.
    # Negative zero: native COUNT(DISTINCT) normalizes -0.0 == 0.0 in
    # aggregation keys (both engines), but CAST AS STRING yields the
    # distinct reprs '-0.0' vs '0.0'. IEEE x + 0.0 maps -0.0 -> +0.0
    # and is exact for every other value (incl. NaN/inf), so adding
    # positive zero before the cast restores native-distinct semantics
    # for float/double columns.
    dtypes = dict(df.dtypes)

    def _sval(c: str):
        col = F.col(c)
        if dtypes.get(c) in ("float", "double"):
            col = col + F.lit(0.0).cast(dtypes[c])
        return col.cast("string")

    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        _sval(c).alias("val"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.*")
    nd = (
        stacked.where(F.col("val").isNotNull())
        .groupBy("col_name")
        .agg(F.countDistinct("val").alias("__nd"))
    )
    return (
        long.drop("n_distinct")
        .join(F.broadcast(nd), "col_name", "left")
        .select(
            "col_name",
            "n_rows",
            "n_null",
            # all-NULL column: no stacked rows survive -> 0 distinct
            F.coalesce(F.col("__nd"), F.lit(0).cast("long")).alias("n_distinct"),
            "min_s",
            "max_s",
            "avg_len6",
        )
    )
