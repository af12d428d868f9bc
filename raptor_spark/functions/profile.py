"""Corpus / table profiling: per-column stats in one pass, long
format — the standard pre-training data-audit step (null rates,
cardinalities, value ranges, text lengths) run before a 100 TB corpus
is admitted to a mix.

One ``agg`` computes every column's metrics (Spark plans ONE scan;
with ``exact_distinct=True`` the multi-countDistinct goes through one
Expand + partial-agg exchange — fine to a few dozen columns; at
100 TB-wide audits pass ``exact_distinct=False`` for
``approx_count_distinct`` which keeps the whole pass to a single
map-side-combined aggregate with NO expand). The single result row is
then unpivoted driver-side into (column, metric...) rows — k rows, no
second job.

min/max are computed on the NATIVE type, then cast to string for the
uniform long schema — profile numeric columns knowing engines format
doubles differently (int/string/date columns round-trip exactly; the
driver query sticks to those).

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
        aggs.append(
            (
                F.countDistinct(col)
                if exact_distinct
                else F.approx_count_distinct(col)
            ).alias(f"__nd_{c}")
        )
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
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_s"),
                F.col(f"__mx_{c}").alias("max_s"),
                F.col(f"__al_{c}").alias("avg_len6"),
            )
        )
    return one.select(
        F.explode(F.array(*parts)).alias("p")
    ).select("p.*")
