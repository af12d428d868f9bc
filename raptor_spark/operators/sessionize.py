"""Gap-based sessionization (SURVEY.md §2.5 W7 — north-rule operator;
no reference counterpart, grounded in the standard cumulative-gap
pattern).

A new session starts when the gap to the previous event within the same
key exceeds ``gap``. session_idx = cumulative count of gap breaks;
session_id = "<key>#<idx>". One hash shuffle on keys + one sort — the
two windows share the same (partition, order) spec so Spark plans a
single Sort + Window chain, no second exchange.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .tsutil import micros


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap_us: int,
    tiebreak: Optional[str] = None,
    out_col: str = "session_id",
    idx_col: str = "session_idx",
) -> DataFrame:
    order = [F.col(ts_col).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = W.partitionBy(*keys).orderBy(*order)
    wcum = w.rowsBetween(W.unboundedPreceding, W.currentRow)

    prev_ts = F.lag(micros(ts_col)).over(w)
    is_break = (
        prev_ts.isNotNull()
        & ((micros(ts_col) - prev_ts) > F.lit(gap_us))
    ).cast("int")
    out = df.withColumn(idx_col, F.sum(is_break).over(wcum).cast("int"))
    key_str = F.concat_ws(";", *[F.col(k).cast("string") for k in keys])
    return out.withColumn(
        out_col, F.concat(key_str, F.lit("#"), F.col(idx_col).cast("string"))
    )


def session_bounds(
    df_sessionized: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    idx_col: str = "session_idx",
) -> DataFrame:
    """Collapse sessionized events to one row per session:
    (keys, session_idx, session_start, session_end, n_events)."""
    return df_sessionized.groupBy(*keys, idx_col).agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
