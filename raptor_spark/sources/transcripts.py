"""Deterministic synthetic transcript table (BASELINE.json input_hint):

    conv_id:string, turn_idx:int, role:string, text:string,
    tool:string, ts:timestamp

Generated **distributed** — `spark.range` over conversation ids →
per-conv turn explosion via `sequence`, all arithmetic (no RNG, no
Python row loop) so any scale factor is reproducible on any cluster
without data movement: 10¹² turns is `spark.range(n_convs)` + explode,
embarrassingly parallel, no shuffle at all.

Gap pattern (FIXTURES.md F1): per turn, gap = 10–90 s derived from
(conv, turn) arithmetic; every ~7th turn a long gap (> 30 min) to
create session boundaries. Turn counts cycle 8..40; `skew=True`
switches to a Zipf-like tail with a few very hot conversations
(exercises salting / AQE skew handling).

Everything also exists as a pandas twin (`transcripts_pandas`) computing
the SAME rows for oracle tests.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_TS_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z, fixed epoch µs

_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["search", "python", "browser"]
_FILLER = (
    "the quick brown fox jumps over the lazy dog and keeps going with more words "
)


def _skewed_turn_count_expr(i):
    # heavy tail: conv 0 gets 50_000 turns, 1-9 get 5_000, rest 8..40
    return F.when(F.col(i) == 0, 50_000).otherwise(
        F.when(F.col(i) < 10, 5_000).otherwise((F.col(i) * 7 % 33) + 8)
    )


def transcripts(
    spark: SparkSession,
    n_convs: int = 50,
    skew: bool = False,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic transcript DataFrame."""
    convs = spark.range(n_convs, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    n_turns = (
        _skewed_turn_count_expr("id") if skew else ((F.col("id") * 7 % 33) + 8)
    )
    df = convs.select(
        F.col("id").alias("conv"),
        F.explode(F.sequence(F.lit(0), n_turns - 1)).alias("turn_idx"),
    )
    i, t = F.col("conv"), F.col("turn_idx")
    # gap before turn t (µs): 10-90s short; every 7th turn ≥35min
    short_gap = (10 + (i * 13 + t * 29) % 81) * 1_000_000
    long_gap = (35 * 60 + ((i + t) % 25) * 60) * 1_000_000
    gap = F.when((t % 7 == 0) & (t > 0), long_gap).otherwise(short_gap)
    # cumulative ts per conv — closed form avoids a window: sum of gaps
    # 1..t is expressible but messy; use a window-free approximation is
    # wrong, so use an in-conv cumulative window (cheap: conv already
    # co-located by generation, Spark sorts within partition).
    from pyspark.sql import Window as W

    wcum = (
        W.partitionBy("conv").orderBy("turn_idx").rowsBetween(W.unboundedPreceding, 0)
    )
    ts_us = F.lit(BASE_TS_US) + (i * 3_600_000_000) + F.sum(gap).over(wcum) - F.first(gap).over(wcum)

    role_idx = t % 3
    role = F.when(t == 0, F.lit("system")).otherwise(
        F.element_at(F.array(*[F.lit(r) for r in _ROLES]), (role_idx + 1).cast("int"))
    )
    tool = F.when(
        role == "tool",
        F.element_at(
            F.array(*[F.lit(x) for x in _TOOLS]), ((i * 31 + t) % 3 + 1).cast("int")
        ),
    )
    # filler repetition count: ((conv + turn_idx) % 5) + 1 — must stay
    # in sync with transcripts_pandas' (i + t) % 5 + 1 oracle twin
    text = F.concat(
        F.lit("conv_"),
        F.lpad(i.cast("string"), 8, "0"),
        F.lit(" turn "),
        t.cast("string"),
        F.lit(" "),
        role,
        F.lit(" "),
        F.expr(f"repeat('{_FILLER}', {'((conv + turn_idx) % 5) + 1'})"),
    )
    return df.select(
        F.concat(F.lit("conv_"), F.lpad(i.cast("string"), 8, "0")).alias("conv_id"),
        t.cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        F.timestamp_micros(ts_us.cast("long")).alias("ts"),
    )


def transcripts_pandas(n_convs: int = 50, skew: bool = False) -> pd.DataFrame:
    """Pandas twin computing identical rows (oracle side)."""
    rows = []
    for i in range(n_convs):
        if skew:
            n = 50_000 if i == 0 else (5_000 if i < 10 else (i * 7 % 33) + 8)
        else:
            n = (i * 7 % 33) + 8
        ts = BASE_TS_US + i * 3_600_000_000
        for t in range(n):
            short = (10 + (i * 13 + t * 29) % 81) * 1_000_000
            long = (35 * 60 + ((i + t) % 25) * 60) * 1_000_000
            gap = long if (t % 7 == 0 and t > 0) else short
            if t > 0:
                ts += gap
            role = "system" if t == 0 else _ROLES[t % 3]
            tool = _TOOLS[(i * 31 + t) % 3] if role == "tool" else None
            conv_id = f"conv_{i:08d}"
            text = (
                f"{conv_id} turn {t} {role} " + _FILLER * ((i + t) % 5 + 1)
            )
            rows.append((conv_id, t, role, text, tool, ts))
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="us")
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return pdf
