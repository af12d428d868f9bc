"""Replay: compile a FeatureSpec over a source DataFrame into
feature-value rows — the Spark rebuild of
``/root/reference/labsdk/raptor/replay.py:78-152``.

Stages (reference recipe → Spark):
- normalize ts / keys (replay.py:106-108)     → casts
- per-row program (replay.py:110, 276-300)    → Column expr (codegen) or
                                                 vectorized pandas_udf
- None-return filter (replay.py:110-111)      → value.isNotNull()
- key encoding ';'.join (replay.py:114)       → concat_ws(';')
- long format (replay.py:117-127)             → select(lit(fqn), ...)
- windowed: rolling per key (replay.py:129-146) → sliding_agg_exact /
  sliding_agg_bucketed (scale path), melt to fqn=name+fn rows
  (replay.py:148-149) → unpivot/stack

Output layout (the canonical feature-values relation,
``parquet/schema.go:25-51``): ``fqn:string, keys:string,
ts:timestamp, value:double|string``.
"""

from __future__ import annotations

from typing import Literal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..specs import FeatureSpec
from ..operators.window_agg import sliding_agg_bucketed, sliding_agg_exact


def _eval_expr(df: DataFrame, expr) -> Column:
    if isinstance(expr, str):
        return F.expr(expr)
    return expr(df)


def encode_keys(df: DataFrame, keys) -> Column:
    """Keys.encode — ';'.join of key values as strings
    (types/feature.py:259-266)."""
    return F.concat_ws(";", *[F.col(k).cast("string") for k in keys])


def project_feature(source: DataFrame, spec: FeatureSpec) -> DataFrame:
    """Per-row projection stage: (keys, ts, value) rows, null values
    dropped. Keys stay as native columns (encoded later / by caller) —
    keeping them typed lets downstream ops partition on the raw key."""
    df = source
    if spec.filter:
        df = df.filter(F.expr(spec.filter))
    ts = (
        _eval_expr(df, spec.ts_expr)
        if spec.ts_expr is not None
        else F.col(spec.timestamp_col)
    ).cast("timestamp")
    value = _eval_expr(df, spec.expr)
    # P6 keys override (3-tuple return, runtime/svc.py:132-142): a
    # keys_expr re-keys the emitted row (e.g. attribute a turn's value
    # to another entity). Single expr → the only key column; a
    # sequence of exprs → one per key column (composite re-keying).
    if spec.keys_expr is not None:
        exprs = (
            list(spec.keys_expr)
            if isinstance(spec.keys_expr, (list, tuple))
            else [spec.keys_expr]
        )
        if len(exprs) != len(spec.keys):
            raise ValueError(
                f"keys_expr provides {len(exprs)} expr(s) for "
                f"{len(spec.keys)} key column(s) {spec.keys}"
            )
        key_cols = [
            _eval_expr(df, e).cast("string").alias(k)
            for e, k in zip(exprs, spec.keys)
        ]
    else:
        key_cols = [F.col(k) for k in spec.keys]
    out = df.select(
        *key_cols,
        ts.alias("ts"),
        value.alias("value"),
    )
    return out.filter(F.col("value").isNotNull())


def replay(
    source: DataFrame,
    spec: FeatureSpec,
    mode: Literal["exact", "bucketed"] = "exact",
) -> DataFrame:
    """FeatureSpec → long feature-values DataFrame
    (fqn, keys, ts, value:double for windowed / native type otherwise).

    mode='exact'  : per-event sliding window (LabSDK replay parity).
    mode='bucketed': two-phase partials (production/scale semantics —
    values are per (keys, bucket-end), api/windows.go:96-125).
    """
    proj = project_feature(source, spec)
    keys_enc = encode_keys(proj, spec.keys)

    if spec.aggr is None:
        return proj.select(
            F.lit(spec.fqn).alias("fqn"),
            keys_enc.alias("keys"),
            F.col("ts"),
            F.col("value"),
        )

    a = spec.aggr
    if mode == "exact":
        agged = sliding_agg_exact(
            proj, spec.keys, "ts", F.col("value"), a.over_us, a.fns
        )
    else:
        agged = sliding_agg_bucketed(
            proj, spec.keys, "ts", F.col("value"), a.over_us, a.granularity_us, a.fns
        )
    # melt wide fn columns → long fqn=name+fn rows (replay.py:148-149)
    stack_args = ", ".join(f"'{spec.fqn}+{fn}', `{fn}`" for fn in a.fns)
    keys_enc2 = encode_keys(agged, spec.keys)
    return agged.select(
        keys_enc2.alias("keys"), F.col("ts"), F.expr(f"stack({len(a.fns)}, {stack_args}) as (fqn, value)")
    ).select("fqn", "keys", "ts", "value")


def replay_wide(
    source: DataFrame,
    spec: FeatureSpec,
    mode: Literal["exact", "bucketed"] = "exact",
) -> DataFrame:
    """Like replay() but keeps native key columns and one column per
    output (no melt) — the layout get_historical consumes: keys + ts +
    {name or name_fn ...}."""
    proj = project_feature(source, spec)
    if spec.aggr is None:
        return proj.withColumnRenamed("value", spec.name)
    a = spec.aggr
    if mode == "exact":
        agged = sliding_agg_exact(
            proj, spec.keys, "ts", F.col("value"), a.over_us, a.fns,
            prefix=f"{spec.name}_",
        )
    else:
        agged = sliding_agg_bucketed(
            proj, spec.keys, "ts", F.col("value"), a.over_us, a.granularity_us,
            a.fns, prefix=f"{spec.name}_",
        )
    return agged.select(
        *[F.col(k) for k in spec.keys],
        "ts",
        *[F.col(f"{spec.name}_{fn}") for fn in a.fns],
    )
