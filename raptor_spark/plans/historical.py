"""FeatureSet.get_historical — point-in-time training-set assembly.

Spark rebuild of the reference's historical query
(``/root/reference/pkg/querybuilder/featureset.tmpl.sql`` — spine CTE +
per-feature CTEs + chained backward as-of LEFT JOINs, lines 104-122) and
the LabSDK's ``new_historical_get``
(``/root/reference/labsdk/raptor/replay.py:303-366``).

Physical design: ALL features that share the entity key are merged in
ONE union-merge pass (see ``operators/asof.py``) — a single hash
shuffle on the key + one in-partition sort carries every feature
column, vs. the reference SQL's N chained range joins. Features are
replayed independently (each an embarrassingly parallel scan +
window), then unioned by name.

Time-range handling (M2/M7): when (since, until) are given, feature
inputs are padded back by each feature's staleness
(``fs.go:63-69`` BeforePadding) so windows at the range start are
complete; padding rows are dropped after the merge (``data`` vs
``base`` CTE, featureset.tmpl.sql:51).

keep_previous (W2): realized plan-side — the feature-values stream is
pre-lagged per key (lag N of value & ts + age guard,
replay.py:246-261) and the lagged columns ride the same union-merge.
"""

from __future__ import annotations

import datetime as dt
from typing import Literal, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F, Window as W

from ..operators.tsutil import micros

from ..specs import FeatureSetSpec, FeatureSpec
from .replay import replay_wide


def _lag_feature_values(
    fv: DataFrame, spec: FeatureSpec, value_cols: Sequence[str]
) -> tuple[DataFrame, list[str]]:
    """Materialize keep_previous versions as extra columns on the
    feature-values stream (lag over the value history per key)."""
    kp = spec.keep_previous
    if kp is None:
        return fv, list(value_cols)
    w = W.partitionBy(*spec.keys).orderBy(F.col("ts").asc())
    out = fv
    all_cols = list(value_cols)
    for n in range(1, kp.versions + 1):
        lag_ts = F.lag(micros("ts"), n).over(w)
        guard = (
            lag_ts >= micros("ts") - F.lit(n * kp.over_us)
            if kp.over_us > 0
            else F.lit(True)
        )
        for c in value_cols:
            lagged = F.when(guard, F.lag(F.col(c), n).over(w))
            out = out.withColumn(f"{c}_prev{n}", lagged)
            all_cols.append(f"{c}_prev{n}")
    return out, all_cols


def get_historical(
    source: DataFrame,
    fs: FeatureSetSpec,
    spine: Optional[DataFrame] = None,
    since: Optional[dt.datetime] = None,
    until: Optional[dt.datetime] = None,
    mode: Literal["exact", "bucketed"] = "exact",
    sources: Optional[dict[str, DataFrame]] = None,
) -> DataFrame:
    """Wide PIT training set: one row per spine (keys, ts), one column
    per feature output. ``sources`` may map feature name → its own
    source DataFrame (default: ``source`` for all).

    Spine default: the key feature's value rows (fs.go:35-49) — here,
    its (keys, ts) projection.
    """
    key_feature = fs.resolve_key_feature()
    keys = key_feature.keys
    ts_col = "ts"

    if spine is None:
        kf_src = (sources or {}).get(key_feature.name, source)
        spine = replay_wide(kf_src, key_feature, mode=mode).select(
            *keys, ts_col, *[c for c in key_feature.output_columns() if "_prev" not in c]
        )
        if since is not None:
            spine = spine.filter(F.col(ts_col) >= F.lit(since))
        if until is not None:
            spine = spine.filter(F.col(ts_col) <= F.lit(until))
        joined_from_spine = set(key_feature.output_columns())
    else:
        joined_from_spine = set()

    # union-merge all remaining features in one pass
    from ..operators.asof import asof_join

    spine_tagged = spine
    fv_frames: list[DataFrame] = []
    staleness: dict[str, int] = {}
    value_cols: list[str] = []
    for spec in fs.features:
        cols = [c for c in spec.output_columns() if c not in joined_from_spine]
        if not cols:
            continue
        if tuple(spec.keys) != tuple(keys):
            raise NotImplementedError(
                "features with a different entity key require a separate "
                "as-of pass per key family"
            )
        f_src = (sources or {}).get(spec.name, source)
        if since is not None:
            pad_us = spec.effective_staleness_us
            if spec.keep_previous is not None and spec.keep_previous.over_us > 0:
                pad_us += spec.keep_previous.versions * spec.keep_previous.over_us
            lo = since - dt.timedelta(microseconds=pad_us)
            f_src = f_src.filter(F.col(spec.timestamp_col) >= F.lit(lo))
        if until is not None:
            f_src = f_src.filter(F.col(spec.timestamp_col) <= F.lit(until))
        fv = replay_wide(f_src, spec, mode=mode)
        base_cols = [c for c in fv.columns if c not in (*keys, ts_col)]
        fv, all_cols = _lag_feature_values(fv, spec, base_cols)
        fv = fv.select(*keys, ts_col, *[c for c in all_cols if c in cols])
        fv_frames.append(fv)
        st = spec.effective_staleness_us
        for c in cols:
            # keep_previous columns carry their own age guard; the
            # staleness cutoff applies to the base value (W4).
            staleness[c] = 0 if "_prev" in c else st
        value_cols.extend(c for c in cols if c in fv.columns)

    if not fv_frames:
        return spine

    # merge all feature-value frames into one long-ish frame by name
    merged = fv_frames[0]
    for f in fv_frames[1:]:
        merged = merged.unionByName(f, allowMissingColumns=True)

    return asof_join(
        spine_tagged,
        merged,
        keys=keys,
        ts_col=ts_col,
        value_cols=value_cols,
        staleness_us=staleness,
    )
