"""Pandas oracles implementing the REFERENCE's exact recipes
(SURVEY.md §5) — independent re-implementations used to pin the Spark
engine's semantics:

- sliding window: ``set_index(ts).sort_index().groupby(keys)
  .rolling(over)`` per /root/reference/labsdk/raptor/replay.py:129-146
  (pandas offset windows ⇒ left-open interval (t−over, t]);
- PIT as-of: backward filter ts_f ≤ ts_spine ∧ ts_f ≥ ts_spine −
  staleness, latest wins (production semantics,
  /root/reference/pkg/querybuilder/featureset.tmpl.sql:104-122);
- keep_previous/@-N getter per replay.py:246-261 (sort desc, pick N-th,
  age guard vs ts_of_latest − N·over);
- gap sessionization: cumulative gap-break count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def rolling_agg(
    pdf: pd.DataFrame,
    keys: list[str],
    ts: str,
    value: str,
    over: pd.Timedelta,
    fns: list[str],
) -> pd.DataFrame:
    """Reference replay recipe (replay.py:129-146): returns input rows +
    one column per fn. NaN values are dropped first (None-return filter)."""
    # sort by (keys, ts) so the group-concatenated rolling output aligns
    # row-for-row with the base frame (groupby emits groups in key order)
    df = (
        pdf.dropna(subset=[value])
        .copy()
        .sort_values([*keys, ts], kind="stable")
        .reset_index(drop=True)
    )
    g = df.set_index(ts).groupby(keys, group_keys=False, sort=True)[value]

    base = df.copy()
    for fn in fns:
        if fn == "count":
            r = g.rolling(over).count()
        elif fn == "sum":
            r = g.rolling(over).sum()
        elif fn == "avg":
            r = g.rolling(over).mean()
        elif fn == "min":
            r = g.rolling(over).min()
        elif fn == "max":
            r = g.rolling(over).max()
        elif fn in ("distinct_count", "approx_distinct_count"):
            # strings factorized first (replay.py:135-137)
            r = g.rolling(over).apply(lambda s: s.nunique(), raw=False)
        else:
            raise ValueError(fn)
        base[fn] = r.astype(float).values
    return base


def asof_backward(
    spine: pd.DataFrame,
    fv: pd.DataFrame,
    keys: list[str],
    ts: str,
    value: str,
    staleness: pd.Timedelta | None,
) -> pd.Series:
    """For each spine row: latest fv[value] with fv.ts ≤ spine.ts (and
    ≥ spine.ts − staleness if given). O(n²) scan — oracle only."""
    res = []
    for _, row in spine.iterrows():
        m = fv
        for k in keys:
            m = m[m[k] == row[k]]
        m = m[m[ts] <= row[ts]]
        if staleness is not None:
            m = m[m[ts] >= row[ts] - staleness]
        m = m.dropna(subset=[value])
        if len(m) == 0:
            res.append(None)
        else:
            res.append(m.sort_values(ts, kind="stable").iloc[-1][value])
    return pd.Series(res, index=spine.index)


def keep_previous_at(
    fv: pd.DataFrame,
    keys_vals: dict,
    ts_col: str,
    value: str,
    at_ts,
    version: int,
    over: pd.Timedelta,
):
    """Reference getter (replay.py:246-261): value at version N as of
    at_ts, with the age guard."""
    m = fv
    for k, v in keys_vals.items():
        m = m[m[k] == v]
    m = m[m[ts_col] <= at_ts].sort_values(ts_col, ascending=False).head(version + 1)
    if len(m) < version + 1:
        return None
    res = m.iloc[version]
    if over.total_seconds() > 0:
        ts_of_last = m.iloc[0][ts_col]
        if res[ts_col] < ts_of_last - version * over:
            return None
    return res[value]


def sessionize(
    pdf: pd.DataFrame, keys: list[str], ts: str, gap: pd.Timedelta
) -> pd.Series:
    """session_idx per key: cumulative count of gaps > gap."""
    df = pdf.sort_values([*keys, ts], kind="stable")
    prev = df.groupby(keys)[ts].shift(1)
    brk = ((df[ts] - prev) > gap).astype(int)
    idx = brk.groupby([df[k] for k in keys]).cumsum()
    return idx.reindex(pdf.index)


def allclose_frames(a: pd.DataFrame, b: pd.DataFrame, cols: list[str], rtol=1e-9):
    """numpy.allclose with NaN==NaN per column."""
    assert len(a) == len(b), f"row count {len(a)} != {len(b)}"
    for c in cols:
        av = a[c].astype(float).values
        bv = b[c].astype(float).values
        both_nan = np.isnan(av) & np.isnan(bv)
        ok = both_nan | np.isclose(av, bv, rtol=rtol, equal_nan=False)
        if not ok.all():
            bad = np.where(~ok)[0][:5]
            raise AssertionError(
                f"column {c} mismatch at rows {bad}: {av[bad]} vs {bv[bad]}"
            )
