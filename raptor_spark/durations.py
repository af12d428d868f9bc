"""Duration parsing — reference semantics of
``/root/reference/labsdk/raptor/_internal/durpy.py:42-76`` (Go-style
duration strings) re-implemented from scratch.

Accepted forms: ``'10h'``, ``'2h 3m 4s'``, ``'2h3m4s'``, ``'1d'``,
``'-1'`` (→ 0, the reference's "no duration" sentinel), ``''``/None → 0.
Units: ns, us, µs, ms, s, m, h, d, w.  Result is **microseconds** (the
engine's native resolution, matching the reference's UnixMicro
timestamps, ``/root/reference/api/primitives.go:157-196``).
"""

from __future__ import annotations

import re
from datetime import timedelta

_UNIT_US: dict[str, float] = {
    "ns": 1e-3,
    "us": 1,
    "µs": 1,
    "ms": 1_000,
    "s": 1_000_000,
    "m": 60_000_000,
    "h": 3_600_000_000,
    "d": 86_400_000_000,
    "w": 604_800_000_000,
}

_TOKEN = re.compile(r"(\d+(?:\.\d+)?)\s*(ns|us|µs|ms|s|m|h|d|w)")


def parse_duration_us(s: str | int | float | timedelta | None) -> int:
    """Parse a duration into integer microseconds.

    ``-1``/``'-1'``/``None``/``''`` → 0 (reference treats -1 as unset,
    durpy.py:49-50). ints/floats are taken as seconds. timedelta passes
    through.
    """
    if s is None:
        return 0
    if isinstance(s, timedelta):
        return int(s.total_seconds() * 1_000_000)
    if isinstance(s, (int, float)):
        if s < 0:
            return 0
        return int(s * 1_000_000)
    s = s.strip()
    if s in ("", "-1", "0"):
        return 0
    total = 0.0
    matched_len = 0
    for m in _TOKEN.finditer(s):
        total += float(m.group(1)) * _UNIT_US[m.group(2)]
        matched_len += len(m.group(0))
    leftover = re.sub(r"\s+", "", s)
    consumed = sum(
        len(re.sub(r"\s+", "", m.group(0))) for m in _TOKEN.finditer(s)
    )
    if consumed != len(leftover):
        raise ValueError(f"unparseable duration: {s!r}")
    return int(total)


def duration_to_interval_str(us: int) -> str:
    """Microseconds → Spark SQL interval string ('3600 seconds')."""
    if us % 1_000_000 == 0:
        return f"{us // 1_000_000} seconds"
    return f"{us} microseconds"
