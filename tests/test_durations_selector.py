from datetime import timedelta

import pytest

from raptor_spark.durations import parse_duration_us
from raptor_spark.selector import Selector, parse_selector


def test_durations():
    assert parse_duration_us("10h") == 36_000_000_000
    assert parse_duration_us("2h 3m 4s") == (2 * 3600 + 3 * 60 + 4) * 1_000_000
    assert parse_duration_us("2h3m4s") == (2 * 3600 + 3 * 60 + 4) * 1_000_000
    assert parse_duration_us("1d") == 86_400_000_000
    assert parse_duration_us("-1") == 0
    assert parse_duration_us("") == 0
    assert parse_duration_us(None) == 0
    assert parse_duration_us("500ms") == 500_000
    assert parse_duration_us("1.5h") == 5_400_000_000
    assert parse_duration_us(timedelta(minutes=30)) == 1_800_000_000
    assert parse_duration_us(90) == 90_000_000
    with pytest.raises(ValueError):
        parse_duration_us("10 parsecs")


def test_selector_grammar():
    # grammar per /root/reference/labsdk/raptor/program.py:45-47
    s = parse_selector("default.turns_10m+count@-1")
    assert s == Selector("default", "turns_10m", "count", 1, None)
    assert s.column == "turns_10m_count_prev1"
    assert str(s) == "default.turns_10m+count@-1"

    s2 = parse_selector("turn_len")
    assert s2.namespace == "default" and s2.name == "turn_len"
    assert s2.column == "turn_len"

    s3 = parse_selector("ns1.f+avg[headerless]")
    assert s3.fn == "avg" and s3.encoding == "headerless"

    with pytest.raises(ValueError):
        parse_selector("bad selector!!")
