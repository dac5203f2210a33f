"""Value rendering + TDS decode parity — vectors from
/root/reference/src/extract/format.rs:220-446 and FIXTURES.md A.4."""

import datetime as dt
from decimal import Decimal

import pytest

from db_migrator_spark.common.rendering import (
    InvalidDateTimeValue,
    decode_date,
    decode_datetime,
    decode_datetime2,
    decode_datetimeoffset,
    decode_smalldatetime,
    decode_time,
    from_days,
    from_minutes,
    from_sec_fragments,
    render_binary,
    render_bool,
    render_decimal,
    render_literal,
    render_number,
    render_string,
    time_from_increments,
)


def test_string_rendering():
    assert render_string("hello") == "'hello'"
    assert render_string("it's") == "'it''s'"
    assert render_string(None) == "NULL"


def test_number_rendering():
    assert render_number(42) == "42"
    assert render_number(None) == "NULL"
    assert render_number(-100) == "-100"
    assert render_number(3.14) == "3.14"


def test_binary_rendering():
    assert render_binary(bytes([0xFF, 0xAB])) == "0xffab"
    assert render_binary(b"") == "0x"
    assert render_binary(None) == "NULL"


def test_bool_rendering():
    assert render_bool(True) == "1"
    assert render_bool(False) == "0"
    assert render_bool(None) == "NULL"


def test_decimal_zero_padded_to_scale():
    # reference quotes decimals as strings, '1.50' at scale 2
    assert render_decimal(Decimal("1.50")) == "'1.50'"
    assert render_decimal(Decimal("1.5").quantize(Decimal("0.01"))) == "'1.50'"
    assert render_decimal(None) == "NULL"


def test_from_days():
    assert from_days(738520, 1) == dt.date(2023, 1, 1)
    assert from_days(738551, 1) == dt.date(2023, 2, 1)
    assert from_days(0, 1) == dt.date(1, 1, 1)
    assert from_days(0, 1900) == dt.date(1900, 1, 1)


def test_from_minutes():
    assert from_minutes(0) == dt.time(0, 0, 0)
    assert from_minutes(90) == dt.time(1, 30, 0)
    with pytest.raises(InvalidDateTimeValue):
        from_minutes(24 * 60)


def test_from_sec_fragments():
    # 1/300-second fragments: 300 frags = 1 s
    assert from_sec_fragments(0) == dt.time(0, 0, 0)
    assert from_sec_fragments(300) == dt.time(0, 0, 1)
    assert from_sec_fragments(300 * 3600) == dt.time(1, 0, 0)
    # 3.33ms resolution: 1 frag = 3ms (1000//300)
    assert from_sec_fragments(1) == dt.time(0, 0, 0, 3000)


def test_time_from_increments():
    # scale 7: increments are 100ns units
    assert time_from_increments(54_000_000_000, 7) == dt.time(1, 30, 0)
    # scale 3: ms units
    assert time_from_increments(5_400_000, 3) == dt.time(1, 30, 0)


def test_decode_time_literals():
    assert decode_time(None, 7) == "NULL"
    assert decode_time(54_000_000_000, 7) == "'01:30:00'"
    # fractional seconds kept, trailing zeros trimmed (chrono %.f)
    assert decode_time(521_451_234_560, 7) == "'14:29:05.123456'"


def test_decode_date():
    assert decode_date(738520) == "'2023-01-01'"
    assert decode_date(None) == "NULL"


def test_decode_datetime_second_precision():
    # days since 1900; literal truncated to whole seconds
    days = (dt.date(2023, 1, 1) - dt.date(1900, 1, 1)).days
    assert decode_datetime(days, 300 * (14 * 3600 + 30 * 60 + 45)) == "'2023-01-01 14:30:45'"
    assert decode_datetime(None, 0) == "NULL"


def test_decode_datetime2_fractional():
    days = (dt.date(2023, 6, 15) - dt.date(1, 1, 1)).days
    incr = (14 * 3600 + 30 * 60 + 45) * 10**7 + 1_234_560  # 14:30:45.123456, scale 7
    assert decode_datetime2(days, incr, 7) == "'2023-06-15 14:30:45.123456'"


def test_decode_smalldatetime():
    days = (dt.date(2023, 1, 1) - dt.date(1900, 1, 1)).days
    assert decode_smalldatetime(days, 14 * 60 + 45) == "'2023-01-01 14:45:00'"


def test_decode_datetimeoffset_strips_offset_to_utc():
    # +05:30 offset subtracted -> UTC naive, offset discarded
    days = (dt.date(2023, 1, 1) - dt.date(1, 1, 1)).days
    incr = (10 * 3600) * 10**7  # 10:00:00 scale 7 (local wall time)
    assert decode_datetimeoffset(days, incr, 7, 330) == "'2023-01-01 04:30:00'"
    # negative offset adds
    assert decode_datetimeoffset(days, incr, 7, -60) == "'2023-01-01 11:00:00'"


def test_decode_datetimeoffset_carries_across_midnight():
    """Documented divergence from the reference: the date shifts when the
    offset subtraction crosses midnight (chrono NaiveTime would wrap and
    keep 2023-01-01 — a wrong UTC value we deliberately correct)."""
    days = (dt.date(2023, 1, 1) - dt.date(1, 1, 1)).days
    half_past_midnight = (30 * 60) * 10**7
    assert decode_datetimeoffset(days, half_past_midnight, 7, 60) == "'2022-12-31 23:30:00'"
    late_evening = (23 * 3600 + 30 * 60) * 10**7
    assert decode_datetimeoffset(days, late_evening, 7, -60) == "'2023-01-02 00:30:00'"


def test_render_literal_dispatch():
    assert render_literal(None) == "NULL"
    assert render_literal(True) == "1"
    assert render_literal(b"\xff\xab") == "0xffab"
    assert render_literal(42) == "42"
    assert render_literal(-2.5) == "-2.5"
    assert render_literal(Decimal("19.4000")) == "'19.4000'"
    assert render_literal("O'Brien") == "'O''Brien'"
    assert render_literal(dt.date(2023, 1, 1)) == "'2023-01-01'"
    assert render_literal(dt.datetime(2023, 1, 1, 14, 30, 45, 123456)) == (
        "'2023-01-01 14:30:45.123456'"
    )
    assert render_literal(dt.datetime(2023, 1, 1, 14, 30, 45)) == "'2023-01-01 14:30:45'"
