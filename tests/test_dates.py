from datetime import datetime

import pytest

from ssufid_ray.functions.dates import (
    event_id,
    parse_board_date,
    parse_calendar_range,
    slugify,
)

KST9 = 9


def test_board_formats_kst_to_utc():
    # gnuboard 2-digit year: "24-03-15 10:30" KST -> 01:30 UTC
    dt = parse_board_date("24-03-15 10:30", "yy_dash_hm")
    assert dt == datetime(2024, 3, 15, 1, 30)
    assert parse_board_date("2024-03-15", "ymd_dash") == datetime(2024, 3, 14, 15)
    assert parse_board_date("2024.03.15", "ymd_dot") == datetime(2024, 3, 14, 15)
    assert parse_board_date("2024년 03월 15일", "ymd_korean") == datetime(2024, 3, 14, 15)
    assert parse_board_date("2024. 03. 15", "ymd_dot_spaced") == datetime(2024, 3, 14, 15)
    assert parse_board_date("2024/03/15 09:00:00", "ymd_slash_hms") == datetime(2024, 3, 15, 0)
    assert parse_board_date("2024-03-15T09:00:00", "iso_t") == datetime(2024, 3, 15, 0)


def test_dual_format_fallback():
    assert parse_board_date("2024-03-15 10:30", "dual_dash") == datetime(2024, 3, 15, 1, 30)
    assert parse_board_date("2024-03-15", "dual_dash") == datetime(2024, 3, 14, 15)
    with pytest.raises(ValueError):
        parse_board_date("nonsense", "dual_dash")


# Golden cases mirroring ssu-academic-calendar/src/lib.rs:449-514
def test_calendar_single_day():
    s, e = parse_calendar_range("3.2(월)", 2026)
    assert s == datetime(2026, 3, 2) - (datetime(1, 1, 1, KST9) - datetime(1, 1, 1))
    assert e == datetime(2026, 3, 2, 23, 59, 59) - (datetime(1, 1, 1, KST9) - datetime(1, 1, 1))


def test_calendar_same_month_range():
    s, e = parse_calendar_range("3.2 ~ 3.6", 2026)
    assert (s.month, s.day) == (3, 1)  # KST midnight -> previous day 15:00 UTC
    assert (e.month, e.day) == (3, 6)


def test_calendar_day_only_end_inherits_month():
    s, e = parse_calendar_range("3.2 ~ 6", 2026)
    assert (e.month, e.day) == (3, 6)


def test_calendar_cross_month_day_only():
    # end day < start day with day-only end => next month (1.28 ~ 3 -> Feb 3)
    s, e = parse_calendar_range("1.28 ~ 3", 2026)
    assert (e.month, e.day) == (2, 3)


def test_calendar_cross_year():
    # 12.28 ~ 01.03 => end year + 1 (lib.rs:468-475)
    s, e = parse_calendar_range("12.28(월) ~ 01.03(일)", 2025)
    assert s.year == 2025 and e.year == 2026
    assert (e.month, e.day) == (1, 3)


def test_calendar_dash_variants_and_parens():
    s1, e1 = parse_calendar_range("3.2 – 3.6", 2026)
    s2, e2 = parse_calendar_range("3.2(월) 〜 3.6(금)", 2026)
    assert (s1, e1) == (s2, e2)


def test_slug_and_event_id_stable_under_whitespace():
    a = event_id("cal", datetime(2026, 3, 1), datetime(2026, 3, 2), "수강  신청 기간")
    b = event_id("cal", datetime(2026, 3, 1), datetime(2026, 3, 2), " 수강 신청   기간 ")
    assert a == b
    assert slugify("Hello, World! 수강신청") == "hello-world-수강신청"
