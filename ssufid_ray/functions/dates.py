"""Date parsing for every board format the reference handles (SURVEY §2.3
M8/M9), normalized to UTC-naive timestamps.

The reference parses each site-local format then `assume_offset(+9)` KST
(e.g. /root/reference/plugins/common/src/common/gnuboard/mod.rs:206-216,
wordpress/mod.rs:199-202, plugins/ssudorm/src/lib.rs:264-266). We therefore
parse in KST and subtract 9h to store UTC-naive (Arrow/DuckDB convention).

Korean calendar normalization (M9) ports the semantics of
/root/reference/plugins/ssu-academic-calendar/src/lib.rs:197-330: strip
parenthesized weekday, unify dash variants to '~', partial dates with
fallback month, cross-month/cross-year range inference, end-of-day end
bound. Golden tests mirror lib.rs:449-514.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta

KST = timedelta(hours=9)

# format-key -> strptime pattern. Each board spec carries one of these keys.
DATE_FORMATS: dict[str, str] = {
    "ymd_dash": "%Y-%m-%d",                 # wordpress/mod.rs:233-235
    "ymd_dot": "%Y.%m.%d",                  # wordpress/mod.rs:237-242
    "ymd_korean": "%Y년 %m월 %d일",          # wordpress/mod.rs:244-249, ssucatch
    "ymd_dot_spaced": "%Y. %m. %d",         # infocom:62
    "yy_dash_hm": "%y-%m-%d %H:%M",         # gnuboard/mod.rs:206-216 (2-digit year + "20" prefix)
    "ymd_dash_hm": "%Y-%m-%d %H:%M",        # ssudorm:98-99
    "ymd_slash_hms": "%Y/%m/%d %H:%M:%S",   # stu:104-105
    "iso_t": "%Y-%m-%dT%H:%M:%S",           # startup:134-135
}


def parse_board_date(text: str, format_key: str) -> datetime:
    """Parse a site-local date string (KST) -> UTC-naive datetime.

    `yy_dash_hm` reproduces the gnuboard 2-digit-year rule: the reference
    prefixes the raw "YY-MM-DD HH:MM" with "20" before parsing
    (gnuboard/mod.rs:206-216)."""
    text = text.strip()
    if format_key == "dual_dash":
        # ee:97-111 — try datetime then date-only
        for fmt in ("%Y-%m-%d %H:%M", "%Y-%m-%d"):
            try:
                return datetime.strptime(text, fmt) - KST
            except ValueError:
                continue
        raise ValueError(f"unparseable dual_dash date: {text!r}")
    fmt = DATE_FORMATS[format_key]
    return datetime.strptime(text, fmt) - KST


# ---------------------------------------------------------------- calendar

_PARENS = re.compile(r"\([^)]*\)")
_DASHES = re.compile(r"[–—－〜]")
_WS = re.compile(r"\s+")


def strip_parenthesized(s: str) -> str:
    """Remove parenthesized runs like '(월)' (lib.rs:308-322)."""
    return _PARENS.sub("", s)


def unify_range_separators(s: str) -> str:
    """Map dash variants to '~' (lib.rs:300-306)."""
    return _DASHES.sub("~", s)


def normalize_whitespace(s: str) -> str:
    """Collapse whitespace runs to single spaces, trim (lib.rs:328-330)."""
    return _WS.sub(" ", s).strip()


_FULL = re.compile(r"^(\d{1,2})\.(\d{1,2})$")  # MM.DD
_DAY = re.compile(r"^(\d{1,2})$")  # DD (fallback month applies)


def _parse_partial(tok: str, year: int, fallback_month: int) -> tuple[int, int, int]:
    """-> (year, month, day). Partial dates inherit the fallback month
    (lib.rs:197-271)."""
    tok = tok.strip()
    m = _FULL.match(tok)
    if m:
        return year, int(m.group(1)), int(m.group(2))
    m = _DAY.match(tok)
    if m:
        return year, fallback_month, int(m.group(1))
    raise ValueError(f"unparseable calendar date token: {tok!r}")


def parse_calendar_range(raw: str, year: int) -> tuple[datetime, datetime]:
    """Parse a Korean academic-calendar date cell like '12.28(월) ~ 01.03'
    into a KST-interpreted, UTC-stored [start, end] pair.

    Semantics (lib.rs:197-298):
      - single date -> start == end-day
      - 'A ~ B' -> range; B may be day-only (inherits A's month)
      - end < start  => end rolls over (+1 month if day-only, else +1 year)
      - end is end-of-day 23:59:59
    """
    s = normalize_whitespace(unify_range_separators(strip_parenthesized(raw)))
    parts = [p for p in (t.strip() for t in s.split("~")) if p]
    if not parts:
        raise ValueError(f"empty calendar date: {raw!r}")
    sy, sm, sd = _parse_partial(parts[0], year, fallback_month=1)
    start = datetime(sy, sm, sd)
    if len(parts) == 1:
        ey, em, ed = sy, sm, sd
    else:
        day_only = bool(_DAY.match(parts[1]))
        ey, em, ed = _parse_partial(parts[1], year, fallback_month=sm)
        end_try = datetime(ey, em, ed)
        if end_try < start:
            if day_only:
                em += 1  # cross-month: '1.28 ~ 3' -> Feb 3
                if em > 12:
                    em, ey = 1, ey + 1
            else:
                ey += 1  # cross-year: '12.28 ~ 01.03' -> next Jan (lib.rs:468-475)
    end = datetime(ey, em, ed, 23, 59, 59)
    return start - KST, end - KST


def slugify(s: str) -> str:
    """Stable slug for calendar event ids (lib.rs:332-369): lowercase,
    alnum+hangul kept, runs of anything else -> single '-'."""
    s = normalize_whitespace(s).lower()
    s = re.sub(r"[^0-9a-z가-힣]+", "-", s).strip("-")
    return s


def event_id(plugin: str, start: datetime, end: datetime, title: str) -> str:
    """'{plugin}:{start}:{end}:{slug}' — stable under whitespace changes
    (lib.rs:477-486)."""
    return f"{plugin}:{start.isoformat()}:{end.isoformat()}:{slugify(title)}"
