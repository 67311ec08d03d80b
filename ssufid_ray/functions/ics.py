"""ICS (VCALENDAR) renderer (K3), porting
/root/reference/packages/ssufid/src/core/ics.rs:7-90:

  - text escaping of backslash, comma, semicolon, newline; '\r' stripped
    (ics.rs:66-72)
  - 75-OCTET line folding, UTF-8-safe (never splits a multi-byte sequence;
    continuation lines start with a single space) (ics.rs:74-90)
  - UTC datetime format YYYYMMDDTHHMMSSZ (ics.rs:58-64)
  - header lines VERSION/CALSCALE/PRODID/X-WR-CALNAME/X-WR-CALDESC/URL
    (ics.rs:8-16) and VEVENT line order UID, SUMMARY, DTSTAMP, DTSTART,
    DESCRIPTION?, DTEND?, LOCATION?, URL? (ics.rs:32-55); DTSTAMP mirrors
    starts_at like event_lines does.
"""

from __future__ import annotations

from datetime import datetime


def escape_text(s: str) -> str:
    return (
        s.replace("\\", "\\\\")
        .replace(";", "\\;")
        .replace(",", "\\,")
        .replace("\r", "")
        .replace("\n", "\\n")
    )


def fold_line(line: str) -> str:
    """Fold to 75 octets per line, splitting only at UTF-8 char boundaries."""
    raw = line.encode("utf-8")
    if len(raw) <= 75:
        return line
    out: list[str] = []
    budget = 75
    cur = bytearray()
    for ch in line:
        b = ch.encode("utf-8")
        if len(cur) + len(b) > budget:
            out.append(cur.decode("utf-8"))
            cur = bytearray()
            budget = 74  # continuation lines lose one octet to the space
        cur.extend(b)
    if cur:
        out.append(cur.decode("utf-8"))
    return "\r\n ".join(out)


def _dt(dt: datetime) -> str:
    return dt.strftime("%Y%m%dT%H%M%SZ")


def render_event(ev: dict) -> list[str]:
    # line order = ics.rs:33-39 (UID is emitted raw there, not escaped)
    lines = [
        "BEGIN:VEVENT",
        f"UID:{ev['id']}",
        f"SUMMARY:{escape_text(ev['title'])}",
        f"DTSTAMP:{_dt(ev['starts_at'])}",
        f"DTSTART:{_dt(ev['starts_at'])}",
    ]
    if ev.get("description"):
        lines.append(f"DESCRIPTION:{escape_text(ev['description'])}")
    if ev.get("ends_at"):
        lines.append(f"DTEND:{_dt(ev['ends_at'])}")
    if ev.get("location"):
        lines.append(f"LOCATION:{escape_text(ev['location'])}")
    if ev.get("url"):
        lines.append(f"URL:{ev['url']}")
    lines.append("END:VEVENT")
    return lines


def render_calendar(name: str, events: list[dict], *, description: str = "",
                    source: str = "") -> str:
    lines = [
        "BEGIN:VCALENDAR",
        "VERSION:2.0",
        "CALSCALE:GREGORIAN",
        "PRODID:-//ssufid-ray//calendar//KO",
        f"X-WR-CALNAME:{escape_text(name)}",
        f"X-WR-CALDESC:{escape_text(description)}",
        f"URL:{source}",
    ]
    for ev in events:
        lines.extend(render_event(ev))
    lines.append("END:VCALENDAR")
    return "\r\n".join(fold_line(ln) for ln in lines) + "\r\n"
