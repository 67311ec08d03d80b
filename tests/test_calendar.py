"""Calendar pipeline (S13/M9/J2) vs truth; range filter; ICS/RSS goldens
mirroring the reference writer tests (rss.rs:110-313, ics.rs:98-153)."""

from datetime import datetime
from pathlib import Path

from ssufid_ray import storage
from ssufid_ray.functions.ics import escape_text, fold_line, render_calendar
from ssufid_ray.functions.rss import render_channel, render_item
from ssufid_ray.synth import CAL_HOST, CAL_YEARS


def test_calendar_crawl_matches_truth(corpus):
    from ssufid_ray.pipelines.calendar import run_calendar

    d, _ = corpus
    start, end = datetime(2024, 12, 31, 15), datetime(2026, 12, 31, 14, 59, 59)
    got = run_calendar(d, CAL_HOST, list(CAL_YEARS), range_start=start,
                       range_end=end).take_all()
    truth = storage.read_table(str(Path(d) / "truth_calendar.parquet")).to_pylist()
    truth = [t for t in truth if start <= t["starts_at"] <= end]
    truth.sort(key=lambda r: (r["starts_at"], r["id"]))
    assert [g["id"] for g in got] == [t["id"] for t in truth]
    for g, t in zip(got, truth):
        for f in ("title", "starts_at", "ends_at", "description"):
            assert g[f] == t[f], (t["id"], f)


def test_calendar_range_filter_excludes(corpus):
    from ssufid_ray.pipelines.calendar import run_calendar

    d, _ = corpus
    start, end = datetime(2026, 1, 1), datetime(2026, 3, 31, 23, 59, 59)
    got = run_calendar(d, CAL_HOST, list(CAL_YEARS), range_start=start,
                       range_end=end).take_all()
    assert got
    assert all(start <= g["starts_at"] <= end for g in got)


def test_calendar_range_replace_merge(corpus, ray_session):
    import ray.data

    from ssufid_ray.schema import CALENDAR_SCHEMA
    from ssufid_ray.stages.merge import merge_calendar

    import pyarrow as pa

    def ev(eid, day, title):
        return {"id": eid, "title": title, "description": None,
                "starts_at": datetime(2026, 3, day), "ends_at": datetime(2026, 3, day),
                "location": None, "url": None, "plugin_id": "cal"}

    new = ray.data.from_arrow(pa.Table.from_pylist(
        [ev("a", 5, "kept-new"), ev("b", 6, "updated-title")], schema=CALENDAR_SCHEMA))
    old = ray.data.from_arrow(pa.Table.from_pylist(
        [ev("b", 6, "old-title"),       # in range, re-crawled -> updated
         ev("c", 10, "dropped"),        # in range, not re-crawled -> dropped
         ev("d", 1, "outside")],        # outside range -> preserved
        schema=CALENDAR_SCHEMA))
    got = merge_calendar(new, old, range_start=datetime(2026, 3, 2),
                         range_end=datetime(2026, 3, 31)).take_all()
    outcomes = {r["id"]: r["outcome"] for r in got}
    assert outcomes == {"a": "created", "b": "updated", "d": "preserved"}
    titles = {r["id"]: r["title"] for r in got}
    assert titles["b"] == "updated-title"


def test_ics_escaping_and_folding():
    assert escape_text("a,b;c\nd\\e") == "a\\,b\\;c\\nd\\\\e"
    long = "가나다라 " * 30
    folded = fold_line(f"SUMMARY:{long}")
    for ln in folded.split("\r\n"):
        assert len(ln.encode("utf-8")) <= 75
        ln.encode("utf-8").decode("utf-8")  # never splits a multibyte char
    ics = render_calendar("test", [{
        "id": "e1", "title": "회의, 중요한; 일정", "description": "line1\nline2",
        "starts_at": datetime(2026, 3, 2), "ends_at": datetime(2026, 3, 2, 23, 59, 59),
        "location": None, "url": None,
    }])
    assert "BEGIN:VEVENT" in ics and "UID:e1" in ics
    assert "DTSTAMP:20260302T000000Z" in ics  # ics.rs:36 (RFC 5545 required)
    assert "DTSTART:20260302T000000Z" in ics
    assert "CALSCALE:GREGORIAN" in ics and "X-WR-CALDESC:" in ics
    assert "회의\\, 중요한\\; 일정" in ics


def test_rss_golden_semantics():
    post = {
        "post_id": "42", "url": "http://h.kr/v?id=42", "author": None,
        "title": "공지 & 안내", "description": None,
        "category": ["학사", "공지"],
        "created_at": datetime(2026, 3, 2, 1, 30),
        "updated_at": datetime(2026, 3, 3, 2, 0),
        "thumbnail": "http://h.kr/img/1.png",
        "content": "x" * 80,
    }
    item = render_item(post)
    assert '<guid isPermaLink="false">42</guid>' in item  # rss.rs:28-31
    assert "<description>" + "x" * 50 + "...</description>" in item  # first-50+'...' fallback (rss.rs:17-22)
    assert "<content:encoded>" + "x" * 80 + "</content:encoded>" in item  # rss.rs:33
    assert "<pubDate>Mon, 02 Mar 2026 01:30:00 +0000</pubDate>" in item
    assert '<enclosure url="http://h.kr/img/1.png" length="0" type="image/png"/>' in item
    assert "<atom:updated>2026-03-03T02:00:00Z</atom:updated>" in item
    assert item.count("<category>") == 2
    ch = render_channel("t", "http://h.kr", "d", [post])
    assert 'xmlns:atom="http://www.w3.org/2005/Atom"' in ch
    assert "공지 &amp; 안내" in ch
