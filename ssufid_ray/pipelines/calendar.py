"""Calendar crawl pipeline (SURVEY §3.2; reference run_calendar
core/mod.rs:219-267 + ssu-academic-calendar plugin).

Year pages (S13: one page per year in the crawl range) are fetched and
parsed into events with normalized Korean date ranges (M9), deduped by
stable event id across/within pages (BTreeMap semantics, first wins —
lib.rs:50-59), filtered to the crawl range (F1, inclusive start —
calendar.rs:27-29), merged range-replace against the cache (J2), and
sorted by (starts_at, id) (calendar.rs:45-53). No 100-row cap (unlike
posts, mod.rs:262-265)."""

from __future__ import annotations

from datetime import datetime

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ssufid_ray.functions.dates import event_id, parse_calendar_range
from ssufid_ray.functions.html import normalize_text, parse_html
from ssufid_ray.schema import CALENDAR_SCHEMA
from ssufid_ray.sources.pagestore import PageStoreClient
from ssufid_ray.stages.merge import merge_calendar
from ssufid_ray.urlnorm import canonicalize

CAL_PLUGIN = "ssu-calendar"


def parse_year_page(body: bytes, year: int, plugin_id: str = CAL_PLUGIN) -> list[dict]:
    doc = parse_html(body.decode("utf-8"))
    out: list[dict] = []
    for tr in doc.select("table.calendar > tbody > tr"):
        date_el = tr.select_one("td.date")
        title_el = tr.select_one("td.title")
        if date_el is None or title_el is None:  # F2: malformed row dropped
            continue
        raw = normalize_text(date_el.text())
        title = normalize_text(title_el.text())
        try:
            starts_at, ends_at = parse_calendar_range(raw, year)
        except ValueError:
            continue  # drop-with-metric path
        desc_el = tr.select_one("td.desc")
        out.append({
            "id": event_id(plugin_id, starts_at, ends_at, title),
            "title": title,
            "description": normalize_text(desc_el.text()) if desc_el else None,
            "starts_at": starts_at,
            "ends_at": ends_at,
            "location": None,
            "url": None,
            "plugin_id": plugin_id,
        })
    return out


def run_calendar(
    corpus_dir: str,
    host: str,
    years: list[int],
    *,
    range_start: datetime,
    range_end: datetime,
    cache_ds: ray.data.Dataset | None = None,
    scheme: str = "https",
) -> ray.data.Dataset:
    """-> merged, range-filtered events sorted by (starts_at, id)."""
    tasks = ray.data.from_items([{"year": y, "host": host} for y in years])

    def fetch_parse(batch: pa.Table) -> pa.Table:
        store = PageStoreClient(corpus_dir)
        rows: list[dict] = []
        for r in batch.to_pylist():
            url = canonicalize(f"{scheme}://{r['host']}/calendar?years={r['year']}")
            res = store.get(url, r["host"])
            if res.ok:
                rows.extend(parse_year_page(res.body, r["year"]))
        return pa.Table.from_pylist(rows, schema=CALENDAR_SCHEMA)

    events = tasks.map_batches(fetch_parse, batch_format="pyarrow")

    # dedup by id across year pages (first wins)
    def first(t: pa.Table) -> pa.Table:
        return t.take(pa.array([0]))

    events = events.groupby("id").map_groups(first, batch_format="pyarrow")

    # range filter (F1): start <= starts_at <= end, inclusive
    events = events.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t["starts_at"], pa.scalar(range_start)),
                pc.less_equal(t["starts_at"], pa.scalar(range_end)),
            )
        ),
        batch_format="pyarrow",
    )

    if cache_ds is not None:
        merged = merge_calendar(events, cache_ds, range_start=range_start,
                                range_end=range_end)
        merged = merged.drop_columns(["outcome"])
    else:
        merged = events
    return merged.sort(["starts_at", "id"])
