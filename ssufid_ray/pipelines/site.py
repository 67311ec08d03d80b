"""Site output sink (K1/K2/K3): per-board data.json + rss.xml, and
calendar.ics — the reference's out/<id>/ layout
(/root/reference/packages/cli/src/main.rs:202-217).

Implemented as a map_groups over plugin_id whose tasks write their own
board's files (distributed, one directory per board — the resumable-output
layout) and return a manifest row each."""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow as pa
import ray.data

from ssufid_ray.functions.ics import render_calendar
from ssufid_ray.functions.rss import render_channel

SITE_MANIFEST_SCHEMA = pa.schema(
    [("plugin_id", pa.string()), ("n_items", pa.int64()), ("dir", pa.string())]
)


def _rfc3339(dt) -> str | None:
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ") if dt is not None else None


def post_to_json(p: dict) -> dict:
    """SsufidPost JSON shape (post.rs:24-41; RFC3339 dates)."""
    return {
        "id": p["post_id"],
        "url": p["url"],
        "author": p["author"],
        "title": p["title"],
        "description": p["description"],
        "category": list(p["category"] or []),
        "created_at": _rfc3339(p["created_at"]),
        "updated_at": _rfc3339(p["updated_at"]),
        "thumbnail": p["thumbnail"],
        "content": p["content"],
        "attachments": [
            {"url": a["url"], "name": a["name"], "mime_type": a["mime_type"]}
            for a in (p["attachments"] or [])
        ],
        "metadata": dict(p["metadata"]) if p["metadata"] else None,
    }


def write_site_outputs(topk_ds: ray.data.Dataset, out_dir: str) -> ray.data.Dataset:
    """topk_ds: output of topk_per_board (rank column = newest-first order).
    Writes out/<plugin_id>/{data.json, rss.xml}; returns the manifest ds."""

    def write_board(t: pa.Table) -> pa.Table:
        rows = sorted(t.to_pylist(), key=lambda r: r["rank"])
        pid = rows[0]["plugin_id"]
        board_dir = Path(out_dir) / pid
        board_dir.mkdir(parents=True, exist_ok=True)
        site = {
            "title": pid,
            "source": rows[0]["url"],
            "description": f"{pid} announcements",
            "items": [post_to_json(r) for r in rows],
        }
        tmp = board_dir / "data.json.tmp"
        tmp.write_text(json.dumps(site, ensure_ascii=False, indent=1))
        tmp.rename(board_dir / "data.json")
        rss = render_channel(pid, rows[0]["url"], site["description"], rows)
        (board_dir / "rss.xml").write_text(rss)
        return pa.Table.from_pylist(
            [{"plugin_id": pid, "n_items": len(rows), "dir": str(board_dir)}],
            schema=SITE_MANIFEST_SCHEMA,
        )

    return topk_ds.groupby("plugin_id").map_groups(write_board, batch_format="pyarrow")


def write_calendar_ics(events_ds: ray.data.Dataset, out_dir: str,
                       name: str = "ssu-calendar") -> str:
    """Events are small post-filter; collect and render one .ics."""
    events = events_ds.take_all()
    path = Path(out_dir) / name / "calendar.ics"
    path.parent.mkdir(parents=True, exist_ok=True)
    source = events[0]["url"] if events and events[0].get("url") else ""
    path.write_text(render_calendar(name, events,
                                    description=f"{name} events", source=source))
    return str(path)
