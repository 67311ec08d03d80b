"""The full daemon lifecycle in one call — the reference's flagship run
(/root/reference/packages/cli/src/main.rs:98-125 + SURVEY §3.1/§3.2):

    crawl replay -> merge-upsert vs the previous cache -> per-board top-k
    -> data.json + rss.xml per board, plus the calendar pipeline -> ics,
    plus the metrics rollup — everything the reference's CI daemon produces.

The merged posts table is written back as the next run's cache (the
reference's core.save_cache, mod.rs:269-311): running the daemon twice with
no site changes yields all-'skipped' outcomes."""

from __future__ import annotations

from datetime import datetime
from pathlib import Path

import ray.data

from ssufid_ray import storage
from ssufid_ray.pipelines.calendar import run_calendar
from ssufid_ray.pipelines.crawl import documents_dataset, run_crawl
from ssufid_ray.pipelines.site import write_calendar_ics, write_site_outputs
from ssufid_ray.schema import CALENDAR_SCHEMA, POSTS_SCHEMA
from ssufid_ray.stages.merge import merge_calendar, merge_posts, topk_per_board


def run_daemon(
    corpus_dir: str,
    out_dir: str,
    *,
    now: datetime,
    cal_host: str | None = None,
    cal_years: list[int] | None = None,
    cal_range: tuple[datetime, datetime] | None = None,
    top_k: int = 100,
    politeness_scale: float = 0.0,
) -> dict:
    import shutil

    out = Path(out_dir)
    crawl_dir = str(out / "crawl")
    cache_dir = out / "cache" / "posts"
    cal_cache_path = out / "cache" / "calendar.parquet"

    # each daemon run re-crawls (reference: every CI run crawls fresh);
    # incremental state lives in the cache, not in the crawl scratch dir
    shutil.rmtree(crawl_dir, ignore_errors=True)
    manifest = run_crawl(corpus_dir, crawl_dir, politeness_scale=politeness_scale)

    new_ds = documents_dataset(crawl_dir)
    if cache_dir.exists():
        cache_ds = ray.data.read_parquet(str(cache_dir))
        n_cache = cache_ds.count()  # metadata-only on a plain parquet read
    else:  # first run: empty cache (reference read_cache -> [] on missing)
        cache_ds = ray.data.from_arrow(POSTS_SCHEMA.empty_table())
        n_cache = 0
    # bucket count from parquet METADATA row counts (upper bound incl.
    # error rows) — avoids executing the filtered new_ds twice
    n_new = ray.data.read_parquet(str(Path(crawl_dir) / "posts"),
                                  columns=["doc_id"]).count()
    from ssufid_ray.stages.merge import _auto_buckets

    merged = merge_posts(new_ds, cache_ds, now=now,
                         num_buckets=_auto_buckets(n_new + n_cache)).materialize()

    outcomes = dict(
        (r["outcome"], r["count()"])
        for r in merged.groupby("outcome").count().take_all()
    )
    # K5: reference event names (core/mod.rs:53-67 content_update events)
    event_names = {"created": "post_created", "updated": "post_updated",
                   "skipped": "post_skipped", "preserved": "post_preserved"}
    import pyarrow as _pa

    storage.write_table(
        _pa.table({"key": [event_names[k] for k in sorted(outcomes)],
                   "count": [int(outcomes[k]) for k in sorted(outcomes)]}),
        str(out / "metrics_merge.parquet"),
    )

    # K5 per-event report: one JSON line per post_created/post_updated with
    # id/title/url payload (core/mod.rs:351-370 tracing fields, consumed
    # like .github/actions/analyze-report jq rollups). Steady-state runs
    # change a handful of posts -> single sorted file; a cold-cache run
    # marks the WHOLE corpus created, so above the gate the report becomes
    # a distributed JSONL directory (same lines, part files) instead of a
    # driver-side collect.
    import json as _json
    import pyarrow.compute as _pc

    n_changed = int(outcomes.get("created", 0)) + int(outcomes.get("updated", 0))
    changed_ds = (merged.select_columns(["outcome", "doc_id", "title", "url"])
                  .map_batches(lambda t: t.filter(
                      _pc.is_in(t["outcome"], _pa.array(["created", "updated"]))),
                      batch_format="pyarrow"))
    ev_path = out / "content_report.jsonl"
    if n_changed <= 200_000:
        # a previous run into the same out dir may have crossed the gate
        # the other way: remove the sibling artifact so consumers never
        # read a stale report as current
        shutil.rmtree(out / "content_report_parts", ignore_errors=True)
        changed = changed_ds.take_all()
        ev_path.write_text("".join(
            _json.dumps({"type": event_names[r["outcome"]], "id": r["doc_id"],
                         "title": r["title"], "url": r["url"]},
                        ensure_ascii=False) + "\n"
            for r in sorted(changed, key=lambda r: r["doc_id"])))
    else:
        def to_events(t):
            return _pa.table({"type": _pa.array(
                [event_names[o] for o in t["outcome"].to_pylist()]),
                "id": t["doc_id"], "title": t["title"], "url": t["url"]})

        shutil.rmtree(out / "content_report_parts", ignore_errors=True)
        ev_path.unlink(missing_ok=True)  # stale small-path sibling
        (changed_ds.map_batches(to_events, batch_format="pyarrow")
         .write_json(str(out / "content_report_parts")))

    # next run's cache = merged table minus the outcome column (K4):
    # streaming write into a temp dir, atomic rename (no driver-side
    # materialization of the full post table)
    post_cols = [f.name for f in POSTS_SCHEMA]
    tmp_cache = Path(str(cache_dir) + ".tmp")
    shutil.rmtree(tmp_cache, ignore_errors=True)
    merged.select_columns(post_cols).write_parquet(str(tmp_cache))
    shutil.rmtree(cache_dir, ignore_errors=True)
    tmp_cache.rename(cache_dir)

    top = topk_per_board(merged, k=top_k)
    site_manifest = write_site_outputs(top, str(out / "sites")).take_all()

    result = {
        "crawl": {k: manifest[k] for k in ("seen_size", "phase_sec")},
        "outcomes": outcomes,
        "boards_written": len(site_manifest),
    }

    if cal_host and cal_years and cal_range:
        import pyarrow as pa

        cal_cache = (
            ray.data.from_arrow(storage.read_table(str(cal_cache_path)))
            if cal_cache_path.exists()
            else ray.data.from_arrow(CALENDAR_SCHEMA.empty_table())
        )
        events = run_calendar(
            corpus_dir, cal_host, cal_years,
            range_start=cal_range[0], range_end=cal_range[1],
            cache_ds=cal_cache,
        ).materialize()
        storage.write_table(
            pa.Table.from_pylist(
                events.take_all(), schema=CALENDAR_SCHEMA),
            str(cal_cache_path),
        )
        result["calendar_ics"] = write_calendar_ics(events, str(out / "sites"))
        result["calendar_events"] = events.count()
    return result
