"""Whole-board retry (core/mod.rs:38-93) + the structured event report
(cli/main.rs:300-339 content_report/error_report analogues, K5)."""

import json
from pathlib import Path

import pyarrow.parquet as pq


def _events(out: str) -> list[dict]:
    rows = []
    for f in sorted(Path(out, "events").glob("*.jsonl")):
        rows += [json.loads(ln) for ln in f.read_text().splitlines()]
    return rows


def test_board_retry_three_attempts_and_failure_record(corpus, crawl_out):
    (d, meta), (out, manifest) = corpus, crawl_out
    failed_ids = meta["failed_boards"]
    assert len(failed_ids) == 1  # the list_permfail fixture board
    events = _events(out)
    failed = [e for e in events if e["type"] == "crawl_failed"]
    assert [e["plugin"] for e in failed] == failed_ids
    assert failed[0]["attempt"] == meta["retry_count"] == 3
    assert "AttemptsExceeded" in failed[0]["error"]
    # failure surfaced in the manifest accounting (CLI exit source)
    assert manifest["board_failures"] == 1
    assert manifest["n_boards"] == meta["n_boards"]
    # error_report artifact mirrors the failed events
    err = [json.loads(ln) for ln in
           Path(out, "error_report.jsonl").read_text().splitlines()]
    assert err == failed
    # the failed board keeps ONE error_retry record and contributes no posts
    scout = pq.read_table(Path(out) / "scout").to_pylist()
    fail_url_rows = [r for r in scout if r["outcome"] == "error_retry"
                     and "bo_table=" + failed_ids[0] in r["url"]]
    assert len(fail_url_rows) == 1


def test_event_rollup_matches_metrics(corpus, crawl_out):
    """jq-style rollup of the event file vs the metrics counters."""
    (d, meta), (out, _) = corpus, crawl_out
    events = _events(out)
    assert len(events) == meta["n_boards"]  # one event per board
    ok = [e for e in events if e["type"] == "crawl_success"]
    assert all(e["attempt"] == 1 and e["error"] is None for e in ok)
    assert all(e["elapsed_sec"] >= 0 for e in events)
    # posts per crawl_success event == issued task/post rows of that board
    scout = pq.read_table(Path(out) / "scout",
                          columns=["rec_type", "board_id"]).to_pylist()
    per_board: dict[str, int] = {}
    for r in scout:
        if r["rec_type"] in ("task", "post"):
            per_board[r["board_id"]] = per_board.get(r["board_id"], 0) + 1
    for e in ok:
        assert e["posts"] == per_board.get(e["plugin"], 0), e["plugin"]
    # sum over events == the plugin:* metric counters' sum
    m = pq.read_table(Path(out) / "metrics.parquet").to_pylist()
    plugin_total = sum(r["count"] for r in m if r["key"].startswith("plugin:"))
    assert sum(e["posts"] for e in ok) == plugin_total


def test_fold_events_paths_match(ray_session, corpus, crawl_out):
    """The size-gated event fold: the distributed path (forced via gate=0)
    must produce exactly the driver-loop accounting."""
    from pathlib import Path

    from ssufid_ray.pipelines.crawl import fold_events

    (_, _), (out, manifest) = corpus, crawl_out
    ev_dir = str(Path(out) / "events")
    n_small, failed_small = fold_events(ev_dir)
    n_dist, failed_dist = fold_events(ev_dir, gate=0)
    assert (n_small, failed_small) == (n_dist, failed_dist)
    assert n_small == manifest["n_boards"]
    assert len(failed_small) == manifest["board_failures"]


def test_events_dataset_reader(ray_session, corpus, crawl_out):
    from ssufid_ray.pipelines.crawl import events_dataset

    (_, meta), (out, _) = corpus, crawl_out
    ds = events_dataset(out)
    rows = ds.take_all()
    assert len(rows) == meta["n_boards"]
    assert {r["type"] for r in rows} == {"crawl_success", "crawl_failed"}


def test_daemon_merge_event_report(corpus, tmp_path):
    """post_created events for every crawled doc on a cold-cache daemon run,
    and their count matches the metrics_merge rollup."""
    from datetime import datetime

    from ssufid_ray.pipelines.daemon import run_daemon
    from ssufid_ray.synth import CAL_HOST, CAL_YEARS

    d, meta = corpus
    out = str(tmp_path / "daemon")
    # a stale large-path artifact from a previous run into the same out
    # dir must be removed by the small-path branch (and vice versa), so
    # consumers never read yesterday's report as current
    stale = Path(out, "content_report_parts")
    stale.mkdir(parents=True)
    (stale / "part0.json").write_text('{"type":"stale"}\n')
    run_daemon(d, out, now=datetime(2026, 6, 2, 3, 0, 0), cal_host=CAL_HOST,
               cal_years=list(CAL_YEARS),
               cal_range=(datetime(2025, 1, 1), datetime(2026, 12, 31)))
    assert not stale.exists()
    lines = [json.loads(ln) for ln in
             Path(out, "content_report.jsonl").read_text().splitlines()]
    assert lines and all(e["type"] == "post_created" for e in lines)
    assert all(e["id"] and e["url"] for e in lines)
    m = {r["key"]: r["count"] for r in
         pq.read_table(Path(out) / "metrics_merge.parquet").to_pylist()}
    assert len(lines) == m["post_created"]


def test_seen_check_add_idempotent_on_retry(ray_session):
    """A retried walk_issue task replays its seen inserts; the idem key
    must return the ORIGINAL freshness verdicts instead of all-dup."""
    from ssufid_ray.state.seen import SeenSet

    seen = SeenSet.create(num_shards=2, capacity_per_shard=1 << 10)
    shard = seen.handles()[0]
    import ray as _ray

    urls = ["http://h.kr/a", "http://h.kr/b", "http://h.kr/a"]
    first = _ray.get(shard.check_and_add.remote(urls, "board-1/collected"))
    assert first == [True, True, False]
    # retry: same key, same urls -> memoized verdicts, no state change
    again = _ray.get(shard.check_and_add.remote(urls, "board-1/collected"))
    assert again == first
    # a DIFFERENT caller without the key still sees them as dups
    assert _ray.get(shard.check_and_add.remote(["http://h.kr/a"])) == [False]
    # a replay whose URL list DIVERGED (retried walks need not be
    # byte-identical) gets memoized verdicts for replayed urls and real
    # verdicts for new ones — never a truncated positional zip
    longer = ["http://h.kr/b", "http://h.kr/a", "http://h.kr/c"]
    diverged = _ray.get(shard.check_and_add.remote(longer, "board-1/collected"))
    assert diverged == [True, True, True]  # b,a memoized; c fresh
    # and the new url is now memoized too
    again2 = _ray.get(shard.check_and_add.remote(longer, "board-1/collected"))
    assert again2 == diverged


def test_metrics_accum_idempotent_per_batch(ray_session):
    import ray as _ray

    from ssufid_ray.pipelines.crawl import _CountsAccum

    acc = _CountsAccum.remote()
    _ray.get(acc.add.remote("k1", {"fetched": 3, "plugin:x": 3}))
    _ray.get(acc.add.remote("k1", {"fetched": 3, "plugin:x": 3}))  # retry
    _ray.get(acc.add.remote("k2", {"fetched": 1}))
    assert _ray.get(acc.totals.remote()) == {"fetched": 4, "plugin:x": 3}


def test_events_written_before_partition(corpus, crawl_out):
    """Resume treats a host as done when its scout parquet exists, so the
    event report must already be on disk for every done host."""
    (d, _), (out, _) = corpus, crawl_out
    hosts = {p.stem for p in Path(out, "scout").glob("*.parquet")}
    event_hosts = {p.name[:-len(".jsonl")] for p in Path(out, "events").glob("*.jsonl")}
    assert hosts <= event_hosts
    counts_hosts = {p.name[:-len(".counts.json")]
                    for p in Path(out, "scout_counts").glob("*.counts.json")}
    assert hosts <= counts_hosts


def test_board_retry_catches_parse_exceptions(ray_session, corpus):
    """run_with_retry folds ANY plugin error into the retry budget
    (core/mod.rs:49-93) — a parse exception must become a crawl_failed
    event with the error preserved, not kill the run."""
    from ssufid_ray.sources.pagestore import PageStoreClient
    from ssufid_ray.stages.boards import BoardSpec, register_strategy
    from ssufid_ray.stages.scout import load_robots, walk_with_retry
    from ssufid_ray import storage

    d, _meta = corpus
    seeds = storage.read_table(d + "/seeds.parquet").to_pylist()
    base = next(r for r in seeds if r["board_kind"] == "gnuboard")

    class BoomStrategy:
        kind = "boom"
        protocol = "single"
        upfront_pages = None

        def list_url(self, spec, page_no):
            # an existing page so the FETCH succeeds and the PARSE raises
            return f"{spec.base_url.split(':', 1)[0]}://{spec.host}/robots.txt"

        def parse_list(self, spec, body, page_url):
            raise ValueError("deliberately malformed list payload")

    register_strategy(BoomStrategy())
    spec = BoardSpec.from_row({**base, "board_id": "boom-b", "board_kind": "boom"})
    store = PageStoreClient(d)
    rp = load_robots(store, spec)
    walk, event = walk_with_retry(spec, store, rp)
    assert event["type"] == "crawl_failed"
    assert event["attempt"] == 3
    assert "AttemptsExceeded" in event["error"]
    assert "deliberately malformed" in event["error"]
    assert walk["collected"] == [] and walk["embedded"] == []
