"""Full daemon lifecycle: crawl -> merge -> top-k -> sites + calendar, and
the incremental second run (everything skipped, nothing rewritten wrong)."""

import json
import shutil
from datetime import datetime
from pathlib import Path


def test_daemon_first_and_second_run(corpus):
    from ssufid_ray.pipelines.daemon import run_daemon
    from ssufid_ray.synth import CAL_HOST, CAL_YEARS

    d, meta = corpus
    out = "/tmp/ssufid_test/daemon"
    shutil.rmtree(out, ignore_errors=True)
    now = datetime.fromisoformat(meta["merge_now"])
    kw = dict(now=now, cal_host=CAL_HOST, cal_years=list(CAL_YEARS),
              cal_range=(datetime(2025, 1, 1), datetime(2026, 12, 31)))
    r1 = run_daemon(d, out, **kw)
    assert r1["outcomes"] == {"created": meta["n_docs"]}  # empty cache
    assert r1["boards_written"] > 40
    assert r1["calendar_events"] > 10
    ics = Path(r1["calendar_ics"]).read_bytes()
    assert ics.count(b"BEGIN:VEVENT") == r1["calendar_events"]

    data = json.loads(next(Path(out, "sites").glob("*/data.json")).read_text())
    assert data["items"] and data["items"][0]["created_at"].endswith("Z")

    # second run against the produced cache: the daemon re-crawls by itself
    # (stale crawl scratch must not short-circuit it) -> all skipped
    r2 = run_daemon(d, out, **kw)
    assert r2["outcomes"] == {"skipped": meta["n_docs"]}
    assert r2["calendar_events"] == r1["calendar_events"]
