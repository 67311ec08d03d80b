"""Job entrypoints (`ray job submit -- python -m ssufid_ray.cli ...`).

The only place in the library tree that may own a Ray session — guarded, so
the driver/pytest can also import and call `main()` with a live session.

    python -m ssufid_ray.cli crawl    --corpus DIR --out DIR [--politeness S]
    python -m ssufid_ray.cli verify   --corpus DIR --out DIR
    python -m ssufid_ray.cli calendar --corpus DIR --out DIR [--start Y-M-D --end Y-M-D]
    python -m ssufid_ray.cli synth    --out DIR [--scale F] [--seed N]
"""

from __future__ import annotations

import argparse
import json
import sys
from datetime import datetime


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ssufid_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl")
    c.add_argument("--corpus", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--politeness", type=float, default=0.0)
    c.add_argument("--no-resume", action="store_true")
    c.add_argument("-i", "--include", nargs="*", default=None)
    c.add_argument("-e", "--exclude", nargs="*", default=None)
    c.add_argument("-l", "--limit", type=int, default=None)
    c.add_argument("--num-cpus", type=int, default=32)

    v = sub.add_parser("verify")
    v.add_argument("--corpus", required=True)
    v.add_argument("--out", required=True)
    v.add_argument("--num-cpus", type=int, default=32)

    cal = sub.add_parser("calendar")
    cal.add_argument("--corpus", required=True)
    cal.add_argument("--out", required=True)
    cal.add_argument("--start", default="2025-01-01")
    cal.add_argument("--end", default="2026-12-31")
    cal.add_argument("--num-cpus", type=int, default=32)

    dm = sub.add_parser("daemon")
    dm.add_argument("--corpus", required=True)
    dm.add_argument("--out", required=True)
    dm.add_argument("--num-cpus", type=int, default=32)

    syn = sub.add_parser("synth")
    syn.add_argument("--out", required=True)
    syn.add_argument("--scale", type=float, default=1.0)
    syn.add_argument("--seed", type=int, default=42)

    args = p.parse_args(argv)

    if args.cmd == "synth":  # no Ray session needed
        from ssufid_ray.synth import generate_corpus

        meta = generate_corpus(args.out, scale=args.scale, seed=args.seed)
        print(json.dumps(meta))
        return 0

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    try:
        if args.cmd == "crawl":
            from ssufid_ray.pipelines.crawl import run_crawl

            manifest = run_crawl(args.corpus, args.out,
                                 politeness_scale=args.politeness,
                                 resume=not args.no_resume,
                                 include=args.include, exclude=args.exclude,
                                 posts_limit=args.limit)
            print(json.dumps({k: v for k, v in manifest.items()}, default=str))
            # reference exit accounting (cli/main.rs:118-125): nonzero when
            # any board exhausted its whole-board retry budget
            failures = manifest.get("board_failures", 0)
            if failures:
                print(f"{failures} of {manifest.get('n_boards', '?')} Run failed",
                      file=sys.stderr)
                return 1
            return 0
        if args.cmd == "verify":
            from ssufid_ray.pipelines.verify import compare_crawl

            rep = compare_crawl(args.corpus, args.out)
            print(json.dumps(rep, default=str))
            return 0 if rep["ok"] else 1
        if args.cmd == "daemon":
            from ssufid_ray.pipelines.daemon import run_daemon
            from ssufid_ray.synth import CAL_HOST, CAL_YEARS

            r = run_daemon(
                args.corpus, args.out, now=datetime.utcnow(),
                cal_host=CAL_HOST, cal_years=list(CAL_YEARS),
                cal_range=(datetime(2025, 1, 1),
                           datetime(2026, 12, 31, 23, 59, 59)))
            print(json.dumps(r, default=str))
            return 0
        if args.cmd == "calendar":
            from ssufid_ray.pipelines.calendar import run_calendar
            from ssufid_ray.pipelines.site import write_calendar_ics
            from ssufid_ray.synth import CAL_HOST, CAL_YEARS

            events = run_calendar(
                args.corpus, CAL_HOST, list(CAL_YEARS),
                range_start=datetime.fromisoformat(args.start),
                range_end=datetime.fromisoformat(args.end).replace(
                    hour=23, minute=59, second=59),
            )
            path = write_calendar_ics(events, args.out)
            print(json.dumps({"ics": path}))
            return 0
    finally:
        if owns_session:
            ray.shutdown()
    return 2


if __name__ == "__main__":
    sys.exit(main())
