"""Frontier scouting: per-board list walks + per-host sequential assembly.

Ordering model (matches the reference): boards crawl CONCURRENTLY
(cli/main.rs:110 join_all) but the per-host issue order is deterministic —
robots first, then boards strictly in priority order (priority_date desc,
board_id asc; the priority-heap key of the north rule), each board's list
pages in protocol order followed by its detail issues in list-row order.

That determinism lets scouting split into two stages:

  walk_board   (PARALLEL, one task per board) — the parse-heavy list-page
               walk per the board's pagination protocol (SURVEY §2.1
               S1-S11). Pure: no seen-set side effects, no seq numbers.
  assemble_host (cheap, one task per host) — replays each board's walk in
               priority order, assigning the dense per-host fetch_seq,
               consulting the host's seen shard actor in issue order
               (dup_skipped), gating on robots (robots_blocked), enforcing
               posts_limit slots, and writing the host's scout partition
               atomically (per-partition checkpoint + seen lineage).

The serial path (HostScout) walks boards sequentially per host and is used
when politeness is enforced for real (politeness_scale > 0): one in-flight
fetch per host. Both paths produce identical scout tables.

Output rows (SCOUT_SCHEMA): rec_type ∈
  record    — a fetch/skip decision (lists, dups, robots blocks)
  task      — a detail fetch to execute downstream (payload = pickled RowMeta)
  post      — an embedded post parsed from a JSON API list (payload = pickle)
  seen_only — lineage row: URL entered the seen set without any other record
"""

from __future__ import annotations

import pickle

import pyarrow as pa
import pyarrow.compute as pc
import ray

from ssufid_ray.functions.robots import allowed, crawl_delay_ms, parse_robots
from ssufid_ray.sources.pagestore import PageStoreClient
from ssufid_ray.stages.boards import PAGE_CAP, BoardSpec, RowMeta, strategy_for
from ssufid_ray.urlnorm import shard_of

SCOUT_SCHEMA = pa.schema(
    [
        ("rec_type", pa.string()),
        ("url", pa.string()),
        ("host", pa.string()),
        ("board_id", pa.string()),
        ("board_kind", pa.string()),
        ("fetch_seq", pa.int64()),
        ("doc_id", pa.string()),
        ("outcome", pa.string()),
        ("payload", pa.binary()),
    ]
)

def robots_url_of(spec: BoardSpec) -> str:
    scheme = spec.base_url.split(":", 1)[0]
    return f"{scheme}://{spec.host}/robots.txt"


def load_robots(store: PageStoreClient, spec: BoardSpec):
    res = store.get(robots_url_of(spec), spec.host)
    return parse_robots(res.body if res.ok else None)


class _WavePageError(Exception):
    """A parse exception captured inside a page-fan subtask, re-raised in
    the walk with the ORIGINAL 'Type: message' formatting preserved so the
    crawl_failed event text is byte-identical to the sequential path."""

    def __init__(self, formatted: str):
        super().__init__(formatted)
        self.formatted = formatted


# wave schedule for fanned paged walks: the first waves stay inline
# (most boards stop within a few pages — a subtask round trip would only
# add latency), then waves grow so a 500-page board is ~6 serial rounds
# instead of 500. Overshoot past the protocol stop is nearly free: pages
# the reference never fetched are not in the page store, so an overshot
# get() is a dict miss, and its result is simply never consumed (nothing
# is recorded for it).
_WAVE_SCHEDULE = (1, 1, 6, 32, 96, 256)
_WAVE_MAX = 384
_FAN_CHUNK = 16    # pages per parse subtask within a fanned wave
_FAN_INLINE = 8    # waves up to this size parse inline, no subtasks


@ray.remote(num_cpus=1)
def parse_pages_task(corpus_dir: str, spec_row: dict, urls: list,
                     refs: dict | None, run_id: str | None,
                     extra_strategies: list | None):
    """Fan subtask: fetch+parse a chunk of one board's list pages. Returns
    per-url ('ok', ListParse) | ('miss', None) | ('exc', formatted) — the
    caller consumes results in page order and applies the protocol's stop
    rules, so records stay byte-identical to the sequential walk."""
    from ssufid_ray.sources.pagestore import shared_client
    from ssufid_ray.stages.boards import register_strategy

    for st in extra_strategies or []:
        register_strategy(st)
    store = shared_client(corpus_dir, refs=refs, run_id=run_id,
                           tune_gc=True)
    spec = BoardSpec.from_row(spec_row)
    strat = strategy_for(spec.board_kind)
    out = []
    for url in urls:
        r = store.get(url, spec.host, 0)
        if not r.ok:
            out.append(("miss", None))
            continue
        try:
            out.append(("ok", strat.parse_list(spec, r.body, url)))
        except Exception as e:  # noqa: BLE001 — replayed at the walk site
            out.append(("exc", f"{type(e).__name__}: {e}"))
    return out


def _make_page_fan(corpus_dir: str, spec_row: dict, refs: dict | None,
                   run_id: str | None, extra_strategies: list | None):
    """fan(urls) -> ordered results, parallelized in _FAN_CHUNK subtasks.
    The caller blocks in ray.get, which releases its CPU slot to the
    subtasks (Ray's nested-task resource release), so 60 blocked walks
    cannot deadlock the pool."""

    from ssufid_ray.sources.pagestore import shared_client

    def fan(urls: list) -> list:
        if len(urls) <= _FAN_INLINE:  # small wave: subtask latency > work
            store = shared_client(corpus_dir, refs=refs, run_id=run_id,
                           tune_gc=True)
            spec = BoardSpec.from_row(spec_row)
            strat = strategy_for(spec.board_kind)
            out = []
            for url in urls:
                r = store.get(url, spec.host, 0)
                if not r.ok:
                    out.append(("miss", None))
                    continue
                try:
                    out.append(("ok", strat.parse_list(spec, r.body, url)))
                except Exception as e:  # noqa: BLE001
                    out.append(("exc", f"{type(e).__name__}: {e}"))
            return out
        chunks = [urls[i:i + _FAN_CHUNK]
                  for i in range(0, len(urls), _FAN_CHUNK)]
        res = ray.get([parse_pages_task.remote(
            corpus_dir, spec_row, c, refs, run_id, extra_strategies)
            for c in chunks])
        return [r for chunk in res for r in chunk]

    return fan


def walk_board(spec: BoardSpec, store: PageStoreClient, rp,
               page_fan=None) -> dict:
    """Walk one board's list pages per its protocol. Pure w.r.t. shared
    state; returns {records: [(url, outcome)], collected: [RowMeta],
    embedded: [post dict]} with records in issue order.

    `page_fan` (replay mode only): a fan(urls)->results hook that parses
    page waves in parallel subtasks for the 'paged' and 'upfront'
    protocols. Stop rules are applied to the fan results IN PAGE ORDER,
    so the record stream, collected rows and failure semantics are
    byte-identical to the sequential walk — the wave only changes wall
    time past the protocol stop, never what is recorded."""
    strat = strategy_for(spec.board_kind)
    records: list[tuple[str, str]] = []
    collected: list[RowMeta] = []
    embedded: list[dict] = []
    politeness = max(spec.politeness_ms, crawl_delay_ms(rp))

    def fetch_list(url: str):
        r = store.get(url, spec.host, politeness)
        if not r.ok:
            records.append((url, "error_retry"))
            return None
        records.append((url, "fetched"))
        return strat.parse_list(spec, r.body, url)

    def fetch_raw(url: str):
        r = store.get(url, spec.host, politeness)
        if not r.ok:
            records.append((url, "error_retry"))
            return None
        records.append((url, "fetched"))
        return r.body

    kind = spec.board_kind
    protocol = getattr(strat, "protocol", "single")
    if protocol == "paged":
        page = 1
        distinct: set[str] = set()
        if page_fan is None:
            while True:
                url = strat.list_url(spec, page)
                if not allowed(rp, url):
                    records.append((url, "robots_blocked"))
                    break
                lp = fetch_list(url)
                if lp is None:
                    break
                collected += lp.rows
                distinct |= {m.url for m in lp.rows}
                # has_more is the protocol stop: empty page
                # (gnuboard/wordpress), pageinfo bound (offset, S6) or
                # next-button absence (euckr, S7)
                if not lp.has_more or len(distinct) >= spec.posts_limit or page >= PAGE_CAP:
                    break
                page += 1
        else:
            done = False
            wave_i = 0
            min_rows = 0  # smallest per-page yield seen (posts_limit cap)
            while not done and page <= PAGE_CAP:
                size = (_WAVE_SCHEDULE[wave_i] if wave_i < len(_WAVE_SCHEDULE)
                        else _WAVE_MAX)
                wave_i += 1
                if min_rows:
                    # cap the wave at the pages the posts_limit stop could
                    # still need (+2 pages of slack for pinned repeats):
                    # pages past the protocol stop were fetched and parsed
                    # in subtasks only to be discarded. Wave size never
                    # changes what is recorded — stop rules are applied to
                    # wave results in page order either way.
                    need = -(-(spec.posts_limit - len(distinct)) // min_rows)
                    size = min(size, max(1, need + 2))
                pages = range(page, min(page + size, PAGE_CAP + 1))
                urls, blocked_url = [], None
                for p in pages:  # robots gate, checked in page order
                    u = strat.list_url(spec, p)
                    if not allowed(rp, u):
                        blocked_url = u
                        break
                    urls.append(u)
                results = page_fan(urls) if urls else []
                for u, (tag, val) in zip(urls, results):  # page order
                    if tag == "exc":
                        raise _WavePageError(val)
                    if tag == "miss":
                        records.append((u, "error_retry"))
                        done = True
                        break
                    records.append((u, "fetched"))
                    collected += val.rows
                    distinct |= {m.url for m in val.rows}
                    if val.rows:
                        min_rows = (len(val.rows) if not min_rows
                                    else min(min_rows, len(val.rows)))
                    if (not val.has_more or len(distinct) >= spec.posts_limit
                            or page >= PAGE_CAP):
                        done = True
                        break
                    page += 1
                if not done and blocked_url is not None:
                    records.append((blocked_url, "robots_blocked"))
                    done = True
    elif protocol == "upfront":
        n_pages = strat.num_pages(spec)
        if page_fan is None:
            for page in range(1, n_pages + 1):  # upfront fan (S4)
                lp = fetch_list(strat.list_url(spec, page))
                if lp is not None:
                    collected += lp.rows
        else:
            urls = [strat.list_url(spec, p) for p in range(1, n_pages + 1)]
            for u, (tag, val) in zip(urls, page_fan(urls)):  # page order
                if tag == "exc":
                    raise _WavePageError(val)
                if tag == "miss":  # sequential path records and CONTINUES
                    records.append((u, "error_retry"))
                    continue
                records.append((u, "fetched"))
                collected += val.rows
    elif protocol == "single":
        lp = fetch_list(strat.list_url(spec, 1))
        if lp is not None:
            if lp.embedded:
                embedded = lp.embedded[: spec.posts_limit]
            else:
                collected = lp.rows[: spec.posts_limit]
    elif protocol == "cursor":
        cursor = None
        taken = 0
        while True:
            lp = fetch_list(strat.list_url(spec, 1, cursor=cursor))
            if lp is None:
                break
            items = lp.embedded or []
            embedded += items[: max(0, spec.posts_limit - taken)]
            taken += len(items)
            cursor = getattr(lp, "cursor", None)
            if not lp.has_more or taken >= spec.posts_limit or not items:
                break
    elif protocol == "shell_paged":
        body = fetch_raw(strat.shell_url(spec))
        if body is not None:
            strat.parse_shell(spec, body)  # initial state (pageSize)
            page, taken = 1, 0
            # NOTE: fanning this loop like 'paged' was measured and
            # REVERTED TWICE. Round 3: subtasks shipped pickled ListParse
            # posts back through the walk (deserialize + re-tabling kept
            # the cost serial; scale-48 crawl 8.5s -> 10.8-13.5s).
            # Round 4: a ships-nothing-back variant (subtasks returned
            # tiny per-page counts plus FINISHED SCOUT_SCHEMA Arrow rows,
            # walk did only stop rules + zero-copy prefix slices) made the
            # isolated walk 3.5x faster (1.6s -> 0.45s) yet the full warm
            # 32-CPU crawl SLOWER (best 5.91s -> 7.02s, A/B same box):
            # with per-board fetch dispatch the pool is ~88% saturated, so
            # the crawl is WORK-bound, not critical-path-bound — the fan's
            # extra table serialization and overshoot decode add total
            # work with no idle capacity to absorb it. On a cluster with
            # idle headroom the fan wins; at this node width the
            # hasNext-in-blob chain stays sequential.
            while True:
                lp = fetch_list(strat.list_url(spec, page))
                if lp is None:
                    break
                items = lp.embedded or []
                embedded += items[: max(0, spec.posts_limit - taken)]
                taken += len(items)
                page += 1
                if not lp.has_more or taken >= spec.posts_limit or not items:
                    break
    elif protocol == "login_single":
        body = fetch_raw(strat.login_url(spec))
        if body is not None:
            token = strat.parse_login(spec, body)  # session state (T5)
            lp = fetch_list(strat.list_url(spec, 1, token=token))
            if lp is not None:
                embedded = (lp.embedded or [])[: spec.posts_limit]
    elif protocol == "sso_chain":
        # multi-redirect SSO session (sso.rs:26-92): form scrape -> submit
        # (cookie + redirect) -> landing hop -> authenticated list. Every
        # hop is a recorded fetch; a broken hop fails the board attempt.
        body = fetch_raw(strat.login_url(spec))
        if body is not None:
            fields = strat.parse_login_form(spec, body)
            body2 = fetch_raw(strat.submit_url(spec, fields))
            if body2 is not None:
                _cookie, redirect = strat.parse_submit(spec, body2)
                body3 = fetch_raw(redirect)
                if body3 is not None:
                    token = strat.parse_landing(spec, body3)  # T5 session
                    lp = fetch_list(strat.list_url(spec, 1, token=token))
                    if lp is not None:
                        embedded = (lp.embedded or [])[: spec.posts_limit]
    else:
        raise ValueError(f"unknown protocol {protocol!r} for board kind {kind}")

    # any failed list/shell/login fetch fails the WHOLE board attempt
    # (reference run_with_retry semantics, core/mod.rs:38-93)
    failed = any(o == "error_retry" for _, o in records)
    return {"records": records, "collected": collected, "embedded": embedded,
            "failed": failed}


BOARD_RETRY = 3  # reference RETRY_COUNT, core/mod.rs:28


def walk_with_retry(spec: BoardSpec, store: PageStoreClient, rp,
                    page_fan=None) -> tuple[dict, dict]:
    """Whole-board retry (core/mod.rs:38-93): the walk is re-run up to
    BOARD_RETRY times; a failed final attempt discards its collected rows
    (the reference discards the whole SiteData on error) but keeps the
    record stream for metrics/lineage, and the last error is preserved in
    the crawl_failed event (AttemptsExceeded analogue). Returns
    (walk, event) where event is the content_report row (cli/main.rs
    setup_tracing + mod.rs crawl_success/crawl_failed fields)."""
    import time as _time

    walk = None
    last_exc: str | None = None
    elapsed = 0.0
    for attempt in range(1, BOARD_RETRY + 1):
        t0 = _time.monotonic()
        try:
            walk = walk_board(spec, store, rp, page_fan=page_fan)
            last_exc = None
        except Exception as e:  # noqa: BLE001 — reference run_with_retry
            # catches ANY plugin error (parse failures included) and folds
            # it into the retry budget instead of killing the whole run
            walk = {"records": [], "collected": [], "embedded": [],
                    "failed": True}
            # a fanned parse error carries the sequential path's formatting
            last_exc = e.formatted if isinstance(e, _WavePageError) \
                else f"{type(e).__name__}: {e}"
        elapsed = _time.monotonic() - t0
        if not walk["failed"]:
            return walk, {
                "type": "crawl_success", "plugin": spec.board_id,
                "url": spec.base_url, "posts_limit": spec.posts_limit,
                "posts": 0,  # filled in after the issue loop
                "retry_count": BOARD_RETRY, "attempt": attempt,
                "elapsed_sec": round(elapsed, 4), "error": None,
            }
    if last_exc is not None:
        last_error = last_exc
    else:
        err_url = next((u for u, o in walk["records"] if o == "error_retry"),
                       "")
        last_error = f"fetch failed for {err_url}"
    walk["collected"] = []
    walk["embedded"] = []
    return walk, {
        "type": "crawl_failed", "plugin": spec.board_id,
        "url": spec.base_url, "posts_limit": spec.posts_limit, "posts": 0,
        "retry_count": BOARD_RETRY, "attempt": BOARD_RETRY,
        "elapsed_sec": round(elapsed, 4),
        "error": f"AttemptsExceeded after {BOARD_RETRY} attempts; "
                 f"last error: {last_error}",
    }


def write_events(events: list[dict], events_dir: str, host: str) -> None:
    """Per-host content_report partition (atomic tmp+rename), JSON lines —
    the reference's reports/content_report.json analogue
    (cli/main.rs:300-339), partitioned by host for resumability."""
    import json as _json
    from pathlib import Path

    d = Path(events_dir)
    d.mkdir(parents=True, exist_ok=True)
    tmp = d / f".{host}.jsonl.tmp"
    tmp.write_text("".join(_json.dumps(e, ensure_ascii=False) + "\n"
                           for e in events))
    tmp.rename(d / f"{host}.jsonl")


def issue_board(spec: BoardSpec, walk: dict, check_add, rp) -> tuple[list[dict], int]:
    """One board's issue loop with LOCAL fetch_seq numbering (0-based;
    non-consuming rows carry -1). Returns (rows, n_seq_consumed).

    This is the unit of the PARALLEL assembly path: because detail and
    list URLs are disjoint across boards of a host (every URL embeds the
    board id), each board's seen/dup decisions are independent of its
    siblings, so boards can issue concurrently and the host's dense
    per-host numbering is recovered by prefix-sum offsets in priority
    order — the walk ORDER is all assembly needs. Hosts whose boards may
    share URLs must use the serial path (HostScout)."""
    host = spec.host
    out: list[dict] = []
    seq = 0

    def record(url: str, s: int, outcome: str, doc_id: str | None = None) -> None:
        out.append({"rec_type": "record", "url": url, "host": host,
                    "board_id": "", "board_kind": "", "fetch_seq": s,
                    "doc_id": doc_id, "outcome": outcome, "payload": None})

    if walk["records"]:
        # membership-only inserts (list URLs are unique per board):
        # one batched RPC instead of one per page
        check_add([u for u, _ in walk["records"]], f"{spec.board_id}/records")
    for url, outcome in walk["records"]:
        if outcome == "robots_blocked":
            record(url, -1, "robots_blocked")
        else:
            record(url, seq, outcome)
            seq += 1
    for p in walk["embedded"]:
        out.append({"rec_type": "post", "url": p["url"], "host": host,
                    "board_id": spec.board_id, "board_kind": spec.board_kind,
                    "fetch_seq": -1, "doc_id": p["doc_id"],
                    "outcome": "embedded", "payload": pickle.dumps(p)})
    collected = walk["collected"]
    if collected:
        fresh = check_add([m.url for m in collected],
                          f"{spec.board_id}/collected")
        slots = 0
        for m, is_fresh in zip(collected, fresh):
            if not is_fresh:
                record(m.url, -1, "dup_skipped")
                continue
            if slots >= spec.posts_limit:
                # beyond-limit rows entered the seen set; lineage row so
                # resume can replay shard state exactly
                out.append({"rec_type": "seen_only", "url": m.url, "host": host,
                            "board_id": "", "board_kind": "", "fetch_seq": -1,
                            "doc_id": None, "outcome": None, "payload": None})
                continue
            if not allowed(rp, m.url):
                record(m.url, -1, "robots_blocked")
                slots += 1
                continue
            out.append({"rec_type": "task", "url": m.url, "host": host,
                        "board_id": spec.board_id, "board_kind": spec.board_kind,
                        "fetch_seq": seq, "doc_id": None, "outcome": None,
                        "payload": pickle.dumps(m)})
            seq += 1
            slots += 1
    return out, seq


def _offset_rows(rows: list[dict], offset: int) -> list[dict]:
    for r in rows:
        if r["fetch_seq"] >= 0:
            r["fetch_seq"] += offset
    return rows


def assemble_rows(host: str, board_rows: list[tuple[list[dict], int]],
                  robots_url: str) -> list[dict]:
    """Stitch per-board issue results (already in priority order) into the
    host partition: robots record at seq 0, then prefix-sum seq offsets."""
    out: list[dict] = [{"rec_type": "record", "url": robots_url, "host": host,
                        "board_id": "", "board_kind": "", "fetch_seq": 0,
                        "doc_id": None, "outcome": "fetched", "payload": None}]
    offset = 1
    for rows, nseq in board_rows:
        out.extend(_offset_rows(rows, offset))
        offset += nseq
    return out


def write_partition(table: pa.Table, out_dir: str, host: str) -> None:
    import json as _json
    from pathlib import Path

    from ssufid_ray import storage

    # fine row groups: the fetch stage block-splits these files, and the
    # dominant host's partition must not become one straggler task
    storage.write_table(table, f"{out_dir}/{host}.parquet", row_group_size=64)
    # sidecar outcome counts (metrics phase reads these tiny JSONs instead
    # of re-scanning every partition; parquet scan kept as the fallback).
    # They live in a SIBLING dir: read_parquet(scout_dir) must only ever
    # see parquet files.
    recs = table.filter(pc.equal(table["rec_type"], pa.scalar("record")))
    vc = recs["outcome"].value_counts()
    counts = {v.as_py(): int(c.as_py())
              for v, c in zip(vc.field("values"), vc.field("counts"))}
    cdir = Path(out_dir).parent / "scout_counts"
    cdir.mkdir(parents=True, exist_ok=True)
    tmp = cdir / f".{host}.counts.tmp"
    tmp.write_text(_json.dumps(counts))
    tmp.rename(cdir / f"{host}.counts.json")


def assemble_host(
    host: str,
    specs_and_walks: list,
    check_add,
    rp,
    robots_url: str,
    out_dir: str | None = None,
) -> pa.Table:
    """Serial assembly (strict-politeness / general path): per-board issue
    loops run sequentially in priority order. Identical output to the
    parallel walk_issue/finalize path."""
    check_add([robots_url], f"robots/{robots_url}")
    board_rows = [issue_board(spec, walk, check_add, rp)
                  for spec, walk in specs_and_walks]
    table = pa.Table.from_pylist(assemble_rows(host, board_rows, robots_url),
                                 schema=SCOUT_SCHEMA)
    if out_dir is not None:
        write_partition(table, out_dir, host)
    return table


def priority_sorted(specs: list[BoardSpec]) -> list[BoardSpec]:
    specs = sorted(specs, key=lambda s: s.board_id)
    return sorted(specs, key=lambda s: s.priority_date, reverse=True)


# Keyed by (corpus_dir, host): Ray workers outlive a run_crawl call, and two
# runs in one session over different corpora reuse the same host names with
# different robots bodies — host-only keying served stale rules cross-run.
_ROBOTS_CACHE: dict = {}


def _cached_robots(store: PageStoreClient, spec: BoardSpec):
    key = (store.corpus_dir, spec.host)
    rp = _ROBOTS_CACHE.get(key)
    if rp is None:
        rp = _ROBOTS_CACHE[key] = load_robots(store, spec)
    return rp


@ray.remote(num_cpus=1, num_returns=3)
def walk_issue_task(corpus_dir: str, spec_row: dict, seen_actors: list,
                    num_shards: int, refs: dict | None = None,
                    run_id: str | None = None,
                    extra_strategies: list | None = None):
    """Raw Ray task, one per BOARD: the parse-heavy list walk fused with the
    board's seen/robots/slot issue loop (local seq). Boards issue fully in
    parallel — including the Zipf-dominant host's — because per-board URL
    disjointness makes their seen decisions independent (issue_board
    docstring); only the cheap offset stitch below is per-host. The rows
    become an Arrow table HERE (in the parallel task) so the per-host
    finalize is a vectorized offset + concat, not a 30k-dict rebuild.

    Three separate returns (table, nseq, event): the tiny nseq return
    lets the driver learn each board's seq consumption the moment its
    walk lands — the per-board fetch dispatch (board_issue_task) only
    needs the PREDECESSOR boards' nseq prefix-sum, so detail fetching
    no longer waits for the host's slowest board."""
    from ssufid_ray.sources.pagestore import shared_client
    from ssufid_ray.stages.boards import register_strategy

    for st in extra_strategies or []:  # custom kinds travel with the task
        register_strategy(st)
    store = shared_client(corpus_dir, refs=refs, run_id=run_id,
                           tune_gc=True)
    spec = BoardSpec.from_row(spec_row)
    rp = _cached_robots(store, spec)
    # replay mode (no enforced politeness): long paged/upfront walks fan
    # their page waves across parse subtasks — the Zipf-dominant board's
    # serial page chain is the crawl's critical path at high CPU counts
    fan = None
    if store.politeness_scale <= 0:
        proto = getattr(strategy_for(spec.board_kind), "protocol", "single")
        if proto in ("paged", "upfront"):
            fan = _make_page_fan(corpus_dir, spec_row, refs, run_id,
                                 extra_strategies)
    walk, event = walk_with_retry(spec, store, rp, page_fan=fan)
    seen = seen_actors[shard_of(spec.host, num_shards)]

    def check_add(urls: list[str], key: str) -> list[bool]:
        # idem key: a Ray retry of this task replays the same inserts
        return ray.get(seen.check_and_add.remote(urls, key))

    rows, nseq = issue_board(spec, walk, check_add, rp)
    if event["type"] == "crawl_success":
        event["posts"] = sum(1 for r in rows if r["rec_type"] in ("task", "post"))
    return pa.Table.from_pylist(rows, schema=SCOUT_SCHEMA), nseq, event


# columns the detail-fetch stage consumes (doc_id/outcome unused there)
FETCH_COLS = ["rec_type", "url", "host", "board_id", "fetch_seq", "payload"]


def _issue_view(table: pa.Table) -> pa.Table:
    return table.filter(
        pc.is_in(table["rec_type"], pa.array(["task", "post"]))
    ).select(FETCH_COLS)


def _shift_seqs(btab: pa.Table, offset: int) -> pa.Table:
    """The per-host seq recovery: local seq >= 0 += offset (shared by the
    host finalize and the per-board fetch dispatch so both produce
    identical fetch_seq values by construction)."""
    if btab.num_rows == 0:
        return btab
    seqs = btab["fetch_seq"]
    shifted = pc.if_else(pc.greater_equal(seqs, pa.scalar(0, pa.int64())),
                         pc.add(seqs, pa.scalar(offset, pa.int64())),
                         seqs)
    return btab.set_column(btab.schema.get_field_index("fetch_seq"),
                           "fetch_seq", shifted)


@ray.remote(num_cpus=0.25, num_returns=2)
def board_issue_task(btab: pa.Table, offset: int):
    """Per-BOARD fetch dispatch for the pipelined crawl: the host finalize
    still stitches the full partition, but detail fetching must not wait
    for the host's slowest board. This task applies the same offset shift
    finalize_host_task would (offset = 1 + sum of the priority-order
    predecessors' nseq, prefix-summed by the driver as the small nseq
    returns land) and projects the board's issue view, so its fetch
    chunks enter the worker pool the moment the board's own walk — and
    only its predecessors' counts, not their payloads — are ready.
    Returns (n_issue_rows, view); the driver slices chunk ranges off the
    view exactly as it does off a host finalize's table."""
    view = _issue_view(_shift_seqs(btab, offset))
    return len(view), view


@ray.remote(num_cpus=0.5, num_returns=2)
def finalize_host_task(scout_dir: str, seeds_rows: list,
                       seen_actors: list, num_shards: int,
                       events_dir: str | None = None,
                       want_issue: bool = True,
                       *issue_blobs):
    """Raw Ray task, one per host: fires when ITS boards' issue blobs are
    ready; stitches them in priority order (prefix-sum seq offsets), adds
    the robots record, writes the partition + event report atomically.
    O(rows) column bump, no parsing, no per-URL RPCs — the old
    serial-assembly ceiling on the dominant host is gone.

    Returns TWO objects: (info dict, issue-row table). The second return
    lets the crawl pipeline start this host's detail fetches the moment
    the host finalizes — from shared memory, without re-reading the
    partition or waiting for other hosts (the driver only ever gets the
    small info dict). Barrier-mode callers pass want_issue=False so the
    payload-heavy view is never duplicated into the object store for a
    consumer that does not exist."""
    specs = priority_sorted([BoardSpec.from_row(r) for r in seeds_rows])
    # issue_blobs are the walk tasks' three returns, flattened
    # (t1, n1, e1, t2, n2, e2, ...) so Ray resolves each small nseq/event
    # ref independently of the payload-heavy tables
    triples = list(zip(issue_blobs[0::3], issue_blobs[1::3],
                       issue_blobs[2::3]))
    issued = {r["board_id"]: b for r, b in zip(seeds_rows, triples)}
    host = specs[0].host
    seen = seen_actors[shard_of(host, num_shards)]
    ray.get(seen.check_and_add.remote([robots_url_of(specs[0])],
                                      f"{host}/robots"))
    robots_row = pa.Table.from_pylist(
        [{"rec_type": "record", "url": robots_url_of(specs[0]), "host": host,
          "board_id": "", "board_kind": "", "fetch_seq": 0, "doc_id": None,
          "outcome": "fetched", "payload": None}], schema=SCOUT_SCHEMA)
    parts = [robots_row]
    offset = 1
    for s in specs:
        btab, nseq, _ev = issued[s.board_id]
        if btab.num_rows:
            # vectorized per-host seq recovery (shared with board_issue_task)
            parts.append(_shift_seqs(btab, offset))
        offset += nseq
    table = pa.concat_tables(parts).combine_chunks()
    events = [issued[s.board_id][2] for s in specs]
    # events BEFORE the partition: the partition's existence is the
    # resume-done marker, so a crash between the two must never leave a
    # "done" host with a missing event report (lost crawl_failed rows)
    if events_dir is not None:
        write_events(events, events_dir, host)
    write_partition(table, scout_dir, host)
    issue = _issue_view(table) if want_issue \
        else _issue_view(table.schema.empty_table())
    info = {"rows": len(table), "boards": len(specs),
            "issue_rows": len(issue),
            "failed": sum(1 for e in events if e["type"] == "crawl_failed")}
    return info, issue


@ray.remote(num_cpus=0.25, num_returns=2)
def load_issue_task(scout_dir: str, host: str):
    """Resume counterpart of finalize_host_task's second return: a host
    whose partition was completed by a PREVIOUS process re-enters the
    pipelined fetch by loading its issue rows in a task (same (info,
    table) shape, nothing host-sized on the driver)."""
    import pyarrow.parquet as pq
    from pathlib import Path

    table = pq.read_table(str(Path(scout_dir) / f"{host}.parquet"),
                          columns=FETCH_COLS)
    issue = _issue_view(table)  # same filter+projection as a fresh finalize
    return {"rows": len(table), "issue_rows": len(issue)}, issue


class HostScout:
    """Serial per-host scout (strict-politeness path): boards walked
    sequentially in priority order with the politeness clock engaged —
    one in-flight fetch per host. Identical output to the parallel
    walk+assemble path."""

    def __init__(self, corpus_dir: str, seen_actors: list, num_shards: int,
                 politeness_scale: float = 0.0, out_dir: str | None = None,
                 extra_strategies: list | None = None,
                 events_dir: str | None = None):
        self.corpus_dir = corpus_dir
        self.seen_actors = seen_actors
        self.num_shards = num_shards
        self.politeness_scale = politeness_scale
        self.out_dir = out_dir
        self.events_dir = events_dir
        self.extra_strategies = extra_strategies or []

    def __call__(self, group) -> pa.Table:
        from ssufid_ray.stages.boards import register_strategy

        for st in self.extra_strategies:
            register_strategy(st)
        rows = group if isinstance(group, list) else group.to_dict("records")
        specs = priority_sorted([BoardSpec.from_row(r) for r in rows])
        host = specs[0].host
        store = PageStoreClient(self.corpus_dir, self.politeness_scale)
        rp = load_robots(store, specs[0])
        seen = self.seen_actors[shard_of(host, self.num_shards)]

        def check_add(urls: list[str], key: str = "") -> list[bool]:
            return ray.get(seen.check_and_add.remote(urls, key or None))

        walks, events = [], []
        for s in specs:
            walk, event = walk_with_retry(s, store, rp)
            walks.append((s, walk))
            events.append(event)
        table = assemble_host(host, walks, check_add, rp,
                              robots_url_of(specs[0]), out_dir=None)
        issued = table.filter(
            pc.is_in(table["rec_type"], pa.array(["task", "post"])))
        per_board: dict[str, int] = {}
        for b in issued["board_id"].to_pylist():
            per_board[b] = per_board.get(b, 0) + 1
        for e in events:
            if e["type"] == "crawl_success":
                e["posts"] = per_board.get(e["plugin"], 0)
        # same ordering contract as finalize_host_task: events first
        if self.events_dir is not None:
            write_events(events, self.events_dir, host)
        if self.out_dir is not None:
            write_partition(table, self.out_dir, host)
        return table
