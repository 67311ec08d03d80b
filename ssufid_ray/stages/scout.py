"""HostScout: the frontier's per-host state machine.

One scout task per host (invoked via `seeds.groupby("host").map_groups`),
because politeness serializes a host anyway: within a host, boards are
crawled strictly in priority order (priority_date desc, board_id asc — the
priority-heap key of the north rule), each board walking its list pages per
its protocol (sequential dependency: a page's emptiness / item count decides
whether the next page is fetched, mirroring the reference's pagination loops
SURVEY §2.1) and then *issuing* its detail fetches in list-row order.
`fetch_seq` is the per-host issue order; the actual detail fetch+parse runs
downstream in a parallel actor pool (the reference likewise issues detail
requests concurrently but in deterministic order via FuturesOrdered,
gnuboard/mod.rs:75-80).

Dedup authority is the sharded bloom+cuckoo seen-set: every URL the scout
issues goes through its host-shard actor's check_and_add, in issue order —
repeated pinned rows become `dup_skipped`, robots-disallowed paths become
`robots_blocked` (and still occupy a posts_limit slot, like a failed fetch
in the reference).

Output rows (SCOUT_SCHEMA): rec_type ∈
  record — a fetch/skip decision (lists, dups, robots blocks)
  task   — a detail fetch to execute downstream (payload = pickled RowMeta)
  post   — an embedded post already parsed from a JSON API list (payload =
           pickled post dict)
"""

from __future__ import annotations

import pickle

import pyarrow as pa
import ray

from ssufid_ray.functions.robots import allowed, parse_robots
from ssufid_ray.sources.pagestore import PageStoreClient
from ssufid_ray.stages.boards import PAGE_CAP, BoardSpec, RowMeta, strategy_for
from ssufid_ray.urlnorm import host_of, shard_of

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


class HostScout:
    """map_groups callable over one host's seed rows."""

    def __init__(self, corpus_dir: str, seen_actors: list, num_shards: int,
                 politeness_scale: float = 0.0):
        self.corpus_dir = corpus_dir
        self.seen_actors = seen_actors
        self.num_shards = num_shards
        self.politeness_scale = politeness_scale

    # -- helpers -----------------------------------------------------------
    def _seen(self, host: str):
        return self.seen_actors[shard_of(host, self.num_shards)]

    def __call__(self, group) -> pa.Table:
        specs = [BoardSpec.from_row(r) for r in group.to_dict("records")]
        specs.sort(key=lambda s: s.board_id)
        specs.sort(key=lambda s: s.priority_date, reverse=True)
        host = specs[0].host
        store = PageStoreClient(self.corpus_dir, self.politeness_scale)
        seen = self._seen(host)
        out: list[dict] = []
        seq = 0

        def check_add(urls: list[str]) -> list[bool]:
            return ray.get(seen.check_and_add.remote(urls))

        def record(url: str, s: int, outcome: str, doc_id: str | None = None) -> None:
            out.append({"rec_type": "record", "url": url, "host": host,
                        "board_id": "", "board_kind": "", "fetch_seq": s,
                        "doc_id": doc_id, "outcome": outcome, "payload": None})

        # robots first (seq 0)
        scheme = specs[0].base_url.split(":", 1)[0]
        robots_url = f"{scheme}://{host}/robots.txt"
        check_add([robots_url])
        res = store.get(robots_url, host)
        rp = parse_robots(res.body if res.ok else None)
        record(robots_url, seq, "fetched")
        seq += 1

        for spec in specs:
            strat = strategy_for(spec.board_kind)
            collected: list[RowMeta] = []
            embedded: list[dict] = []
            crawl_failed = False

            def fetch_raw(url: str):
                nonlocal seq, crawl_failed
                check_add([url])
                r = store.get(url, host, spec.politeness_ms)
                if not r.ok:
                    record(url, seq, "error_retry")
                    seq += 1
                    crawl_failed = True
                    return None
                record(url, seq, "fetched")
                seq += 1
                return r.body

            def fetch_list(url: str, politeness: bool = True):
                nonlocal seq, crawl_failed
                check_add([url])
                r = store.get(url, host, spec.politeness_ms if politeness else 0)
                if not r.ok:
                    record(url, seq, "error_retry")
                    seq += 1
                    crawl_failed = True
                    return None
                record(url, seq, "fetched")
                seq += 1
                return strat.parse_list(spec, r.body, url)

            kind = spec.board_kind
            if kind in ("gnuboard", "wordpress", "wordpress_card", "offset", "euckr"):
                page = 1
                distinct: set[str] = set()
                while True:
                    url = strat.list_url(spec, page)
                    if not allowed(rp, url):
                        check_add([url])
                        record(url, -1, "robots_blocked")
                        break
                    lp = fetch_list(url)
                    if lp is None:
                        break
                    collected += lp.rows
                    distinct |= {m.url for m in lp.rows}
                    # offset/euckr discover their bound (pageinfo / next
                    # button, S6/S7) instead of fetching a trailing empty page
                    stop = (not lp.has_more) if kind in ("offset", "euckr") else (not lp.rows)
                    if stop or len(distinct) >= spec.posts_limit or page >= PAGE_CAP:
                        break
                    page += 1
            elif kind == "ssucatch":
                for page in range(1, strat.num_pages(spec) + 1):  # upfront fan
                    url = strat.list_url(spec, page)
                    lp = fetch_list(url)
                    if lp is not None:
                        collected += lp.rows
            elif kind == "json_api":
                lp = fetch_list(strat.list_url(spec, 1))
                if lp is not None:
                    embedded = (lp.embedded or [])[: spec.posts_limit]
            elif kind == "cursor":
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
            elif kind == "lexical":
                lp = fetch_list(strat.list_url(spec, 1))
                if lp is not None:
                    collected = lp.rows[: spec.posts_limit]
            elif kind == "study":
                body = fetch_raw(strat.shell_url(spec))
                if body is not None:
                    strat.parse_shell(spec, body)  # initial state (pageSize)
                    page, taken = 1, 0
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
            elif kind == "sso":
                body = fetch_raw(strat.login_url(spec))
                if body is not None:
                    token = strat.parse_login(spec, body)  # session state (T5)
                    lp = fetch_list(strat.list_url(spec, 1, token=token))
                    if lp is not None:
                        embedded = (lp.embedded or [])[: spec.posts_limit]
            else:
                raise ValueError(f"unknown board kind {kind}")

            for p in embedded:
                out.append({"rec_type": "post", "url": p["url"], "host": host,
                            "board_id": spec.board_id, "board_kind": kind,
                            "fetch_seq": -1, "doc_id": p["doc_id"],
                            "outcome": "embedded", "payload": pickle.dumps(p)})

            # ---- detail issue loop (shared spec with the oracle generator)
            if collected:
                fresh = check_add([m.url for m in collected])
                slots = 0
                for m, is_fresh in zip(collected, fresh):
                    if not is_fresh:
                        record(m.url, -1, "dup_skipped")
                        continue
                    if slots >= spec.posts_limit:
                        continue
                    if not allowed(rp, m.url):
                        record(m.url, -1, "robots_blocked")
                        slots += 1
                        continue
                    out.append({"rec_type": "task", "url": m.url, "host": host,
                                "board_id": spec.board_id, "board_kind": kind,
                                "fetch_seq": seq, "doc_id": None, "outcome": None,
                                "payload": pickle.dumps(m)})
                    seq += 1
                    slots += 1
        return pa.Table.from_pylist(out, schema=SCOUT_SCHEMA)
