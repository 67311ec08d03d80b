"""Simulated-HTTP page store: the 'web' the engine crawls.

The corpus lays pages out as one Parquet file per host
(`<corpus>/pages/<host>.parquet`). A client loads a host's file lazily and
indexes url -> row once per worker (actor-held state; at real scale this
component is the HTTP client of SURVEY §2.5 T4 and the politeness clock
lives here). Flaky rows return 500 on the first attempt and succeed on
retry; status-500 rows fail every attempt (the reference retries a crawl 3×,
core/mod.rs:38-93 — we retry per-fetch with the same budget)."""

from __future__ import annotations

import time
from pathlib import Path

import pyarrow.parquet as pq
import ray

RETRY_COUNT = 3


def _load_host_table(pages_dir: Path, host: str):
    path = pages_dir / f"{host}.parquet"
    if not path.exists():
        return None
    return pq.read_table(path)


@ray.remote(num_cpus=0.25)
def _load_task(pages_dir: str, host: str):
    return _load_host_table(Path(pages_dir), host)


_REFS_CACHE: dict = {}  # (session_job, corpus_dir, hosts) -> {host: ref}


def make_refs(corpus_dir: str, hosts: list[str]) -> dict:
    """One Arrow table per host, loaded by a PARALLEL task and shared
    zero-copy by every worker via its ObjectRef (instead of each worker
    loading and indexing the file privately — which made total load work
    grow with worker count). Submitting the tasks from the driver makes
    the DRIVER the refs' owner and costs ~ms: no registry-actor spawn on
    the crawl's serial critical path, and downstream tasks that receive
    the dict start immediately, blocking only on their own host's ref.

    The refs are CACHED per (ray session, corpus): the page store is the
    simulated WEB, not engine state — a second run_crawl over the same
    corpus in one driver session (bench warm runs, resume tests) reuses
    the already-shared tables instead of re-reading the 'internet' from
    disk. Loads are submitted biggest-file-first: the Zipf-dominant
    host's load is the longest pole and gates its walks."""
    pages_dir = Path(corpus_dir) / "pages"
    try:
        session = ray.get_runtime_context().get_job_id()
    except Exception:  # no session yet: caller owns init; don't cache
        session = None
    key = (session, str(corpus_dir), tuple(sorted(hosts)))
    refs = _REFS_CACHE.get(key)
    if refs is None:
        _REFS_CACHE.clear()  # one corpus at a time; old refs may be dead

        def _size(h: str) -> int:
            p = pages_dir / f"{h}.parquet"
            return p.stat().st_size if p.exists() else 0

        refs = {h: _load_task.remote(str(pages_dir), h)
                for h in sorted(hosts, key=lambda h: -_size(h))}
        if session is not None:
            _REFS_CACHE[key] = refs
    return refs

_CLIENTS: dict = {}
_GC_TUNED = False


def _tune_worker_gc() -> None:
    """Crawl workers parse HTML into large ACYCLIC Element trees
    (functions/html.py carries no parent backref, so pages free by
    refcount the moment they go out of scope). The default gen-0 GC
    trigger (700 container allocations) still fires hundreds of times per
    page parse and traces every live container for nothing — measured at
    ~10-16% of the parse kernel. Once per worker process: collect, freeze
    the long-lived state built so far (page-table refs, board specs,
    compiled strategies, selector caches) out of the collector's young
    generations, and raise the gen-0 threshold. Cyclic garbage from any
    stage sharing the worker still collects — every 50k container
    allocations instead of every 700 — so this cannot leak unboundedly."""
    global _GC_TUNED
    if _GC_TUNED:
        return
    _GC_TUNED = True
    import gc
    import os

    if os.environ.get("SSUFID_GC_TUNE") == "0":  # A/B escape hatch
        return
    gc.collect()
    gc.freeze()
    gc.set_threshold(50_000, 25, 25)


def shared_client(corpus_dir: str, politeness_scale: float = 0.0,
                  registry=None, refs: dict | None = None,
                  run_id: str | None = None,
                  tune_gc: bool = False) -> "PageStoreClient":
    """Per-worker-process client cache. Ray reuses worker processes across
    plain tasks within a job, so module-global caching gives actor-style
    state (host indexes, robots, politeness clocks) without paying actor
    pool startup for every stage.

    When shared refs are passed, the cache key is the REFS' identity
    (their object ids): a later run reusing the same cached refs
    (make_refs session cache) hits the same client — host url indexes
    survive across runs in warm workers — while a new session's fresh
    refs miss and rebuild, so a client can never hold refs whose owner
    has died (OwnerDiedError on get). Without refs, `run_id` scopes the
    cache to one run_crawl invocation as before."""
    if refs is not None:
        rkey = tuple(sorted((h, r.hex()) for h, r in refs.items()))
        key = (corpus_dir, politeness_scale, rkey)
    else:
        key = (corpus_dir, politeness_scale, run_id)
    c = _CLIENTS.get(key)
    if c is None:
        _CLIENTS.clear()  # drop clients holding a previous run's dead refs
        c = _CLIENTS[key] = PageStoreClient(corpus_dir, politeness_scale,
                                            registry=registry, refs=refs)
        if tune_gc:  # crawl fetch/parse workers opt in explicitly: the
            # threshold bump is process-permanent, so stages that are not
            # parse-dominated must not inherit it just for calling here
            _tune_worker_gc()
    else:
        if registry is not None and c.registry is None:
            c.registry = registry
        if refs is not None and c.refs is None:
            c.refs = refs
    return c


class FetchResult:
    __slots__ = ("url", "status", "content_type", "body", "attempts")

    def __init__(self, url, status, content_type, body, attempts):
        self.url = url
        self.status = status
        self.content_type = content_type
        self.body = body
        self.attempts = attempts

    @property
    def ok(self) -> bool:
        return self.status == 200


class PageStoreClient:
    """Lazy per-host page index + politeness clock + retry budget."""

    def __init__(self, corpus_dir: str, politeness_scale: float = 0.0,
                 registry=None, refs: dict | None = None):
        self.corpus_dir = str(corpus_dir)  # cache-key scope for worker memos
        self.pages_dir = Path(corpus_dir) / "pages"
        self.politeness_scale = politeness_scale
        self.registry = registry
        self.refs = refs  # {host: ObjectRef(table)} resolved on the driver
        self._hosts: dict[str, tuple[dict[str, int], object]] = {}
        self._next_ok: dict[str, float] = {}
        self.virtual_wait_ms = 0  # politeness budget accounting (metrics)
        self.fetch_count = 0
        self.retry_count = 0

    def _host_index(self, host: str):
        entry = self._hosts.get(host)
        if entry is None:
            if self.refs is not None:
                ref = self.refs.get(host)
                tbl = None if ref is None else ray.get(ref)  # zero-copy shm
            elif self.registry is not None:
                ref = ray.get(self.registry.get_ref.remote(host))[0]
                tbl = None if ref is None else ray.get(ref)  # zero-copy shm
            else:
                tbl = _load_host_table(self.pages_dir, host)
            if tbl is None:
                entry = ({}, None)
            else:
                idx = {u: i for i, u in enumerate(tbl["url"].to_pylist())}
                entry = (idx, tbl)
            self._hosts[host] = entry
        return entry

    def _politeness_wait(self, host: str, politeness_ms: int) -> None:
        """Per-host min-interval. Virtual budget is always accounted;
        real sleeping only when politeness_scale > 0 (tests)."""
        self.virtual_wait_ms += politeness_ms
        if self.politeness_scale <= 0 or politeness_ms <= 0:
            return
        now = time.monotonic()
        ok_at = self._next_ok.get(host, now)
        if ok_at > now:
            time.sleep(ok_at - now)
            now = ok_at
        self._next_ok[host] = now + politeness_ms * self.politeness_scale / 1000.0

    def get(self, url: str, host: str, politeness_ms: int = 0,
            max_attempts: int = RETRY_COUNT) -> FetchResult:
        idx, tbl = self._host_index(host)
        i = idx.get(url)
        if i is None:
            return FetchResult(url, 404, "", b"", 1)
        status = tbl["status"][i].as_py()
        flaky = tbl["flaky"][i].as_py()
        body = tbl["body"][i].as_py()
        ct = tbl["content_type"][i].as_py()
        attempts = 0
        for attempt in range(max_attempts):
            self._politeness_wait(host, politeness_ms)
            self.fetch_count += 1
            attempts = attempt + 1
            if status == 200 and not (flaky and attempt == 0):
                return FetchResult(url, 200, ct, body, attempts)
            self.retry_count += 1
        return FetchResult(url, status if status != 200 else 500, ct, b"", attempts)
