"""The flagship crawl pipeline (SURVEY §3.1 re-architected Ray-Data-first).

    seeds ──► walk_issue_task   (raw Ray tasks, one per board: the
         │                 parse-heavy list walk in a whole-board retry
         │                 loop + the board's seen/robots/limit issue
         │                 loop with local seq — join_all concurrency)
         └─► finalize_host_task (one per host, fires when ITS boards
                            finish: prefix-sum seq offsets, event report,
                            atomic per-host scout partition = checkpoint)
    scout partitions ─ map_batches(fetch_parse) ──► posts parquet
                                                    (partitioned by plugin)
    records ─ per-batch partial counts ──► metrics parquet (no shuffle)
    seen shards ──► per-shard bloom/cuckoo dumps

Page bodies are shared zero-copy: one Arrow table per host in the object
store (parallel load tasks), refs resolved once on the driver. The scout
phase output (frontier working set) is durable parquet re-read with column
pruning — at 10^10-URL scale this is the per-generation frontier spill, and
with the per-host partitioning it is what makes the run resumable: a rerun
replays seen lineage from completed partitions and re-scouts only missing
hosts.

Partitioning keys (SURVEY §7.3): host (scout partitions = politeness/seen
domains), plugin_id (posts output layout), outcome (metrics rollup).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ssufid_ray import storage
from ssufid_ray.state.seen import SeenSet
from ssufid_ray.stages.fetchparse import (FetchParser, batch_key,
                                           batch_metric_counts)
from ssufid_ray.stages.scout import HostScout


@ray.remote(num_cpus=0)
class _CountsAccum:
    """0-CPU metric accumulator: fetch batches add their counts while the
    table is hot, so the metrics phase needs no posts re-scan.

    Scale note: one tiny dict per BATCH (not per row) crosses to this
    actor, so the call rate is rows/batch_size; if a deployment's batch
    count saturates a single mailbox, shard by hash(host) across K
    accumulators and sum on the driver — the parquet-scan fallback below
    also remains a correct (slower) path."""

    def __init__(self):
        self.counts: dict[str, int] = {}
        self._seen_batches: set[str] = set()

    def add(self, batch_key: str, d: dict) -> None:
        # idempotent per batch: a RETRIED fetch task re-sends the same
        # deterministic batch; double-applying it would inflate metrics
        if batch_key in self._seen_batches:
            return
        self._seen_batches.add(batch_key)
        for k, v in d.items():
            self.counts[k] = self.counts.get(k, 0) + v

    def totals(self) -> dict:
        return self.counts


def run_crawl(
    corpus_dir: str,
    out_dir: str,
    *,
    num_seen_shards: int = 8,
    seen_capacity: int = 1 << 20,
    politeness_scale: float = 0.0,
    fetch_batch_size: int = 128,
    resume: bool = True,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    posts_limit: int | None = None,
    extra_strategies: list | None = None,
    pipeline_fetch: bool = True,
) -> dict:
    """Run the full crawl replay. Returns the output manifest (paths +
    counters). `resume=True` skips phases whose outputs a previous run
    committed to the manifest (kill/resume correctness test relies on it).

    `include`/`exclude` are the reference CLI's board semi/anti filters
    (mutually exclusive, cli/main.rs:89-91 + macros.rs:46-113);
    `posts_limit` overrides every board's limit (the `-l` flag,
    cli/main.rs:82-94). Any of these produce an *effective* seed table under
    out_dir — the oracle comparison only applies to unfiltered runs."""
    from pathlib import Path

    if include and exclude:
        raise ValueError("include and exclude are mutually exclusive")

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    manifest_path = str(out / "manifest.json")
    manifest = (storage.read_manifest(manifest_path) or {}) if resume else {}
    filter_sig = {"include": sorted(include) if include else None,
                  "exclude": sorted(exclude) if exclude else None,
                  "posts_limit": posts_limit}
    if manifest and manifest.get("filters", filter_sig) != filter_sig:
        raise ValueError(
            f"out_dir {out_dir} holds a run with different filters "
            f"({manifest['filters']}); use a fresh out_dir or resume=False")
    manifest["filters"] = filter_sig
    seeds_path = str(Path(corpus_dir) / "seeds.parquet")
    if include or exclude or posts_limit is not None:
        rows = storage.read_table(seeds_path).to_pylist()
        known = {r["board_id"] for r in rows}
        for requested in (include or []) + (exclude or []):
            if requested not in known:
                raise ValueError(f"unknown board id: {requested!r}")
        if include:
            rows = [r for r in rows if r["board_id"] in set(include)]
        if exclude:
            rows = [r for r in rows if r["board_id"] not in set(exclude)]
        if not rows:
            raise ValueError("board filters matched no seeds")
        if posts_limit is not None:
            for r in rows:
                r["posts_limit"] = posts_limit
        from ssufid_ray.schema import SEED_SCHEMA

        seeds_path = str(out / "seeds_effective.parquet")
        storage.write_table(pa.Table.from_pylist(rows, schema=SEED_SCHEMA),
                            seeds_path)

    import time as _time

    phase_sec: dict[str, float] = {}
    _t = _time.monotonic()
    seen = SeenSet.create(num_seen_shards, seen_capacity)
    seen_dir = str(out / "seen")
    from ssufid_ray.sources.pagestore import make_refs

    # zero-copy shared page tables: one load task per host in parallel,
    # driver-owned refs passed to every task (no per-task actor RPCs, no
    # registry-actor spawn on the serial path; walk tasks overlap with the
    # loads and block only on their own host's table). run_id scopes
    # worker-side client caches to THIS run's ref lifetime.
    import uuid

    run_id = uuid.uuid4().hex
    _hosts_for_prefetch = sorted(
        set(storage.read_table(seeds_path, columns=["host"])["host"].to_pylist()))
    page_refs = make_refs(corpus_dir, _hosts_for_prefetch)

    # ---- phase 1: scout (frontier walk; assigns fetch_seq, dedups, gates)
    # Each host is one partition: its scout task writes <scout>/<host>.parquet
    # atomically, so a killed run resumes by replaying the completed
    # partitions' seen lineage and re-scouting only the missing hosts.
    scout_dir = str(out / "scout")
    events_dir = str(out / "events")
    posts_dir = str(out / "posts")
    Path(scout_dir).mkdir(parents=True, exist_ok=True)
    seeds_tbl = storage.read_table(seeds_path)
    all_hosts = sorted(set(seeds_tbl["host"].to_pylist()))
    done_hosts = {p.stem for p in Path(scout_dir).glob("*.parquet")}
    todo = [h for h in all_hosts if h not in done_hosts]
    # Pipelined fetch (replay mode, fetch not yet committed): each host's
    # detail-fetch chunks are submitted the moment ITS finalize lands, so
    # fetching overlaps the remaining scouts instead of waiting behind a
    # phase barrier. Strict-politeness runs keep the host-grouped Dataset
    # path; a resume with scouting fully done also uses the Dataset path.
    pipelined = (pipeline_fetch and politeness_scale <= 0 and todo
                 and not manifest.get("fetch_done"))
    fetch_chunk_refs: list = []
    accum = _CountsAccum.remote()
    if manifest.get("scout_done") and not todo:
        seen.restore(seen_dir)  # fast path: restore shard dumps
    else:
        if done_hosts:
            _replay_seen(scout_dir, sorted(done_hosts), seen)
        if todo:
            import pickle as _pickle

            mask = pc.is_in(seeds_tbl["host"], pa.array(todo))
            todo_rows = seeds_tbl.filter(mask).to_pylist()
            if politeness_scale > 0:
                # strict politeness: serial walk per host, one task per host
                # (groupby().map_groups would pack hosts into one block)
                groups: dict[str, list[dict]] = {}
                for r in todo_rows:
                    groups.setdefault(r["host"], []).append(r)
                items = [{"host": h, "specs": _pickle.dumps(rows)}
                         for h, rows in sorted(groups.items())]
                scout = HostScout(corpus_dir, seen.handles(), num_seen_shards,
                                  politeness_scale, out_dir=scout_dir,
                                  extra_strategies=extra_strategies,
                                  events_dir=events_dir)

                def scout_host(t: pa.Table) -> pa.Table:
                    return scout(_pickle.loads(t["specs"][0].as_py()))

                (ray.data.from_items(items, override_num_blocks=len(items))
                 .map_batches(scout_host, batch_size=1, batch_format="pyarrow",
                              num_cpus=1)
                 .materialize())
            else:
                # replay mode: boards walk AND issue in PARALLEL (reference
                # join_all concurrency) — walk+issue is one fused task per
                # board (per-board URL disjointness makes seen decisions
                # board-local, scout.issue_board); each host's finalize is a
                # cheap raw Ray task that fires as soon as ITS boards'
                # blobs are ready and just prefix-sums seq offsets. This
                # per-host dependency join is the one spot the Dataset API
                # can't express without materializing.
                import ray as _ray

                from ssufid_ray.stages.boards import \
                    strategy_for as _strat_for
                from ssufid_ray.stages.scout import (BoardSpec,
                                                     finalize_host_task,
                                                     priority_sorted,
                                                     walk_issue_task)

                groups: dict[str, list[dict]] = {}
                for r in sorted(todo_rows,
                                key=lambda r: (r["host"], r["board_id"])):
                    groups.setdefault(r["host"], []).append(r)
                if pipelined:
                    import shutil as _shutil

                    _shutil.rmtree(posts_dir, ignore_errors=True)

                # walk submission order: heaviest boards FIRST. The serial
                # protocols (study's hasNext-in-blob chain, cursor/sso
                # hops, single-shot JSON parse) are the crawl's Amdahl
                # poles at high CPU counts — host-alphabetical submission
                # queued them behind a full wave of cheap walks. Order is
                # a scheduling hint only: every board's walk is
                # independent, so outputs are order-invariant.
                _serial = {"shell_paged", "cursor", "sso_chain",
                           "login_single", "single"}

                def _est_cost(r: dict) -> int:
                    try:
                        proto = getattr(_strat_for(r["board_kind"]),
                                        "protocol", "single")
                    except Exception:  # unregistered custom kind: neutral
                        proto = "paged"
                    return r["posts_limit"] * (3 if proto in _serial else 1)

                walk_refs: dict = {}  # (host, board_id) -> (t, n, e) refs
                for r in sorted(todo_rows,
                                key=lambda r: (-_est_cost(r), r["host"],
                                               r["board_id"])):
                    walk_refs[(r["host"], r["board_id"])] = \
                        walk_issue_task.remote(
                            corpus_dir, r, seen.handles(), num_seen_shards,
                            page_refs, run_id, extra_strategies)
                phase_sec["scout_submit"] = round(_time.monotonic() - _t, 3)
                fin_refs: dict = {}  # finalize info_ref -> host
                for host, rows in sorted(groups.items()):
                    flat: list = []
                    for r in rows:
                        flat.extend(walk_refs[(host, r["board_id"])])
                    # want_issue=False: per-board dispatch below replaces
                    # the host-level issue view, so the payload-heavy
                    # table is never duplicated into the object store
                    iref, _ = finalize_host_task.remote(
                        scout_dir, rows, seen.handles(),
                        num_seen_shards, events_dir, False, *flat)
                    fin_refs[iref] = host
                if pipelined:
                    from ssufid_ray.stages.fetchparse import fetch_chunk_task
                    from ssufid_ray.stages.scout import (board_issue_task,
                                                         load_issue_task)

                    # Per-BOARD fetch dispatch: board i of a host can start
                    # fetching once its own walk and the nseq counts (tiny
                    # separate returns) of its priority-order predecessors
                    # land — not the host's slowest board. The prefix-sum
                    # below mirrors finalize_host_task exactly, so
                    # fetch_seq values are identical by construction.
                    pending: dict = {}  # ref -> ("nseq"|"disp"|"load"|"fin", ...)
                    hstate: dict = {}
                    for host, rows in groups.items():
                        order = [s.board_id for s in priority_sorted(
                            [BoardSpec.from_row(r) for r in rows])]
                        hstate[host] = {"order": order, "nseq": {},
                                        "pos": 0, "offset": 1, "disp": set()}

                    def _advance(host: str) -> None:
                        st = hstate[host]
                        while st["pos"] < len(st["order"]):
                            bid = st["order"][st["pos"]]
                            if bid not in st["disp"]:
                                tref, nref, eref = walk_refs[(host, bid)]
                                nrows_ref, view_ref = board_issue_task.remote(
                                    tref, st["offset"])
                                pending[nrows_ref] = ("disp", host, bid,
                                                      view_ref)
                                st["disp"].add(bid)
                                # finalize + dispatch now hold the board
                                # table; dropping ours lets the store
                                # reclaim it as soon as both consume it
                                walk_refs[(host, bid)] = (None, nref, eref)
                            if bid not in st["nseq"]:
                                return  # next offset unknown until it lands
                            st["offset"] += st["nseq"][bid]
                            st["pos"] += 1

                    for (host, bid), (_t3, nref, _e3) in walk_refs.items():
                        pending[nref] = ("nseq", host, bid)
                    for iref, host in fin_refs.items():
                        pending[iref] = ("fin", host)
                    for host in groups:
                        _advance(host)  # position 0 dispatches immediately
                    # hosts finished by a previous process re-enter the
                    # pipeline through a load task (same two-return shape)
                    for host in sorted(done_hosts):
                        iref, tref = load_issue_task.remote(scout_dir, host)
                        pending[iref] = ("load", host, tref)
                    while pending:
                        ready, _ = _ray.wait(list(pending), num_returns=1)
                        for ref in ready:
                            tag = pending.pop(ref)
                            if tag[0] == "nseq":
                                _, host, bid = tag
                                hstate[host]["nseq"][bid] = _ray.get(ref)
                                _advance(host)
                            elif tag[0] == "disp":
                                _, host, bid, view_ref = tag
                                n = _ray.get(ref)
                                fetch_chunk_refs.extend(
                                    fetch_chunk_task.remote(
                                        view_ref, off, fetch_batch_size,
                                        corpus_dir, seeds_path, posts_dir,
                                        f"{host}-{bid}-{off:08d}", page_refs,
                                        run_id, extra_strategies, None)
                                    for off in range(0, n, fetch_batch_size))
                                del view_ref  # chunks hold the only ref now
                            elif tag[0] == "load":
                                _, host, tref = tag
                                n = _ray.get(ref)["issue_rows"]
                                fetch_chunk_refs.extend(
                                    fetch_chunk_task.remote(
                                        tref, off, fetch_batch_size,
                                        corpus_dir, seeds_path, posts_dir,
                                        f"{host}-{off:08d}", page_refs,
                                        run_id, extra_strategies, None)
                                    for off in range(0, n, fetch_batch_size))
                                del tref
                            # "fin": barrier only — partition written
                else:
                    _ray.get(list(fin_refs))
                    fin_refs.clear()
                phase_sec["scout_walk"] = round(
                    _time.monotonic() - _t - phase_sec["scout_submit"], 3)
        seen.checkpoint(seen_dir)  # per-shard atomic dumps
        manifest["scout_done"] = True
        storage.write_manifest(manifest_path, manifest)
    # board-failure accounting (reference cli/main.rs:118-125 "N of M Run
    # failed") + the error_report artifact, derived from the per-host event
    # partitions so resume paths see the same numbers
    import json as _json

    n_events, failed_events = fold_events(str(events_dir))
    err_path = out / "error_report.jsonl"
    err_path.write_text("".join(_json.dumps(e, ensure_ascii=False) + "\n"
                                for e in failed_events))
    manifest["n_boards"] = n_events
    manifest["board_failures"] = len(failed_events)
    phase_sec["scout"] = round(_time.monotonic() - _t, 3)
    _t = _time.monotonic()

    # ---- phase 2: fetch + parse details
    if pipelined:
        # the chunks were submitted per board during the scout; this is
        # just the drain barrier (most work already overlapped the walk).
        # Each chunk RETURNS its metric counts — summed here instead of
        # funneled through a blocking accumulator RPC per chunk.
        _tot: dict[str, int] = {}
        for c in ray.get(fetch_chunk_refs):
            for k, v in (c or {}).items():
                _tot[k] = _tot.get(k, 0) + v
        manifest["_fetch_counts"] = {k: int(v) for k, v in _tot.items()}
        manifest["fetch_done"] = True
        storage.write_manifest(manifest_path, manifest)
    if not manifest.get("fetch_done"):
        import shutil as _shutil

        # a killed mid-write leaves partial part files; the phase is only
        # committed via the manifest flag, so start from a clean dir
        _shutil.rmtree(posts_dir, ignore_errors=True)
        # scout partitions are one file per host; small row groups + an
        # override_num_blocks read split the Zipf-dominant host's file
        # across tasks instead of fusing it into one straggler. Block
        # count tracks row count (~150 rows/block): tiny blocks starve the
        # fetch operator's batch packing (measured: 19-row blocks ran the
        # fetch stage at ~30% CPU utilization; ~100-250-row blocks ~2x
        # faster), huge blocks re-create the straggler.
        import pyarrow.parquet as _pq

        # row count straight from the parquet footers: a Dataset count()
        # here costs a full executor startup on the serial path
        n_scout_rows = sum(
            _pq.ParquetFile(f).metadata.num_rows
            for f in Path(scout_dir).glob("*.parquet"))
        blocks = min(2048, max(64, n_scout_rows // 150))
        tasks = ray.data.read_parquet(
            scout_dir, override_num_blocks=blocks,
            columns=["rec_type", "url", "host", "board_id", "fetch_seq",
                     "payload"],  # prune: doc_id/outcome unused downstream
        ).randomize_block_order(seed=0).map_batches(
            # block-order shuffle (driver-side metadata, no data movement):
            # the heavy HTML-parse hosts' blocks are contiguous in file
            # order and otherwise land together at the END of the
            # schedule, leaving a straggler tail; ordering stays encoded
            # in fetch_seq, never in physical row order
            lambda t: t.filter(pc.is_in(t["rec_type"], pa.array(["task", "post"]))),
            batch_format="pyarrow",
        )
        if politeness_scale > 0:
            # strict politeness: one fetch domain per host — host-partitioned
            # groups so the per-host min-interval clock is globally honored
            # (wordpress/mod.rs:146 semantics). Bench mode (scale=0) uses the
            # parallel actor pool below instead.
            fp = FetchParser(corpus_dir, seeds_path, politeness_scale)

            def fetch_host(t: pa.Table) -> pa.Table:
                import ray as _ray

                from ssufid_ray.stages.boards import register_strategy

                for st in extra_strategies or []:
                    register_strategy(st)
                out_t = fp(t)
                if len(out_t):
                    _ray.get(accum.add.remote(batch_key(t),
                                              batch_metric_counts(out_t)))
                return out_t

            fetched = tasks.groupby("host").map_groups(
                fetch_host, batch_format="pyarrow")
        else:
            from ssufid_ray.stages.fetchparse import fetch_parse_batch

            fetched = tasks.map_batches(
                lambda t: fetch_parse_batch(t, corpus_dir, seeds_path,
                                            refs=page_refs, run_id=run_id,
                                            extra_strategies=extra_strategies,
                                            accum=accum),
                batch_format="pyarrow",
                batch_size=fetch_batch_size,
            )
        storage.write_dataset(fetched, posts_dir, partition_col="plugin_id")
        manifest["_fetch_counts"] = {
            k: int(v) for k, v in ray.get(accum.totals.remote()).items()}
        import os as _os

        if _os.environ.get("SSUFID_STATS"):  # per-stage wall/cpu audit hook
            print(fetched.stats())
        manifest["fetch_done"] = True
        storage.write_manifest(manifest_path, manifest)
    phase_sec["fetch"] = round(_time.monotonic() - _t, 3)
    _t = _time.monotonic()

    # ---- phase 3: metrics rollup (A1/A2 analogue) — column-pruned reads,
    # per-batch partial counts, tiny driver-side sum (no all-to-all shuffle)
    metrics_path = str(out / "metrics.parquet")
    if not manifest.get("metrics_done"):
        # fast path: per-host sidecar counts (written at finalize time) +
        # the fetch accumulator — zero re-scans. Fallback below re-derives
        # both sides from the parquet outputs (older runs / partial state).
        import json as _json

        count_files = sorted((out / "scout_counts").glob("*.counts.json"))
        host_files = sorted(Path(scout_dir).glob("*.parquet"))
        fetch_counts = manifest.get("_fetch_counts")
        if fetch_counts is not None and len(count_files) == len(host_files):
            agg_d: dict[str, int] = dict(fetch_counts)
            agg_d.setdefault("fetch_retry", 0)  # parity with the scan path
            for f in count_files:
                for k, v in _json.loads(f.read_text()).items():
                    agg_d[k] = agg_d.get(k, 0) + int(v)
            tbl = pa.table({"key": pa.array(sorted(agg_d), pa.string()),
                            "count": pa.array([int(agg_d[k]) for k in sorted(agg_d)],
                                              pa.int64())})
            storage.write_table(tbl, metrics_path)
            manifest["metrics_done"] = True
            manifest["paths"] = {
                "scout": scout_dir, "posts": posts_dir, "seen": seen_dir,
                "metrics": metrics_path, "events": events_dir,
                "error_report": str(out / "error_report.jsonl"),
            }
            storage.write_manifest(manifest_path, manifest)
    if not manifest.get("metrics_done"):
        def value_counts(col):
            def f(t: pa.Table) -> pa.Table:
                vc = t[col].value_counts()
                return pa.table({"key": vc.field("values"),
                                 "count": pc.cast(vc.field("counts"), pa.int64())})
            return f

        # ONE streaming execution for both record sources (union) — the
        # second executor startup was a fixed cost at every corpus size
        scout_counts = (
            ray.data.read_parquet(scout_dir, columns=["rec_type", "outcome"])
            .map_batches(lambda t: t.filter(pc.equal(t["rec_type"], pa.scalar("record"))),
                         batch_format="pyarrow")
            .map_batches(value_counts("outcome"), batch_format="pyarrow")
        )
        post_counts = (
            ray.data.read_parquet(posts_dir,
                                  columns=["plugin_id", "outcome", "attempts"])
            .map_batches(
                lambda t: pa.concat_tables([
                    value_counts("outcome")(t),
                    pa.table({
                        "key": pc.binary_join_element_wise(
                            pa.array(["plugin"] * len(t)), t["plugin_id"], ":"),
                        "count": pa.array([1] * len(t), pa.int64()),
                    }),
                    pa.table({  # K5 fetch_retry: extra attempts beyond the first
                        "key": pa.array(["fetch_retry"], pa.string()),
                        "count": pa.array(
                            [int(pc.sum(pc.max_element_wise(
                                pc.subtract(pc.cast(t["attempts"], pa.int64()),
                                            pa.scalar(1)),
                                pa.scalar(0))).as_py() or 0)], pa.int64()),
                    }),
                ]),
                batch_format="pyarrow",
            )
        )
        import pandas as pd

        partials = scout_counts.union(post_counts).to_pandas()
        agg = partials.groupby("key", as_index=False)["count"].sum()
        tbl = pa.Table.from_pandas(agg, preserve_index=False)
        storage.write_table(tbl, metrics_path)
        manifest["metrics_done"] = True
        manifest["paths"] = {
            "scout": scout_dir, "posts": posts_dir, "seen": seen_dir,
            "metrics": metrics_path, "events": events_dir,
            "error_report": str(out / "error_report.jsonl"),
        }
        storage.write_manifest(manifest_path, manifest)

    phase_sec["metrics"] = round(_time.monotonic() - _t, 3)
    manifest["phase_sec"] = phase_sec
    manifest["seen_size"] = seen.size()
    return manifest


def _replay_seen(scout_dir: str, hosts: list[str], seen: SeenSet) -> None:
    """Rebuild shard-actor membership from completed host partitions (every
    URL a scout checked is present as a record / task / seen_only row)."""
    from pathlib import Path

    import pyarrow.parquet as pq

    for host in hosts:
        t = pq.read_table(str(Path(scout_dir) / f"{host}.parquet"),
                          columns=["url", "host"])
        urls = t["url"].to_pylist()
        if urls:
            seen.check_and_add(urls, t["host"].to_pylist())


EVENTS_FOLD_GATE = 64  # host-partition count above which the fold distributes


def fold_events(events_dir: str,
                gate: int = EVENTS_FOLD_GATE) -> tuple[int, list[dict]]:
    """Board-failure accounting over the per-host event partitions ->
    (n_events, crawl_failed rows sorted by plugin). Size-gated like the
    dimension joins: at bench host counts a driver read is ~1 ms and adds
    ZERO serial time to the crawl (the scaling floor), while a Dataset job
    costs ~0.25 s of driver latency; above the gate the fold is one
    streaming pass emitting per-batch partials (count + failed rows), so
    the driver sees O(blocks) rows, never the event stream. A parity test
    pins both paths equal with gate=0."""
    import json as _json
    from pathlib import Path

    files = sorted(Path(events_dir).glob("*.jsonl"))
    if not files:
        return 0, []
    if len(files) <= gate:
        failed, n = [], 0
        for f in files:
            for line in f.read_text().splitlines():
                e = _json.loads(line)
                n += 1
                if e["type"] == "crawl_failed":
                    failed.append(e)
    else:
        def partial(t: pa.Table) -> pa.Table:
            fail = t.filter(pc.field("type") == "crawl_failed")
            return pa.table({
                "n": pa.array([len(t)], pa.int64()),
                "failed": pa.array([_json.dumps(fail.to_pylist(),
                                                ensure_ascii=False)],
                                   pa.string())})

        rows = (ray.data.read_json([str(f) for f in files])
                .map_batches(partial, batch_format="pyarrow").take_all())
        n = sum(r["n"] for r in rows)
        failed = [e for r in rows for e in _json.loads(r["failed"])]
    return n, sorted(failed, key=lambda e: e["plugin"])


def events_dataset(out_dir: str) -> ray.data.Dataset:
    """The structured crawl event log (content_report analogue, K5) as a
    Dataset: one JSON-lines partition per host under <out>/events/."""
    from pathlib import Path

    files = sorted(str(p) for p in (Path(out_dir) / "events").glob("*.jsonl"))
    return ray.data.read_json(files)


def records_dataset(out_dir: str) -> ray.data.Dataset:
    """The unified fetch-decision record stream: scout records (lists, dups,
    robots blocks) + detail fetch outcomes. Column-pruned at the read."""
    from pathlib import Path

    cols = ["url", "host", "fetch_seq", "doc_id", "outcome"]
    scout = ray.data.read_parquet(str(Path(out_dir) / "scout"),
                                  columns=["rec_type"] + cols)
    scout = scout.map_batches(
        lambda t: t.filter(pc.field("rec_type") == "record").drop_columns(["rec_type"]),
        batch_format="pyarrow",
    )
    posts = ray.data.read_parquet(str(Path(out_dir) / "posts"),
                                  columns=cols)
    return scout.union(posts)


def documents_dataset(out_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """The crawled documents table (posts with spans), successful rows only."""
    from pathlib import Path

    ds = ray.data.read_parquet(str(Path(out_dir) / "posts"), columns=columns)
    return ds.map_batches(
        lambda t: t.filter(pc.is_in(t["outcome"], pa.array(["fetched", "embedded"]))),
        batch_format="pyarrow",
    )
