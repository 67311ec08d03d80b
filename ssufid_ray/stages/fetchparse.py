"""Detail fetch + parse: the parallel, stateful hot stage.

Consumes the scout's issued detail tasks (`rec_type == "task"`) and embedded
posts (`rec_type == "post"`), fetches bodies from the page store with
per-host politeness + retry (reference retry budget core/mod.rs:38-93,
politeness wordpress/mod.rs:146), parses them with the board strategy into
full post rows with ordered spans, and emits one Arrow row per task —
including failure rows (`error_retry`, `parse_skipped`) so the record stream
doubles as the crawl metrics source (drop-with-metric, SURVEY §2.4 F2).

Runs as a map_batches ACTOR POOL: the page-store host indexes, compiled
selector sets (T3) and the politeness clock (T4) live in __init__, batches
in __call__.
"""

from __future__ import annotations

import pickle

import pyarrow as pa
import ray

from ssufid_ray import storage
from ssufid_ray.schema import POSTS_SCHEMA
from ssufid_ray.sources.pagestore import PageStoreClient
from ssufid_ray.stages.boards import BoardSpec, strategy_for

FETCH_OUT_SCHEMA = pa.schema(
    list(POSTS_SCHEMA)
    + [
        ("host", pa.string()),
        ("fetch_seq", pa.int64()),
        ("outcome", pa.string()),
        ("attempts", pa.int32()),
    ]
)

_EMPTY_POST = {f.name: None for f in POSTS_SCHEMA}


_SPECS_CACHE: dict = {}
_DELAY_CACHE: dict = {}


def _specs(seeds_path: str) -> dict:
    s = _SPECS_CACHE.get(seeds_path)
    if s is None:
        seeds = storage.read_table(seeds_path)
        s = _SPECS_CACHE[seeds_path] = {
            r["board_id"]: BoardSpec.from_row(r) for r in seeds.to_pylist()}
    return s


def batch_key(batch: pa.Table) -> str:
    """Deterministic identity of a fetch input batch (batch composition is
    a pure function of the scout output): used to make the metrics
    accumulator idempotent under Ray task retries."""
    return (f"{batch['host'][0].as_py()}:{batch['url'][0].as_py()}"
            f":{batch['fetch_seq'][0].as_py()}:{len(batch)}")


def batch_metric_counts(out: pa.Table) -> dict[str, int]:
    """The metrics contribution of one fetched batch (outcome counts,
    per-plugin counts, extra retry attempts) — computed while the table is
    hot so the metrics phase never re-scans the posts output."""
    import pyarrow.compute as pc

    counts: dict[str, int] = {}
    vc = out["outcome"].value_counts()
    for v, c in zip(vc.field("values"), vc.field("counts")):
        counts[v.as_py()] = counts.get(v.as_py(), 0) + int(c.as_py())
    pv = out["plugin_id"].value_counts()
    for v, c in zip(pv.field("values"), pv.field("counts")):
        if v.as_py() is not None:
            counts[f"plugin:{v.as_py()}"] = int(c.as_py())
    retry = pc.sum(pc.max_element_wise(
        pc.subtract(pc.cast(out["attempts"], pa.int64()), pa.scalar(1)),
        pa.scalar(0))).as_py()
    if retry:
        counts["fetch_retry"] = int(retry)
    return counts


def fetch_parse_batch(batch: pa.Table, corpus_dir: str, seeds_path: str,
                      politeness_scale: float = 0.0, refs: dict | None = None,
                      run_id: str | None = None,
                      extra_strategies: list | None = None,
                      accum=None) -> pa.Table:
    """Plain-task form of FetchParser: same semantics, worker-process-cached
    page store + specs (see pagestore.shared_client). `accum` is the
    0-CPU metrics accumulator actor; the add is a BLOCKING call so every
    batch's contribution is delivered before the phase barrier."""
    import ray as _ray

    from ssufid_ray.sources.pagestore import shared_client
    from ssufid_ray.stages.boards import register_strategy

    for st in extra_strategies or []:
        register_strategy(st)
    fp = FetchParser.__new__(FetchParser)
    fp.store = shared_client(corpus_dir, politeness_scale, refs=refs,
                             run_id=run_id, tune_gc=True)
    fp.specs = _specs(seeds_path)
    fp._delay_ms = _DELAY_CACHE  # robots crawl-delay memo shared per worker
    out = fp(batch)
    if accum is not None and len(out):
        _ray.get(accum.add.remote(batch_key(batch), batch_metric_counts(out)))
    return out


@ray.remote(num_cpus=1)
def fetch_chunk_task(issue_tbl: pa.Table, offset: int, length: int,
                     corpus_dir: str, seeds_path: str, posts_dir: str,
                     part_id: str, refs: dict | None = None,
                     run_id: str | None = None,
                     extra_strategies: list | None = None,
                     accum=None) -> dict:
    """Raw-task form of one fetch batch for the pipelined crawl: fires as
    soon as its host's finalize lands (issue_tbl is the finalize's shared
    table, sliced zero-copy), so detail fetching overlaps the remaining
    hosts' scouts instead of waiting behind a phase barrier — the one
    cross-phase dependency shape the Dataset API can't express without
    materializing. Output is the same hive layout write_parquet produced
    (plugin_id dir, column dropped from the file). Deterministic part
    names + atomic writes make a Ray retry of this task idempotent.

    Metric counts are RETURNED (summed by the driver at the drain
    barrier) instead of pushed through the accumulator actor: a blocking
    per-chunk actor round-trip measurably serializes the fetch pool at
    high CPU counts, and a task's return is exactly-once under Ray
    retries by construction. `accum` is accepted for signature compat
    but unused here (the Dataset-mode fetch path still uses it)."""
    import pyarrow.compute as pc

    from ssufid_ray import storage

    sub = issue_tbl.slice(offset, length)
    out = fetch_parse_batch(sub, corpus_dir, seeds_path, refs=refs,
                            run_id=run_id, extra_strategies=extra_strategies,
                            accum=None)
    if len(out) == 0:
        return {}
    for pid in pc.unique(out["plugin_id"]).to_pylist():
        part = out.filter(pc.equal(out["plugin_id"], pa.scalar(pid)))
        storage.write_table(
            part.drop_columns(["plugin_id"]),
            f"{posts_dir}/plugin_id={pid}/{part_id}.parquet")
    return batch_metric_counts(out)


class FetchParser:
    def __init__(self, corpus_dir: str, seeds_path: str,
                 politeness_scale: float = 0.0):
        self.store = PageStoreClient(corpus_dir, politeness_scale)
        seeds = storage.read_table(seeds_path)
        self.specs = {r["board_id"]: BoardSpec.from_row(r) for r in seeds.to_pylist()}
        self._delay_ms: dict[str, int] = {}  # robots Crawl-delay per host

    def _politeness(self, spec: BoardSpec, host: str) -> int:
        # key includes corpus_dir: _DELAY_CACHE is shared across runs in a
        # long-lived worker, and robots Crawl-delay varies per corpus seed
        key = (self.store.corpus_dir, host)
        d = self._delay_ms.get(key)
        if d is None:
            from ssufid_ray.functions.robots import crawl_delay_ms, parse_robots
            from ssufid_ray.stages.scout import robots_url_of

            res = self.store.get(robots_url_of(spec), host)
            d = crawl_delay_ms(parse_robots(res.body if res.ok else None))
            self._delay_ms[key] = d
        return max(spec.politeness_ms, d)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: list[dict] = []
        for row in batch.to_pylist():
            if row["rec_type"] == "post":  # embedded: already parsed by scout
                post = pickle.loads(row["payload"])
                out.append({**post, "host": row["host"], "fetch_seq": row["fetch_seq"],
                            "outcome": "embedded", "attempts": 0})
                continue
            spec = self.specs[row["board_id"]]
            meta = pickle.loads(row["payload"])
            res = self.store.get(row["url"], row["host"],
                                 self._politeness(spec, row["host"]))
            base = {**_EMPTY_POST, "plugin_id": spec.board_id, "url": row["url"],
                    "host": row["host"], "fetch_seq": row["fetch_seq"],
                    "attempts": res.attempts}
            if not res.ok:
                out.append({**base, "outcome": "error_retry"})
                continue
            strat = strategy_for(spec.board_kind)
            try:
                post = strat.parse_detail(spec, res.body, row["url"], meta)
            except (ValueError, KeyError) as e:  # malformed page: drop w/ metric
                out.append({**base, "outcome": "parse_skipped"})
                continue
            out.append({**post, "host": row["host"], "fetch_seq": row["fetch_seq"],
                        "outcome": "fetched", "attempts": res.attempts})
        return pa.Table.from_pylist(out, schema=FETCH_OUT_SCHEMA)
