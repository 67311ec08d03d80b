"""Sharded URL-seen set: host-hash-partitioned actors, bloom front +
cuckoo backing + exact set.

North-rule component (SURVEY §2.9): `hash(host) % num_shards` routes every
URL of one host to one shard actor, so a Zipf-dominant host (the reference's
notice.ssu.ac.kr analogue) maps to exactly one politeness/seen domain and
cannot poison other shards. The reference's equivalent state is the per-board
IndexMap upsert (/root/reference/packages/ssufid/src/core/mod.rs:340-343).

Usage from a pipeline:

    seen = SeenSet.create(num_shards=8, capacity_per_shard=1 << 20)
    unseen_ds = candidates.map_batches(SeenFilter(seen.handles()), ...)

The filter stage is a plain map_batches callable that batches RPCs per shard
— no all-to-all shuffle per generation; upstream host-partitioned blocks
mean most batches touch one shard.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import pyarrow as pa
import ray

from ssufid_ray.state.filters import BloomFilter, CuckooFilter
from ssufid_ray.urlnorm import shard_of


@ray.remote(num_cpus=0)  # pure state actor: must never reserve scheduler CPUs
class SeenShardActor:
    """One shard of the URL-seen set. Bloom answers the fast negative path;
    cuckoo + exact set confirm positives (no false positives)."""

    def __init__(self, shard_id: int, capacity: int, fpp: float = 0.01):
        self.shard_id = shard_id
        self.bloom = BloomFilter(capacity, fpp)
        self.cuckoo = CuckooFilter(capacity, seed=shard_id)
        self.exact: set[str] = set()
        # idempotent-call memo, keyed per (idem_key -> url -> verdict).
        # Per-URL (not a positional list) because a retried task's walk
        # output need not be byte-identical: a replay with a longer or
        # reordered URL list must still get a correct verdict for every
        # position instead of a silently truncated zip downstream.
        self._idem: dict[str, dict[str, bool]] = {}

    def check_and_add(self, urls: list[str],
                      idem_key: str | None = None) -> list[bool]:
        """For each url, True iff it was NOT seen before (and mark seen).
        Duplicates inside one call: first occurrence wins.

        `idem_key` makes the call replay-safe: a RETRIED Ray task repeats
        the same logical insert, and without the memo its second execution
        would see its own URLs as dups and silently issue nothing. Keys
        are per (board, call site), so the memo stays tiny and dies with
        the run's actors."""
        memo = self._idem.setdefault(idem_key, {}) if idem_key is not None \
            else None
        # the verdict depends only on the EXACT set (bloom never overrides
        # it: every exact member was bloom-added, and bloom false positives
        # are vetoed by `u in exact`), so verdicts vectorize per call and
        # the probabilistic adds batch afterwards — bit-identical filter
        # state, ~10x less per-URL numpy overhead on the dominant shard.
        out: list[bool | None] = [None] * len(urls)
        call_seen: set[str] = set()
        fresh: list[str] = []
        for i, u in enumerate(urls):
            if u in call_seen:  # duplicate within this call
                out[i] = False
                continue
            call_seen.add(u)
            if memo is not None and u in memo:  # replayed url: same verdict
                out[i] = memo[u]
                continue
            verdict = u not in self.exact
            out[i] = verdict
            if memo is not None:
                memo[u] = verdict
            if verdict:
                fresh.append(u)
        if fresh:
            self.bloom.add_batch(fresh)
            for u in fresh:  # cuckoo kicks are order-dependent: keep order
                self.cuckoo.add(u)
            self.exact.update(fresh)
        return out

    def contains(self, urls: list[str]) -> list[bool]:
        return [(u in self.bloom) and (u in self.exact) for u in urls]

    def members(self) -> list[str]:
        return sorted(self.exact)

    def size(self) -> int:
        return len(self.exact)

    # -- checkpoint --------------------------------------------------------
    def dump(self, path: str) -> int:
        state = {
            "shard_id": self.shard_id,
            "bloom": self.bloom.dump(),
            "cuckoo": self.cuckoo.dump(),
            "exact": sorted(self.exact),
        }
        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        tmp = p.with_suffix(".tmp")
        with open(tmp, "wb") as f:
            pickle.dump(state, f)
        tmp.rename(p)  # atomic per-partition checkpoint
        return len(self.exact)

    def restore(self, path: str) -> int:
        with open(path, "rb") as f:
            state = pickle.load(f)
        self.shard_id = state["shard_id"]
        self.bloom = BloomFilter.load(state["bloom"])
        self.cuckoo = CuckooFilter.load(state["cuckoo"])
        self.exact = set(state["exact"])
        return len(self.exact)


class SeenSet:
    """Driver-side facade over the shard actors."""

    def __init__(self, actors: list, num_shards: int):
        self.actors = actors
        self.num_shards = num_shards

    @classmethod
    def create(cls, num_shards: int = 8, capacity_per_shard: int = 1 << 20,
               fpp: float = 0.01) -> "SeenSet":
        actors = [
            SeenShardActor.remote(i, capacity_per_shard, fpp)
            for i in range(num_shards)
        ]
        for a in actors:
            a.size.remote()  # fire-and-forget ping: actor processes start
            # spawning NOW and overlap with seed reads / page-table loads,
            # instead of lazily on the first walk task's RPC (~0.6 s spawn
            # latency measured serializing into the scout critical path)
        return cls(actors, num_shards)

    def handles(self):
        return self.actors

    def check_and_add(self, urls: list[str], hosts: list[str]) -> list[bool]:
        """Batched membership-test-and-insert, preserving input order."""
        by_shard: dict[int, list[int]] = {}
        for idx, h in enumerate(hosts):
            by_shard.setdefault(shard_of(h, self.num_shards), []).append(idx)
        refs, order = [], []
        for sid, idxs in by_shard.items():
            refs.append(self.actors[sid].check_and_add.remote([urls[i] for i in idxs]))
            order.append(idxs)
        out = [False] * len(urls)
        for idxs, res in zip(order, ray.get(refs)):
            for i, r in zip(idxs, res):
                out[i] = r
        return out

    def members(self) -> set[str]:
        return set().union(*ray.get([a.members.remote() for a in self.actors]))

    def size(self) -> int:
        return sum(ray.get([a.size.remote() for a in self.actors]))

    def checkpoint(self, dir_path: str) -> None:
        Path(dir_path).mkdir(parents=True, exist_ok=True)
        ray.get([
            a.dump.remote(str(Path(dir_path) / f"seen_shard_{i:04d}.pkl"))
            for i, a in enumerate(self.actors)
        ])

    def restore(self, dir_path: str) -> None:
        ray.get([
            a.restore.remote(str(Path(dir_path) / f"seen_shard_{i:04d}.pkl"))
            for i, a in enumerate(self.actors)
        ])


class SeenFilter:
    """map_batches callable: drop rows whose canonical url was already seen.

    Expects Arrow batches with `url` and `host` columns. Stateless per batch
    (the state lives in the shard actors), so it can run as cheap tasks."""

    def __init__(self, seen: SeenSet):
        self.seen = seen

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        hosts = batch["host"].to_pylist()
        fresh = self.seen.check_and_add(urls, hosts)
        return batch.filter(pa.array(fresh, type=pa.bool_()))
