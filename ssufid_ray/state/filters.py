"""Probabilistic membership structures for the URL-seen set.

The north-rule layout (SURVEY §2.9): a bloom filter front (fast negative
path, sized for a target false-positive rate) backed by an exact cuckoo
filter + Python set (no false positives on the positive path). The
reference's seen-set is an in-memory IndexMap per board
(/root/reference/packages/ssufid/src/core/mod.rs:336-385); at 10^10-URL
frontier scale that becomes a sharded structure — one (bloom, cuckoo) pair
per host-hash shard, held by a shard actor (ssufid_ray.state.seen).

numpy-backed; hashes are stable across processes (blake2b), required for
checkpoint/resume equality.
"""

from __future__ import annotations

import hashlib

import numpy as np


def _h128(key: str) -> tuple[int, int]:
    d = hashlib.blake2b(key.encode("utf-8"), digest_size=16).digest()
    return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little")


class BloomFilter:
    """Standard bloom filter, double hashing (Kirsch–Mitzenmacher)."""

    def __init__(self, capacity: int, fpp: float = 0.01):
        self.capacity = capacity
        self.fpp = fpp
        # m = -n ln p / (ln 2)^2 ; k = m/n ln 2
        m = max(64, int(-capacity * np.log(fpp) / (np.log(2) ** 2)))
        self.num_bits = int(2 ** np.ceil(np.log2(m)))  # power of two -> mask
        self.num_hashes = max(1, int(round(self.num_bits / capacity * np.log(2))))
        self.bits = np.zeros(self.num_bits // 8, dtype=np.uint8)
        self._mask = self.num_bits - 1

    def _positions(self, key: str) -> np.ndarray:
        h1, h2 = _h128(key)
        i = np.arange(self.num_hashes, dtype=np.uint64)
        return (np.uint64(h1) + i * np.uint64(h2)) & np.uint64(self._mask)

    def add(self, key: str) -> None:
        pos = self._positions(key)
        np.bitwise_or.at(self.bits, (pos >> np.uint64(3)).astype(np.int64),
                         (1 << (pos & np.uint64(7))).astype(np.uint8))

    def add_batch(self, keys: list[str]) -> None:
        """Vectorized add: one (n x k) position matrix, one scatter-or.
        Bit-identical to n scalar add() calls (same double-hash positions,
        uint64 wraparound semantics preserved) — the per-key numpy
        small-array overhead is what it removes (~10x on the seen-shard
        insert path)."""
        if not keys:
            return
        h = np.array([_h128(k) for k in keys], dtype=np.uint64)
        i = np.arange(self.num_hashes, dtype=np.uint64)
        pos = (h[:, 0:1] + i[None, :] * h[:, 1:2]) & np.uint64(self._mask)
        flat = pos.ravel()
        np.bitwise_or.at(self.bits, (flat >> np.uint64(3)).astype(np.int64),
                         (1 << (flat & np.uint64(7))).astype(np.uint8))

    def __contains__(self, key: str) -> bool:
        pos = self._positions(key)
        byte = self.bits[(pos >> np.uint64(3)).astype(np.int64)]
        bit = (1 << (pos & np.uint64(7))).astype(np.uint8)
        return bool(np.all(byte & bit))

    # -- checkpointing -----------------------------------------------------
    def dump(self) -> dict:
        return {
            "capacity": self.capacity,
            "fpp": self.fpp,
            "bits": self.bits.tobytes(),
        }

    @classmethod
    def load(cls, state: dict) -> "BloomFilter":
        bf = cls(state["capacity"], state["fpp"])
        bf.bits = np.frombuffer(state["bits"], dtype=np.uint8).copy()
        return bf


class CuckooFilter:
    """Cuckoo filter (Fan et al., CoNEXT'14): 4-slot buckets, 16-bit
    fingerprints, partial-key cuckoo hashing. Supports delete (bloom does
    not), bounded memory, ~95% load factor.

    Used as the exact-ish backing tier behind the bloom front; the shard
    actor additionally keeps the true set for zero-false-positive answers —
    the cuckoo filter is the structure that would remain at 10^10 scale when
    the exact set no longer fits in RAM.
    """

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int, seed: int = 0):
        n_buckets = int(2 ** np.ceil(np.log2(max(16, capacity // self.SLOTS))))
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        self.size = 0
        self.seed = seed
        self._rng = np.random.default_rng(seed)  # deterministic kick order

    def _fp_and_index(self, key: str) -> tuple[int, int]:
        h1, h2 = _h128(key)
        fp = (h2 & 0xFFFF) or 1  # 0 means empty slot
        return fp, h1 & (self.n_buckets - 1)

    def _alt_index(self, i: int, fp: int) -> int:
        # partial-key hashing: i2 = i xor hash(fp)
        d = hashlib.blake2b(fp.to_bytes(2, "little"), digest_size=8).digest()
        return (i ^ int.from_bytes(d, "little")) & (self.n_buckets - 1)

    def add(self, key: str) -> bool:
        fp, i1 = self._fp_and_index(key)
        i2 = self._alt_index(i1, fp)
        for i in (i1, i2):
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.size += 1
                return True
        # kick loop
        i = i1 if self._rng.integers(2) else i2
        for _ in range(self.MAX_KICKS):
            slot = int(self._rng.integers(self.SLOTS))
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = self._alt_index(i, fp)
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.size += 1
                return True
        return False  # table full — caller should resize/shard-split

    def __contains__(self, key: str) -> bool:
        fp, i1 = self._fp_and_index(key)
        i2 = self._alt_index(i1, fp)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def delete(self, key: str) -> bool:
        fp, i1 = self._fp_and_index(key)
        for i in (i1, self._alt_index(i1, fp)):
            hit = np.flatnonzero(self.table[i] == fp)
            if hit.size:
                self.table[i, hit[0]] = 0
                self.size -= 1
                return True
        return False

    def dump(self) -> dict:
        return {
            "n_buckets": self.n_buckets,
            "table": self.table.tobytes(),
            "size": self.size,
            "seed": self.seed,
        }

    @classmethod
    def load(cls, state: dict) -> "CuckooFilter":
        cf = cls(state["n_buckets"] * cls.SLOTS, seed=state["seed"])
        cf.table = (
            np.frombuffer(state["table"], dtype=np.uint16)
            .reshape(state["n_buckets"], cls.SLOTS)
            .copy()
        )
        cf.size = state["size"]
        return cf
