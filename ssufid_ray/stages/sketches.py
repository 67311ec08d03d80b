"""Mergeable sketches (ray_guide §aggregation-at-scale: emit one serialized
sketch per batch, merge in a tiny second stage).

HyperLogLog (Flajolet et al. '07) for approximate distinct counts: each
map_batches task emits its register array; registers max-merge associatively,
so the shuffle carries 2^p bytes per block instead of the value set. Hashing
is seeded/stable -> the estimate is deterministic (rows-only driver check);
the unit test bounds the error against the exact count."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ssufid_ray.stages.relational import read

HLL_P = 12  # 4096 registers, ~1.6% standard error


def _hll_registers(values: list[str], p: int = HLL_P) -> np.ndarray:
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    for v in values:
        h = int.from_bytes(hashlib.blake2b(v.encode("utf-8"), digest_size=8).digest(),
                           "little")
        idx = h & (m - 1)
        w = h >> p
        # rank = leading-zero count of the remaining 64-p bits, +1
        rank = (64 - p) - w.bit_length() + 1
        if rank > regs[idx]:
            regs[idx] = rank
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = float(len(regs))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # small-range correction
    return float(est)


HLL_FANIN = 64  # width of the distributed merge level


def hll_distinct(ds: ray.data.Dataset, column: str) -> int:
    """Approximate COUNT(DISTINCT column) via per-batch HLL partials,
    folded with a two-level merge: per-block register blobs max-merge in a
    distributed groupby level first, so the driver sees at most HLL_FANIN
    blobs no matter how many blocks the input has (max-merge is
    associative + commutative, so the grouping is estimate-neutral)."""

    def partial(t: pa.Table) -> pa.Table:
        regs = _hll_registers([str(v) for v in t[column].to_pylist()])
        g = int.from_bytes(
            hashlib.blake2b(regs.tobytes(), digest_size=2).digest(),
            "little") % HLL_FANIN
        return pa.table({"g": pa.array([g], pa.int32()),
                         "regs": pa.array([regs.tobytes()], pa.binary())})

    empty = pa.table({"regs": pa.array([], pa.binary())})

    def merge_group(t: pa.Table) -> pa.Table:
        if "regs" not in t.column_names or len(t) == 0:
            return empty
        merged = np.zeros(1 << HLL_P, dtype=np.uint8)
        for b in t["regs"].to_pylist():
            np.maximum(merged, np.frombuffer(b, dtype=np.uint8), out=merged)
        return pa.table({"regs": pa.array([merged.tobytes()], pa.binary())})

    blobs = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("g").map_groups(merge_group, batch_format="pyarrow")
             .take_all())  # bounded: <= HLL_FANIN rows
    merged = np.zeros(1 << HLL_P, dtype=np.uint8)
    for b in blobs:
        merged = np.maximum(merged, np.frombuffer(b["regs"], dtype=np.uint8))
    return round(_hll_estimate(merged))


def hll_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Rows-only query: HLL distinct estimates for a few columns (stable
    output; accuracy asserted in tests against exact counts)."""
    rows = []
    for table, col in (("events", "user_id"), ("documents", "text"),
                       ("lineitem", "l_orderkey")):
        ds = read(sf_dir, table, [col])
        rows.append({"table": table, "column": col,
                     "distinct_estimate": hll_distinct(ds, col)})
    return pd.DataFrame(rows).sort_values(["table", "column"]).reset_index(drop=True)
