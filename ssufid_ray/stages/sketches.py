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


# ------------------------------------------ SpaceSaving heavy hitters

SS_CAP = 128      # per-summary counter capacity (must exceed 1/phi)
SS_FANIN = 32     # bounded fan-in of the distributed summary merge
HH_PHI_NUM, HH_PHI_DEN = 2, 100  # threshold = ceil(2% of total tokens)

_SS_SCHEMA = pa.schema([("g", pa.int32()),
                        ("tokens", pa.list_(pa.string())),
                        ("cnts", pa.list_(pa.int64())),
                        ("bound", pa.int64()),
                        ("n", pa.int64())])


def _ss_truncate(counts: dict[str, int], bound: int,
                 n: int, g: int) -> pa.Table:
    """Keep the top-SS_CAP counters (count desc, token asc); any omitted
    key's count is <= the new bound, which the merge charges to absentees.
    Invariant: kept_count >= bound, so n >= SS_CAP * bound — omitted keys
    carry <= n/SS_CAP error, the SpaceSaving guarantee."""
    items = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    if len(items) > SS_CAP:
        bound = max(bound, items[SS_CAP][1])
        items = items[:SS_CAP]
    return pa.Table.from_pylist(
        [{"g": g, "tokens": [k for k, _ in items],
          "cnts": [int(v) for _, v in items],
          "bound": int(bound), "n": int(n)}], schema=_SS_SCHEMA)


def _ss_merge(df: pd.DataFrame, g: int, truncate: bool) -> pa.Table:
    """Merge summaries: present keys sum exactly; a key absent from one
    summary is charged that summary's bound (an upper bound on its count
    there), so merged counts stay upper bounds of true counts."""
    uppers: dict[str, int] = {}
    tot_bound, tot_n = 0, 0
    summaries = [(list(r.tokens), list(r.cnts), int(r.bound))
                 for r in df.itertuples()]
    for toks, cnts, bound in summaries:
        for k, v in zip(toks, cnts):
            uppers[k] = uppers.get(k, 0) + int(v)
        tot_bound += bound
    tot_n = int(df["n"].sum())
    for toks, cnts, bound in summaries:  # charge absentees this bound
        present = set(toks)
        for k in uppers:
            if k not in present:
                uppers[k] += bound
    if truncate:
        return _ss_truncate(uppers, tot_bound, tot_n, g)
    items = sorted(uppers.items(), key=lambda kv: (-kv[1], kv[0]))
    return pa.Table.from_pylist(
        [{"g": g, "tokens": [k for k, _ in items],
          "cnts": [int(v) for _, v in items],
          "bound": int(tot_bound), "n": tot_n}], schema=_SS_SCHEMA)


def heavy_hitters(sf_dir: str) -> pd.DataFrame:
    """Exact frequent tokens (count >= ceil(2% of all tokens)) found the
    scale way: a mergeable SpaceSaving sketch pass yields a GUARANTEED
    candidate superset (any token with frequency > n/SS_CAP survives
    per-summary truncation, and 2% > 1/SS_CAP) without ever shuffling the
    token domain; a second pass exact-counts ONLY the bounded candidate
    set (broadcast, per-batch partials, tiny groupby). Output is exact ->
    deterministic and SQL-oracled; the sketch internals only affect how
    much the verify pass over-checks. Token contract: text.split() ==
    regexp_split_to_array '\\s+' after trim (the top_tokens contract)."""
    from collections import Counter

    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", ["doc_id", "text"]).materialize()

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "text" not in t.column_names:
            return _SS_SCHEMA.empty_table()
        c: Counter = Counter()
        for text in t["text"].to_pylist():
            c.update(text.split())
        n = sum(c.values())
        # fan-in key: HASH of a batch-varying value (first doc_id).
        # A content key degenerates (the corpus-wide min token is the same
        # in every batch) and a raw `id % FANIN` degenerates too — batch
        # boundaries align to power-of-two sizes, making every first id
        # congruent mod FANIN. Hashing breaks the alignment.
        first = str(t["doc_id"][0].as_py()).encode()
        g = int.from_bytes(hashlib.blake2b(first, digest_size=2).digest(),
                           "little") % SS_FANIN
        return _ss_truncate(dict(c), 0, n, g)

    def merge_group(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "tokens" not in t.column_names:
            return _SS_SCHEMA.empty_table()
        df = t.to_pandas()
        return _ss_merge(df, int(df["g"].iloc[0]), truncate=True)

    final = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("g").map_groups(merge_group, batch_format="pyarrow")
             .to_pandas())  # bounded: <= SS_FANIN rows of <= SS_CAP counters
    merged = _ss_merge(final, 0, truncate=False).to_pylist()[0]
    total = merged["n"]
    thresh = (HH_PHI_NUM * total + HH_PHI_DEN - 1) // HH_PHI_DEN
    cands = sorted(k for k, u in zip(merged["tokens"], merged["cnts"])
                   if u >= thresh)
    if not cands:
        return pd.DataFrame({"token": pd.Series(dtype="object"),
                             "n": pd.Series(dtype="int64")})
    cref = ray.put(set(cands))

    def exact_partial(t: pa.Table) -> pa.Table:
        want = ray.get(cref)
        c: Counter = Counter()
        for text in t["text"].to_pylist():
            c.update(tok for tok in text.split() if tok in want)
        return pa.table({"token": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array([int(v) for v in c.values()], pa.int64())})

    out = (ds.map_batches(exact_partial, batch_format="pyarrow")
           .groupby("token").aggregate(Sum("n", alias_name="n")).to_pandas())
    out["n"] = out["n"].astype("int64")
    out = out[out["n"] >= thresh]
    return out.sort_values("token").reset_index(drop=True)


HEAVY_HITTERS_SQL = f"""
WITH t AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents
), tt AS (SELECT token FROM t WHERE token <> ''),
tot AS (SELECT COUNT(*) AS n_total FROM tt)
SELECT token, COUNT(*) AS n
FROM tt, tot
GROUP BY token, n_total
HAVING COUNT(*) >= ({HH_PHI_NUM} * n_total + {HH_PHI_DEN - 1}) // {HH_PHI_DEN}
ORDER BY token
"""


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


# ------------------------------------------------- count-min sketch

CM_DEPTH = 4
CM_WIDTH = 2048
CM_PROBE_DOC = 0  # probe token set = distinct tokens of this document


def _cm_slots(tokens: list[str]) -> np.ndarray:
    """(len(tokens), CM_DEPTH) int64 slot matrix; row d's hash is a
    seeded blake2b — stable across processes (never Python hash())."""
    out = np.empty((len(tokens), CM_DEPTH), dtype=np.int64)
    for i, tok in enumerate(tokens):
        for d in range(CM_DEPTH):
            h = hashlib.blake2b(tok.encode("utf-8"), digest_size=8,
                                salt=bytes([d]) * 8).digest()
            out[i, d] = int.from_bytes(h, "little") % CM_WIDTH
    return out


def countmin_tokens(sf_dir: str) -> pd.DataFrame:
    """Count-min sketch over the corpus token stream (Cormode &
    Muthukrishnan '05), probed at a deterministic token set (the distinct
    tokens of doc CM_PROBE_DOC): (token, est_count) with the classic
    one-sided guarantee est >= exact, est <= exact + 2N/width w.h.p. —
    bounds pinned by a unit test against exact counts.

    Mergeable-sketch shape (the HLL contract): each batch folds its
    tokens into a local depth x width int64 grid and emits only the
    NONZERO cells as (packed d*width+slot, count) int rows; one
    single-key groupby sums cells, and the driver collects exactly
    depth*width bounded rows — never the token stream."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        grid = np.zeros((CM_DEPTH, CM_WIDTH), dtype=np.int64)
        from collections import Counter
        c: Counter = Counter()
        for text in t["text"].to_pylist():
            c.update(text.split())
        toks = list(c.keys())
        if toks:
            slots = _cm_slots(toks)
            cnts = np.fromiter(c.values(), dtype=np.int64, count=len(toks))
            for d in range(CM_DEPTH):
                np.add.at(grid[d], slots[:, d], cnts)
        dd, ss = np.nonzero(grid)
        return pa.table({"k": pa.array(dd * CM_WIDTH + ss, pa.int64()),
                         "c": pa.array(grid[dd, ss], pa.int64())})

    cells = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("k").aggregate(Sum("c", alias_name="c"))
             .to_pandas())  # bounded: <= CM_DEPTH * CM_WIDTH rows
    grid = np.zeros(CM_DEPTH * CM_WIDTH, dtype=np.int64)
    grid[cells["k"].to_numpy()] = cells["c"].to_numpy()
    grid = grid.reshape(CM_DEPTH, CM_WIDTH)

    probe_txt = (ds.filter(expr=f"doc_id == {CM_PROBE_DOC}")
                 .to_pandas()["text"].iloc[0])
    probe = sorted(set(probe_txt.split()))
    slots = _cm_slots(probe)
    est = np.min(grid[np.arange(CM_DEPTH)[None, :], slots], axis=1)
    return pd.DataFrame({"token": pd.Series(probe, dtype="object"),
                         "est_count": pd.Series(est, dtype="int64")})


# -------------------------------------------- HLL per group (sketch fold)

_GHLL_SCHEMA = pa.schema([("event_type", pa.string()),
                          ("gb", pa.int32()),
                          ("regs", pa.binary())])


def group_hll_distinct(sf_dir: str) -> pd.DataFrame:
    """Per-group approximate COUNT(DISTINCT user_id): one HLL per
    event_type. Each batch emits ONE 4 KB register blob per type it saw;
    blobs max-merge through a two-level fold (sub-bucketed first level so
    no single merge task ever sees more than its bucket's blobs, then a
    per-type final merge+estimate) — the same tree shape as the global
    hll_distinct, keyed. Deterministic (seeded stable hash); rows-only
    for the driver, accuracy-bounded vs exact in tests."""
    from ssufid_ray.stages.relational import read as _read

    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    import itertools as _it

    gb_counter = _it.count()  # merge sub-bucket: max-merge is assignment-
    # invariant, so a cheap cycling counter spreads blobs across the fan-in
    # as well as hashing the 4KB register blob did, at zero cost

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "event_type" not in t.column_names:
            return _GHLL_SCHEMA.empty_table()
        # group by sorting DICTIONARY CODES (int argsort + run bounds):
        # key strings stay in Arrow — only the <=|distinct types| dictionary
        # values ever decode to Python, not one string per row
        enc = t["event_type"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        types_ = enc.dictionary.to_pylist()
        v = t["user_id"].to_pylist()
        order = np.argsort(codes, kind="stable")
        cs = codes[order]
        bounds = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        rows = []
        for i, s in enumerate(bounds):
            e = bounds[i + 1] if i + 1 < len(bounds) else len(cs)
            regs = _hll_registers([str(v[j]) for j in order[s:e]])
            rows.append({"event_type": str(types_[cs[s]]),
                         "gb": next(gb_counter) % HLL_FANIN,
                         "regs": regs.tobytes()})
        return pa.Table.from_pylist(rows, schema=_GHLL_SCHEMA)

    def merge_sub(t: pa.Table) -> pa.Table:
        if "regs" not in t.column_names or len(t) == 0:
            return _GHLL_SCHEMA.empty_table()
        merged = np.zeros(1 << HLL_P, dtype=np.uint8)
        for b in t["regs"].to_pylist():
            np.maximum(merged, np.frombuffer(b, dtype=np.uint8), out=merged)
        return pa.Table.from_pylist(
            [{"event_type": t["event_type"][0].as_py(), "gb": 0,
              "regs": merged.tobytes()}], schema=_GHLL_SCHEMA)

    out_schema = pa.schema([("event_type", pa.string()),
                            ("n_users_est", pa.int64())])

    def merge_final(t: pa.Table) -> pa.Table:
        if "regs" not in t.column_names or len(t) == 0:
            return out_schema.empty_table()
        merged = np.zeros(1 << HLL_P, dtype=np.uint8)
        for b in t["regs"].to_pylist():
            np.maximum(merged, np.frombuffer(b, dtype=np.uint8), out=merged)
        return pa.table({"event_type": pa.array([t["event_type"][0].as_py()]),
                         "n_users_est": pa.array(
                             [round(_hll_estimate(merged))], pa.int64())})

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["event_type", "gb"])
           .map_groups(merge_sub, batch_format="pyarrow")
           .groupby("event_type")
           .map_groups(merge_final, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("event_type").reset_index(drop=True)
