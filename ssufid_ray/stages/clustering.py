"""Distributed k-means over the embedding column — the corpus-clustering
operator a training-data pipeline uses for mixture analysis / domain
discovery (and the building block ivf_topk's one-shot centroid training
generalizes into Lloyd iterations).

Scale design: per iteration the ONLY exchange is k rows of
(cluster, count, fixed-point coordinate sums) per input block — k·d int64s
— folded by a tiny groupby(cluster); centroids broadcast via ray.put once
per iteration. Data is re-streamed from the pruned 2-column read each
iteration (never materialized).

Determinism (run-, block-split- and worker-count-invariant, so the
registered rows-only query is stable):
  - coordinate sums accumulate in FIXED-POINT int64 (round(x * 2^24)):
    integer addition is order-independent, unlike float accumulation,
    so any batch composition folds to identical centroids.
  - distances use an explicit per-centroid loop: (X - C[j])^2 summed
    over the fixed axis d — per-row results never depend on how rows
    were batched (a single BLAS gemm's blocking could).
  - init is the k smallest vec_ids; ties in argmin take the first index.
Overflow bound: 2^24 scale × |x|≤~1 × rows-per-cluster < 2^63 holds to
~5·10^11 rows per cluster; beyond that, drop _FP or add a second fold
level. (Documented, not silently wrong: sums are checked per fold.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ssufid_ray.functions.emb import emb_matrix
from ssufid_ray.stages.relational import read

K_CLUSTERS = 8
KMEANS_ITERS = 5
_FP = 1 << 24  # fixed-point scale for order-independent integer folding


def _assign(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Nearest-centroid index per row, batch-composition-invariant."""
    n = X.shape[0]
    d2 = np.empty((n, C.shape[0]), dtype=np.float64)
    for j in range(C.shape[0]):
        diff = X - C[j]
        d2[:, j] = np.einsum("ij,ij->i", diff, diff)
    return d2.argmin(axis=1)


def _fold(rows: pd.DataFrame, k: int, d: int,
          prev: np.ndarray) -> np.ndarray:
    """Fold (cluster, cnt, sums) partials into new float64 centroids;
    clusters that received no points keep their previous centroid."""
    cents = prev.copy()
    for c, grp in rows.groupby("cluster"):
        cnt = int(grp["cnt"].sum())
        if cnt == 0:
            continue
        if cnt >= (1 << 38):  # 2^24 fp scale x 2^38 rows approaches 2^63
            raise OverflowError(
                "kmeans fixed-point fold bound exceeded; lower _FP or add "
                "a second fold level")
        s = np.zeros(d, dtype=np.int64)
        for arr in grp["sums"]:
            s += np.asarray(arr, dtype=np.int64)
        cents[int(c)] = s.astype(np.float64) / (_FP * cnt)
    return cents


def kmeans_clusters(sf_dir: str, k: int = K_CLUSTERS,
                    iters: int = KMEANS_ITERS) -> pd.DataFrame:
    """Lloyd's k-means over `embeddings.embedding`; returns the final
    (vec_id, cluster) assignment plus per-cluster sizes are derivable from
    it. Registered rows-only; tests pin it exactly equal to a sequential
    reference implementation with the same fixed-point contract."""
    # materialized once: the iterations re-stream object-store blocks
    # instead of re-reading parquet T+1 times
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()

    seeds = (ds.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], pa.scalar(k))),
        batch_format="pyarrow").to_pandas().sort_values("vec_id"))
    if len(seeds) != k:  # init contract: vec_ids are dense from 0
        raise ValueError(f"expected vec_ids 0..{k-1} for init, got {len(seeds)}")
    cents = np.array([np.asarray(v, dtype=np.float64)
                      for v in seeds["embedding"]])
    d = cents.shape[1]

    partial_schema = pa.schema([("cluster", pa.int32()),
                                ("cnt", pa.int64()),
                                ("sums", pa.list_(pa.int64()))])

    def make_partial(cref):
        def partial(t: pa.Table) -> pa.Table:
            X = emb_matrix(t["embedding"])
            C = ray.get(cref)
            a = _assign(X, C)
            Xq = np.round(X * _FP).astype(np.int64)
            rows = []
            for c in np.unique(a):
                sel = Xq[a == c]
                rows.append({"cluster": int(c), "cnt": int(sel.shape[0]),
                             "sums": sel.sum(axis=0).tolist()})
            return pa.Table.from_pylist(rows, schema=partial_schema)
        return partial

    def sum_group(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        s = np.zeros(d, dtype=np.int64)
        for arr in df["sums"]:
            s += np.asarray(arr, dtype=np.int64)
        return pa.Table.from_pylist(
            [{"cluster": int(df["cluster"].iloc[0]),
              "cnt": int(df["cnt"].sum()), "sums": s.tolist()}],
            schema=partial_schema)

    for _ in range(iters):
        cref = ray.put(cents)
        parts = (ds.map_batches(make_partial(cref), batch_format="pyarrow")
                 .groupby("cluster").map_groups(sum_group,
                                                batch_format="pyarrow")
                 .to_pandas())  # <= k rows
        cents = _fold(parts, k, d, cents)

    cref = ray.put(cents)

    def assign_batch(t: pa.Table) -> pa.Table:
        X = emb_matrix(t["embedding"])
        a = _assign(X, ray.get(cref))
        return pa.table({"vec_id": t["vec_id"],
                         "cluster": pa.array(a.astype(np.int64), pa.int64())})

    out = ds.map_batches(assign_batch, batch_format="pyarrow").to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def kmeans_reference(vecs: np.ndarray, k: int = K_CLUSTERS,
                     iters: int = KMEANS_ITERS) -> np.ndarray:
    """Sequential reference with the identical fixed-point contract (used
    by tests to pin the distributed result exactly)."""
    cents = vecs[:k].astype(np.float64).copy()
    Xq = np.round(vecs * _FP).astype(np.int64)
    for _ in range(iters):
        a = _assign(vecs, cents)
        for c in range(k):
            sel = Xq[a == c]
            if sel.shape[0]:
                cents[c] = sel.sum(axis=0).astype(np.float64) / (_FP * sel.shape[0])
    return _assign(vecs, cents)


# ----------------------- oversized-cluster sub-k-means (SemDeDup's guard)

_SUB_SHIFT = 20  # composite fold key = parent_code << 20 | sub (k_c < 2^20)

_REFINE_PART_SCHEMA = pa.schema([("key", pa.int64()),
                                 ("cnt", pa.int64()),
                                 ("sums", pa.list_(pa.int64()))])


def refine_oversized(sf_dir: str, vec_ids: np.ndarray, labels: np.ndarray,
                     cap: int, target: int, iters: int = 3,
                     max_depth: int = 3) -> np.ndarray:
    """Split every cluster larger than `cap` into ~size/target sub-clusters
    with the SAME deterministic fixed-point Lloyd contract as
    kmeans_clusters, repeated up to `max_depth` rounds — the
    giant-cluster guard SemDeDup needs so no within-cluster pairwise task
    ever materializes an unbounded group (Abbas et al. 2023 runs k in the
    10^4-10^5 range for exactly this reason).

    ALL oversized parents refine in ONE distributed pass per Lloyd
    iteration: the broadcast carries (sorted member ids, parent code per
    member, stacked per-parent centroids), each batch assigns only its
    member rows against their own parent's centroid slice, and the only
    exchange is (key, cnt, fixed-point sums) partials folded by a tiny
    groupby — k_total·d int64s, never embeddings. Seeds are each parent's
    k_c smallest vec_ids (subset analogue of kmeans_clusters' dense-id
    init), so the result is run/block/worker-invariant.

    A parent whose split makes no progress (all members land on one
    sub-centroid — e.g. identical vectors, which no k-means can separate)
    is frozen rather than re-split forever; callers bound the residual
    with a tiled pairwise (dedup.semdedup_pairs).

    `vec_ids` must be sorted ascending; returns refined labels aligned to
    it. Driver holds 2 ints per vector (the documented assignment bound;
    beyond broadcast range this becomes a co-partitioned int join)."""
    labels = labels.astype(np.int64).copy()
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    next_label = int(labels.max()) + 1 if labels.size else 0
    frozen: set[int] = set()

    for _ in range(max_depth):
        uniq, counts = np.unique(labels, return_counts=True)
        big = [(int(u), int(c)) for u, c in zip(uniq, counts)
               if c > cap and int(u) not in frozen]
        if not big:
            break
        parents = [u for u, _ in big]
        kcs = np.array([max(2, -(-c // target)) for _, c in big],
                       dtype=np.int64)
        if (kcs >= (1 << _SUB_SHIFT)).any():
            raise ValueError("refine_oversized: sub-k exceeds key width")
        offsets = np.concatenate([[0], np.cumsum(kcs)[:-1]])

        # member rows per parent + per-parent seed ids (k_c smallest)
        member_mask = np.isin(labels, parents)
        member_ids = vec_ids[member_mask]          # sorted (vec_ids sorted)
        parr = np.array(parents, dtype=np.int64)   # sorted (np.unique order)
        member_pcode = np.searchsorted(parr, labels[member_mask])
        seed_ids: list[np.ndarray] = []
        for i, p in enumerate(parents):
            ids_p = member_ids[member_pcode == i]
            seed_ids.append(ids_p[: int(kcs[i])])
        all_seeds = np.sort(np.concatenate(seed_ids))

        # ONE bounded gather for seed embeddings (sum k_c <= N/target rows)
        sref = ray.put(all_seeds)

        def pick_seeds(t: pa.Table) -> pa.Table:
            ss = ray.get(sref)
            vid = t["vec_id"].to_numpy(zero_copy_only=False)
            ix = np.searchsorted(ss, vid)
            ix[ix >= ss.size] = 0
            return t.filter(pa.array((ss[ix] == vid) if ss.size
                                     else np.zeros(len(vid), bool)))

        seeds = (ds.map_batches(pick_seeds, batch_format="pyarrow")
                 .to_pandas().sort_values("vec_id"))
        seed_vecs = {int(v): np.asarray(e, dtype=np.float64)
                     for v, e in zip(seeds["vec_id"], seeds["embedding"])}
        d = len(next(iter(seed_vecs.values())))
        C = np.vstack([np.vstack([seed_vecs[int(s)] for s in sids])
                       for sids in seed_ids])

        def make_partial(bref):
            def partial(t: pa.Table) -> pa.Table:
                mids, pcodes, offs, ks, cstack = ray.get(bref)
                vid = t["vec_id"].to_numpy(zero_copy_only=False)
                ix = np.searchsorted(mids, vid)
                ix[ix >= mids.size] = 0
                valid = (mids.size > 0) & (mids[ix] == vid)
                if not valid.any():
                    return _REFINE_PART_SCHEMA.empty_table()
                X = emb_matrix(t["embedding"])[valid]
                pc_ = pcodes[ix[valid]]
                Xq = np.round(X * _FP).astype(np.int64)
                rows = []
                for p in np.unique(pc_):
                    sel = pc_ == p
                    Cp = cstack[offs[p]: offs[p] + ks[p]]
                    a = _assign(X[sel], Cp)
                    Xs = Xq[sel]
                    for s in np.unique(a):
                        m = Xs[a == s]
                        rows.append({"key": int(p) << _SUB_SHIFT | int(s),
                                     "cnt": int(m.shape[0]),
                                     "sums": m.sum(axis=0).tolist()})
                return pa.Table.from_pylist(rows,
                                            schema=_REFINE_PART_SCHEMA)
            return partial

        def sum_group(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            s = np.zeros(d, dtype=np.int64)
            for arr in df["sums"]:
                s += np.asarray(arr, dtype=np.int64)
            return pa.Table.from_pylist(
                [{"key": int(df["key"].iloc[0]),
                  "cnt": int(df["cnt"].sum()), "sums": s.tolist()}],
                schema=_REFINE_PART_SCHEMA)

        for _i in range(iters):
            bref = ray.put((member_ids, member_pcode, offsets, kcs, C))
            parts = (ds.map_batches(make_partial(bref),
                                    batch_format="pyarrow")
                     .groupby("key").map_groups(sum_group,
                                                batch_format="pyarrow")
                     .to_pandas())  # <= sum k_c rows
            for _, r in parts.iterrows():
                cnt = int(r["cnt"])
                if cnt == 0:
                    continue
                if cnt >= (1 << 38):
                    raise OverflowError(
                        "refine_oversized fixed-point fold bound exceeded")
                key = int(r["key"])
                C[offsets[key >> _SUB_SHIFT] + (key & ((1 << _SUB_SHIFT) - 1))] = (
                    np.asarray(r["sums"], dtype=np.int64).astype(np.float64)
                    / (_FP * cnt))

        # final assignment pass: (vec_id, key) for member rows only
        bref = ray.put((member_ids, member_pcode, offsets, kcs, C))

        def assign_members(t: pa.Table) -> pa.Table:
            mids, pcodes, offs, ks, cstack = ray.get(bref)
            vid = t["vec_id"].to_numpy(zero_copy_only=False)
            ix = np.searchsorted(mids, vid)
            ix[ix >= mids.size] = 0
            valid = (mids.size > 0) & (mids[ix] == vid)
            if not valid.any():
                return pa.table({"vec_id": pa.array([], pa.int64()),
                                 "key": pa.array([], pa.int64())})
            X = emb_matrix(t["embedding"])[valid]
            pc_ = pcodes[ix[valid]]
            key = np.empty(X.shape[0], dtype=np.int64)
            for p in np.unique(pc_):
                sel = pc_ == p
                Cp = cstack[offs[p]: offs[p] + ks[p]]
                key[sel] = (int(p) << _SUB_SHIFT) | _assign(X[sel], Cp)
            return pa.table({"vec_id": pa.array(vid[valid], pa.int64()),
                             "key": pa.array(key, pa.int64())})

        adf = (ds.map_batches(assign_members, batch_format="pyarrow")
               .to_pandas())
        a_ids = adf["vec_id"].to_numpy().astype(np.int64)
        a_key = adf["key"].to_numpy().astype(np.int64)
        order = np.argsort(a_ids)
        a_ids, a_key = a_ids[order], a_key[order]

        # relabel: fresh label per realized (parent, sub), allocated in
        # sorted key order (deterministic); freeze parents that made no
        # progress (single realized child == parent size)
        pos = np.searchsorted(vec_ids, a_ids)
        realized = np.unique(a_key)
        fresh = np.arange(next_label, next_label + realized.size,
                          dtype=np.int64)
        next_label += realized.size
        labels[pos] = fresh[np.searchsorted(realized, a_key)]
        for i in range(len(parents)):
            child_keys = np.flatnonzero((realized >> _SUB_SHIFT) == i)
            if child_keys.size == 1:  # no progress: unsplittable parent
                frozen.add(int(fresh[child_keys[0]]))
    return labels
