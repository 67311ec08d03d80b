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
