"""Similarity search over the embedding column: brute-force cosine top-k
baseline and an IVF-bucketed variant (the scale path).

Brute force: the query matrix is broadcast once (ray.put); each batch does
one float64 matmul against it and emits its partial top-k; a final per-query
group merge picks the global top-k. No full shuffle of the corpus.

IVF: k-means-lite centroids (deterministic seeded init, few iterations)
assign each vector a cluster id; a query probes the nprobe nearest
centroids' buckets only. With nprobe == n_clusters the result is exact and
shares the brute-force oracle; smaller nprobe trades recall for scanning
1/n_clusters of the corpus per probe — that is the 100 TB path, where
cluster id becomes the parquet partition key and probing prunes whole
files at the read.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

N_QUERIES = 5
TOP_K = 5


def _load_embeddings(sf_dir: str):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return ids, m


def brute_force_topk(sf_dir: str, k: int = TOP_K) -> pd.DataFrame:
    """For each query (vec_id < N_QUERIES), the top-k most cosine-similar
    corpus vectors (vec_id >= N_QUERIES). Output ranks only (floats never
    cross the oracle boundary). Ties broken by vec_id asc."""
    ids, m = _load_embeddings(sf_dir)
    qmask = ids < N_QUERIES
    q_ids, q = ids[qmask], m[qmask]
    ref = ray.put((q_ids, q))

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        qi, qm = ray.get(ref)
        vid = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
        mask = vid >= N_QUERIES
        vid = vid[mask]
        if vid.size == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)[mask]
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        sims = qm @ mat.T  # (Q, B)
        rows = {"query_id": [], "neighbor_id": [], "sim": []}
        kk = min(k, vid.size)
        for qidx in range(len(qi)):
            # partial top-k inside the batch: top by (sim desc, vec_id asc)
            order = np.lexsort((vid, -sims[qidx]))[:kk]
            rows["query_id"].extend([int(qi[qidx])] * len(order))
            rows["neighbor_id"].extend(int(v) for v in vid[order])
            rows["sim"].extend(float(s) for s in sims[qidx][order])
        return pa.table({"query_id": pa.array(rows["query_id"], pa.int64()),
                         "neighbor_id": pa.array(rows["neighbor_id"], pa.int64()),
                         "sim": pa.array(rows["sim"], pa.float64())})

    def final_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["sim", "neighbor_id"],
                                       ascending=[False, True]).head(k)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return pa.Table.from_pandas(df[["query_id", "neighbor_id", "rank"]],
                                    preserve_index=False)

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("query_id").map_groups(final_topk, batch_format="pyarrow")
           .to_pandas())
    out["rank"] = out["rank"].astype("int64")
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


BRUTE_FORCE_TOPK_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES}),
     c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= {N_QUERIES}),
     s AS (SELECT q.query_id, c.vec_id AS neighbor_id,
                  list_cosine_similarity(q.qe, c.embedding) AS sim
           FROM q CROSS JOIN c)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM s
) WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


# ------------------------------------------------------------------ IVF

N_CLUSTERS = 8
KMEANS_ITERS = 5


def _kmeans(m: np.ndarray, n_clusters: int, iters: int, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    centroids = m[rng.choice(len(m), size=n_clusters, replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ centroids.T, axis=1)
        for c in range(n_clusters):
            members = m[assign == c]
            if len(members):
                v = members.mean(axis=0)
                centroids[c] = v / (np.linalg.norm(v) or 1.0)
    return centroids


def ivf_topk(sf_dir: str, k: int = TOP_K, nprobe: int = N_CLUSTERS) -> pd.DataFrame:
    """IVF search. nprobe == N_CLUSTERS -> exact (same oracle as brute
    force); the default registers the exact configuration so correctness is
    checkable, while the nprobe<N_CLUSTERS path is benchmarked separately."""
    ids, m = _load_embeddings(sf_dir)
    corpus_mask = ids >= N_QUERIES
    c_ids, cm = ids[corpus_mask], m[corpus_mask]
    q_ids, qm = ids[~corpus_mask], m[~corpus_mask]
    centroids = _kmeans(cm, N_CLUSTERS, KMEANS_ITERS)
    assign = np.argmax(cm @ centroids.T, axis=1)
    buckets = {c: (c_ids[assign == c], cm[assign == c]) for c in range(N_CLUSTERS)}
    bref = ray.put(buckets)

    probe_rows = []
    for qi, qv in zip(q_ids, qm):
        order = np.argsort(-(centroids @ qv))[:nprobe]
        for c in order:
            probe_rows.append({"query_id": int(qi), "cluster": int(c)})
    ds = ray.data.from_items(probe_rows)
    qref = ray.put({int(i): v for i, v in zip(q_ids, qm)})

    def scan_bucket(t: pa.Table) -> pa.Table:
        bk = ray.get(bref)
        qs = ray.get(qref)
        rows = {"query_id": [], "neighbor_id": [], "sim": []}
        for qid, c in zip(t["query_id"].to_pylist(), t["cluster"].to_pylist()):
            vid, mat = bk[c]
            if len(vid) == 0:
                continue
            sims = mat @ qs[qid]
            order = np.lexsort((vid, -sims))[: min(k, len(vid))]
            rows["query_id"].extend([qid] * len(order))
            rows["neighbor_id"].extend(int(v) for v in vid[order])
            rows["sim"].extend(float(s) for s in sims[order])
        return pa.table({"query_id": pa.array(rows["query_id"], pa.int64()),
                         "neighbor_id": pa.array(rows["neighbor_id"], pa.int64()),
                         "sim": pa.array(rows["sim"], pa.float64())})

    def final_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["sim", "neighbor_id"],
                                       ascending=[False, True]).head(k)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return pa.Table.from_pandas(df[["query_id", "neighbor_id", "rank"]],
                                    preserve_index=False)

    out = (ds.map_batches(scan_bucket, batch_format="pyarrow")
           .groupby("query_id").map_groups(final_topk, batch_format="pyarrow")
           .to_pandas())
    out["rank"] = out["rank"].astype("int64")
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)
