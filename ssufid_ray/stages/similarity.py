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
import pyarrow.compute as pc
import ray
import ray.data

from ssufid_ray.functions.emb import emb_matrix

N_QUERIES = 5
TOP_K = 5


def _load_queries(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Pull ONLY the bounded query set (vec_id < N_QUERIES) to the driver;
    the corpus matrix never leaves the streamed read."""
    qdf = (ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])
           .map_batches(lambda t: t.filter(
               pc.less(t["vec_id"], pa.scalar(N_QUERIES))),
               batch_format="pyarrow")
           .to_pandas())
    q_ids = qdf["vec_id"].to_numpy()
    qm = np.array(qdf["embedding"].to_list(), dtype=np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    return q_ids, qm


def brute_force_topk(sf_dir: str, k: int = TOP_K) -> pd.DataFrame:
    """For each query (vec_id < N_QUERIES), the top-k most cosine-similar
    corpus vectors (vec_id >= N_QUERIES). Output ranks only (floats never
    cross the oracle boundary). Ties broken by vec_id asc."""
    q_ids, q = _load_queries(sf_dir)
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
        mat = emb_matrix(t["embedding"])[mask]
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


TRAIN_SAMPLE = 4096  # centroid-training sample size (driver holds ONLY this)


IVF_INDEX_ROOT_ENV = "SSUFID_IVF_ROOT"


def _ivf_index_dir(sf_dir: str, variant: str = "") -> str:
    """Index location. MUST be on storage every node can read/write on a
    multi-node cluster (set SSUFID_IVF_ROOT to a shared filesystem / object
    store mount); the /tmp default is single-node only, and build/probe
    refuse to run multi-node without an explicit root — a node-local index
    written by distributed tasks would be silently incomplete from the
    driver's view."""
    import hashlib as _hl
    import os
    from pathlib import Path

    root = os.environ.get(IVF_INDEX_ROOT_ENV)
    if root is None:
        alive = [n for n in ray.nodes() if n.get("Alive")]
        if len(alive) > 1:
            raise RuntimeError(
                "IVF index root defaults to node-local /tmp, which is "
                "incorrect on a multi-node cluster: set "
                f"{IVF_INDEX_ROOT_ENV} to a shared filesystem path")
        root = "/tmp/ssufid_ivf"
    # content component (size + mtime) so a regenerated embeddings table at
    # the same path invalidates the cached index instead of silently
    # serving stale clusters
    src = Path(sf_dir) / "embeddings.parquet"
    st = src.stat()
    key = _hl.blake2b(
        f"{sf_dir}|{st.st_size}|{st.st_mtime_ns}|{N_CLUSTERS}|{KMEANS_ITERS}"
        f"|{N_QUERIES}|{variant}|v2".encode(),
        digest_size=8).hexdigest()
    return str(Path(root) / key)


def build_ivf_index(sf_dir: str, exclude_mod_rem: tuple[int, int] | None = None,
                    variant: str = "") -> tuple[str, np.ndarray]:
    """Build (or reuse) the cluster-partitioned parquet index:
    one directory per cluster id, so probing prunes whole files at the
    read. Centroids train on a bounded deterministic sample (ds.limit) —
    the driver never holds the corpus matrix. Resumable: keyed cache dir
    with a _DONE marker; a build that crashed mid-write left partition
    files but no _DONE, so we discard the partial dir and rebuild into a
    temp dir that is renamed into place only when complete — appending a
    second write_parquet into a half-written index would double rows and
    surface duplicate neighbors in top-k."""
    import shutil
    from pathlib import Path

    idx_dir = _ivf_index_dir(sf_dir, variant)
    done = Path(idx_dir) / "_DONE"
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    def corpus_only(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["vec_id"], pa.scalar(N_QUERIES)))
        if exclude_mod_rem is not None:  # day slices held out for append
            mod, rem = exclude_mod_rem  # rem: one remainder or a tuple
            vid = t["vec_id"].to_numpy(zero_copy_only=False)
            rems = np.atleast_1d(np.asarray(rem, dtype=np.int64))
            t = t.filter(pa.array(~np.isin(vid % mod, rems)))
        return t

    corpus = ds.map_batches(corpus_only, batch_format="pyarrow")

    if done.exists():
        centroids = np.load(str(Path(idx_dir) / "centroids.npy"))
        return idx_dir, centroids
    if Path(idx_dir).exists():  # partial build from a crashed run
        shutil.rmtree(idx_dir)
    build_dir = idx_dir + ".building"
    if Path(build_dir).exists():
        shutil.rmtree(build_dir)

    sample = corpus.limit(TRAIN_SAMPLE).to_pandas()
    sm = np.array(sample["embedding"].to_list(), dtype=np.float64)
    sm /= np.linalg.norm(sm, axis=1, keepdims=True)
    centroids = _kmeans(sm, N_CLUSTERS, KMEANS_ITERS)
    cref = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        cen = ray.get(cref)
        m = emb_matrix(t["embedding"])
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        cl = np.argmax(m @ cen.T, axis=1).astype(np.int64)
        return pa.table({"vec_id": t["vec_id"], "cluster": pa.array(cl),
                         "embedding": pa.array(list(m))})

    (corpus.map_batches(assign, batch_format="pyarrow")
     .write_parquet(build_dir, partition_cols=["cluster"]))
    np.save(str(Path(build_dir) / "centroids.npy"), centroids)
    Path(build_dir).rename(idx_dir)  # atomic publish, then mark complete
    done.touch()
    return idx_dir, centroids


def ivf_topk(sf_dir: str, k: int = TOP_K, nprobe: int = N_CLUSTERS) -> pd.DataFrame:
    """IVF search over the cluster-partitioned index: probing reads ONLY
    the probed clusters' parquet partitions (file pruning at the read —
    the 100 TB path), streams them with the broadcast query set, and
    merges per-query partial top-k. nprobe == N_CLUSTERS -> exact (same
    oracle as brute force); smaller nprobe scans nprobe/N_CLUSTERS of the
    corpus per query."""
    idx_dir, centroids = build_ivf_index(sf_dir)
    return _ivf_search(sf_dir, idx_dir, centroids, k, nprobe)


def _ivf_search(sf_dir: str, idx_dir: str, centroids: np.ndarray,
                k: int = TOP_K, nprobe: int = N_CLUSTERS) -> pd.DataFrame:
    """The probe/scan/merge half of ivf_topk, shared with the appended
    index path (ivf_append_topk) — searches whatever partition files are
    in idx_dir, base build and appends alike."""
    from pathlib import Path

    from ssufid_ray import storage as _st

    # a crash mid-compaction must never surface duplicate/missing parts
    _st.repair_compaction(idx_dir, "cluster=*")

    # queries: a bounded head of the table (vec_id < N_QUERIES)
    q_ids, qm = _load_queries(sf_dir)

    # per-cluster probe sets: which queries probe which cluster
    probes: dict[int, list[int]] = {}
    for qi, qv in zip(q_ids, qm):
        for c in np.argsort(-(centroids @ qv))[:nprobe]:
            probes.setdefault(int(c), []).append(int(qi))
    qref = ray.put({int(i): v for i, v in zip(q_ids, qm)})

    # ONE pruned read over exactly the probed partition dirs — unprobed
    # partitions never leave storage. include_paths recovers the cluster id
    # per batch so each batch scans only the queries probing its cluster.
    probed_dirs = sorted(
        str(f) for c in sorted(probes)
        for f in Path(f"{idx_dir}/cluster={c}").glob("*.parquet")
        if Path(f"{idx_dir}/cluster={c}").exists())
    pref = ray.put({c: tuple(q) for c, q in probes.items()})
    cds = ray.data.read_parquet(probed_dirs, columns=["vec_id", "embedding"],
                                include_paths=True)

    import re as _re

    def scan(t: pa.Table) -> pa.Table:
        qs = ray.get(qref)
        pmap = ray.get(pref)
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "sim": pa.array([], pa.float64())})
        all_vid = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        if all_vid.size == 0:
            return empty
        # a batch may coalesce files from several clusters: scan per cluster
        clusters = np.array([int(_re.search(r"cluster=(\d+)", p).group(1))
                             for p in t["path"].to_pylist()], dtype=np.int64)
        all_mat = emb_matrix(t["embedding"])
        rows = {"query_id": [], "neighbor_id": [], "sim": []}
        for cluster in np.unique(clusters):
            sel = clusters == cluster
            vid, mat = all_vid[sel], all_mat[sel]
            for qid in pmap.get(int(cluster), ()):
                sims = mat @ qs[qid]
                order = np.lexsort((vid, -sims))[: min(k, vid.size)]
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

    out = (cds.map_batches(scan, batch_format="pyarrow")
           .groupby("query_id").map_groups(final_topk, batch_format="pyarrow")
           .to_pandas())
    out["rank"] = out["rank"].astype("int64")
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


# ----------------------------------------------- IVF incremental append

IVF_APPEND_MOD = 10
IVF_APPEND_REM = 7  # corpus vec_id % 10 == 7 plays "today's new vectors"
IVF_COMPACT_AFTER = 4  # parts per cluster dir before day-parts compact


def append_ivf_vectors(sf_dir: str, idx_dir: str, centroids: np.ndarray,
                       mod_rem: tuple[int, int], tag: str) -> None:
    """Append a new vector slice to a PERSISTED IVF index without
    retraining: assign to the EXISTING centroids (standard IVF add — the
    coarse quantizer is frozen between refreshes) and write one parquet
    part per touched cluster into the index's partition dirs, atomic per
    file (dot-tmp + rename via storage.write_table) with a _APPEND_<tag>
    marker committed last. Idempotent: a re-run with the same tag skips
    on the marker; a crash mid-append leaves no marker and the re-run
    overwrites the same deterministic file names. Probes pick appended
    parts up automatically (they glob the cluster dirs). This closes the
    similarity index's daily loop the same way incremental.py's
    fingerprint append closes dedup's (reference cache-then-merge,
    core/mod.rs:269-311, applied to the ANN index)."""
    from pathlib import Path

    from ssufid_ray import storage as _st

    marker = Path(idx_dir) / f"_APPEND_{tag}"
    if marker.exists():
        return
    mod, rem = mod_rem
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    cref = ray.put(centroids)

    def assign_new(t: pa.Table) -> pa.Table:
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array((vid >= N_QUERIES) & (vid % mod == rem)))
        if len(t) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             "embedding": pa.array([], pa.list_(pa.float64()))})
        cen = ray.get(cref)
        m = emb_matrix(t["embedding"])
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        cl = np.argmax(m @ cen.T, axis=1).astype(np.int64)
        return pa.table({"vec_id": t["vec_id"], "cluster": pa.array(cl),
                         "embedding": pa.array(list(m))})

    @ray.remote(num_cpus=0.5)
    def write_cluster(t: pa.Table, cluster: int) -> int:
        _st.write_table(t,
                        f"{idx_dir}/cluster={cluster}/append_{tag}.parquet")
        return len(t)

    assigned = ds.map_batches(assign_new, batch_format="pyarrow")
    # one co-located file per touched cluster, written in parallel tasks.
    # The driver holds ONE DAY'S delta here (bounded by construction); a
    # corpus-scale delta would instead write_parquet(partition_cols) into
    # a tmp dir and rename per-cluster files in (incremental.py's shape).
    parts = assigned.to_pandas()
    refs = []
    for cluster, g in parts.groupby("cluster"):
        t = pa.table({"vec_id": pa.array(g["vec_id"], pa.int64()),
                      "embedding": pa.array(list(g["embedding"]))})
        refs.append(write_cluster.remote(t, int(cluster)))
    ray.get(refs)
    marker.touch()  # commit: all cluster parts durable
    # periodic maintenance: once a cluster dir has accumulated more than
    # IVF_COMPACT_AFTER part files (base + day appends), merge them into
    # one compact part (crash-safe; storage.compact_partition_dirs) so
    # probes stop paying per-file metadata cost as appends accumulate
    _st.compact_partition_dirs(idx_dir, "cluster=*",
                               max_parts=IVF_COMPACT_AFTER)


def ivf_append_topk(sf_dir: str, k: int = TOP_K) -> pd.DataFrame:
    """The IVF daily loop end-to-end: build the index WITHOUT today's
    slice (vec_id % 10 == 7), append the slice to the frozen-quantizer
    index, then search full-probe. Full probe scans every partition —
    base parts and appended parts — so the result is EXACT and shares
    brute force's SQL oracle; the append step is therefore value-hash
    verified, not just rows-checked. Rebuild-equality (appended index ==
    from-scratch full index under full probe) is pinned in tests."""
    idx_dir, centroids = build_ivf_index(
        sf_dir, exclude_mod_rem=(IVF_APPEND_MOD, IVF_APPEND_REM),
        variant="append-base")
    append_ivf_vectors(sf_dir, idx_dir, centroids,
                       (IVF_APPEND_MOD, IVF_APPEND_REM), "day2")
    return _ivf_search(sf_dir, idx_dir, centroids, k, N_CLUSTERS)


# ------------------------------------------------------ big-big KNN join

KNN_K = 3


_KNN_CACHE: dict[tuple, "ray.data.Dataset"] = {}


def _knn_ranked(sf_dir: str, k: int = KNN_K) -> "ray.data.Dataset":
    """The distributed (query_id, neighbor_id, rank) Dataset behind
    knn_join / mutual_topk — MEMOIZED per (corpus file stat, k, Ray job):
    the block-grid matmul is the expensive half, and mutual_topk's fold
    consumes exactly knn_join's output, so running both in one session
    pays for the grid once. The cached object is the materialized ranked
    Dataset (N*k rows of 3 int64s — bounded, object-store resident); the
    file-stat key invalidates on a regenerated corpus and the job-id key
    drops refs owned by a previous Ray session."""
    from pathlib import Path

    st = Path(f"{sf_dir}/embeddings.parquet").stat()
    key = (sf_dir, k, st.st_size, st.st_mtime_ns,
           ray.get_runtime_context().get_job_id())
    ds = _KNN_CACHE.get(key)
    if ds is None:
        _KNN_CACHE.clear()  # one corpus at a time; old refs may be dead
        ds = _KNN_CACHE[key] = _knn_ranked_impl(sf_dir, k).materialize()
    return ds


def _knn_ranked_impl(sf_dir: str, k: int = KNN_K):
    """K-nearest-neighbor JOIN where BOTH sides are the full corpus: for
    every vector, its top-k cosine neighbors (self excluded) — the
    all-pairs companion to brute_force_topk's bounded-query broadcast.
    Output is ranks only (floats never cross the oracle boundary); ties
    break by neighbor id ascending.

    Scale shape: normalized blocks live in the OBJECT STORE (the
    embedding_dup_pairs contract); the nb x nb block grid streams as a
    range Dataset, each task scores one (left, right) block pair with one
    matmul and keeps only a per-left-row partial top-k (id-sorted right
    block + stable argsort = vectorized tie-break), so each grid task
    emits <= rows_left * k rows; the per-query merge folds partials in
    one groupby. Nothing corpus-sized touches the driver, and the
    per-query final fold sees <= nb * k candidate rows."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    def norm_block(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        m = emb_matrix(t["embedding"])
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        order = np.argsort(ids)  # id-ascending: stable argsort ties → id asc
        return pa.table({"vec_id": pa.array(ids[order], pa.int64()),
                         "embedding": pa.array(list(m[order]))})

    blocks = ds.map_batches(norm_block, batch_format="pyarrow",
                            batch_size=4096).materialize()
    refs = blocks.to_arrow_refs()
    nb = len(refs)
    # triangular grid (incl. diagonal): sims(j, i) is sims(i, j).T, so one
    # matmul per UNORDERED block pair serves both directions — half the
    # matmuls and object-store fetches of the full nb x nb grid
    pair_ds = ray.data.range(nb * (nb + 1) // 2)

    def _row_start(i: np.ndarray) -> np.ndarray:
        return i * nb - i * (i - 1) // 2

    p_schema = pa.schema([("query_id", pa.int64()),
                          ("neighbor_id", pa.int64()),
                          ("sim", pa.float64())])

    def score(t: pa.Table) -> pa.Table:
        qs: list[np.ndarray] = []
        ns: list[np.ndarray] = []
        ss: list[np.ndarray] = []

        def emit(ids_q: np.ndarray, ids_n: np.ndarray,
                 sims: np.ndarray, self_pair: bool) -> None:
            kk = min(k, sims.shape[1] - (1 if self_pair else 0))
            if kk <= 0:
                return
            top = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
            qs.append(np.repeat(ids_q, kk))
            ns.append(ids_n[top].ravel())
            ss.append(np.take_along_axis(sims, top, axis=1).ravel())

        ks = np.asarray(t["id"].to_pylist(), dtype=np.int64)
        # invert linearized upper-triangle index (the dedup.py decode)
        fi = np.floor(((2 * nb + 1)
                       - np.sqrt(float(2 * nb + 1) ** 2 - 8.0 * ks))
                      / 2).astype(np.int64)
        fi = np.where(_row_start(fi + 1) <= ks, fi + 1, fi)
        fi = np.where(_row_start(fi) > ks, fi - 1, fi)
        fj = ks - _row_start(fi) + fi
        for i, j in zip(fi.tolist(), fj.tolist()):
            ti, tj = ray.get(refs[i]), ray.get(refs[j])
            ids_i = np.asarray(ti["vec_id"].to_pylist(), dtype=np.int64)
            ids_j = np.asarray(tj["vec_id"].to_pylist(), dtype=np.int64)
            sims = emb_matrix(ti["embedding"]) @ emb_matrix(tj["embedding"]).T
            if i == j:
                np.fill_diagonal(sims, -np.inf)  # self is not a neighbor
                emit(ids_i, ids_j, sims, True)
            else:
                emit(ids_i, ids_j, sims, False)
                emit(ids_j, ids_i, np.ascontiguousarray(sims.T), False)
        if not qs:
            return p_schema.empty_table()
        return pa.table({"query_id": pa.array(np.concatenate(qs), pa.int64()),
                         "neighbor_id": pa.array(np.concatenate(ns), pa.int64()),
                         "sim": pa.array(np.concatenate(ss), pa.float64())})

    out_schema = pa.schema([("query_id", pa.int64()),
                            ("neighbor_id", pa.int64()),
                            ("rank", pa.int64())])

    def final_topk(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "sim" not in t.column_names:
            return out_schema.empty_table()
        df = (t.to_pandas()
              .sort_values(["sim", "neighbor_id"], ascending=[False, True])
              .head(k).reset_index(drop=True))
        return pa.table({
            "query_id": pa.array(df["query_id"].to_numpy(), pa.int64()),
            "neighbor_id": pa.array(df["neighbor_id"].to_numpy(), pa.int64()),
            "rank": pa.array(np.arange(1, len(df) + 1), pa.int64())})

    return (pair_ds.map_batches(score, batch_format="pyarrow", batch_size=4)
            .groupby("query_id").map_groups(final_topk,
                                            batch_format="pyarrow"))


def knn_join(sf_dir: str, k: int = KNN_K) -> pd.DataFrame:
    """Driver-contract wrapper over _knn_ranked (see _knn_ranked_impl's
    docstring for the distributed shape)."""
    out = _knn_ranked(sf_dir, k).to_pandas()
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def mutual_topk(sf_dir: str, k: int = KNN_K) -> pd.DataFrame:
    """Mutual-nearest-neighbor pairs: (a < b) where EACH is in the
    other's cosine top-k — the symmetric filter a dedup/linking pipeline
    applies over a KNN graph to keep only high-confidence matches.
    Directed edges pack into one int64 canonical key (lo << 32 | hi;
    vec_id < 2^32 asserted) and a 64-bucket fold keeps keys seen from
    BOTH directions — a pair can appear at most once per direction, so
    mutuality is exactly count == 2. Nothing corpus-sized on the driver
    before the bounded pair output."""
    import pyarrow.compute as pc

    ranked = _knn_ranked(sf_dir, k)

    key_schema = pa.schema([("pk", pa.int64()), ("b", pa.int32()),
                            ("c", pa.int64())])

    def pack(t: pa.Table) -> pa.Table:
        if "query_id" not in t.column_names or len(t) == 0:
            return key_schema.empty_table()
        q = t["query_id"].to_numpy()
        n = t["neighbor_id"].to_numpy()
        if max(int(q.max()), int(n.max())) >= 1 << 32 or min(
                int(q.min()), int(n.min())) < 0:
            raise ValueError("mutual_topk packs pairs into int64: "
                             "vec_id must be in [0, 2^32)")
        lo, hi = np.minimum(q, n), np.maximum(q, n)
        pk = (lo << 32) | hi
        return pa.table({"pk": pa.array(pk, pa.int64()),
                         "b": pa.array((pk & 63).astype("int32")),
                         "c": pa.array(np.ones(pk.size, np.int64), pa.int64())})

    out_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    def fold(t: pa.Table) -> pa.Table:
        if "pk" not in t.column_names or len(t) == 0:
            return out_schema.empty_table()
        df = (pd.DataFrame({"pk": t["pk"].to_numpy(), "c": t["c"].to_numpy()})
              .groupby("pk", as_index=False)["c"].sum())
        pk = df[df["c"] >= 2]["pk"].to_numpy()
        return pa.table({"a": pa.array(pk >> 32, pa.int64()),
                         "b": pa.array(pk & 0xFFFFFFFF, pa.int64())})

    out = (ranked.map_batches(pack, batch_format="pyarrow")
           .groupby("b").map_groups(fold, batch_format="pyarrow")
           .to_pandas())
    if out.empty:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64")})
    return out.sort_values(["a", "b"]).reset_index(drop=True)


KNN_JOIN_SQL = f"""
SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY a.vec_id
         ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC,
                  b.vec_id) AS BIGINT) AS rank
FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
QUALIFY rank <= {KNN_K}
ORDER BY query_id, rank
"""


# ---------------------------------------------- per-dimension statistics

DIM_Q = 1_000_000  # micro-unit quantization for exact integer moments


def embedding_dim_stats(sf_dir: str) -> pd.DataFrame:
    """Per-dimension feature statistics over the embedding corpus — the
    normalization-stats pass a feature pipeline runs before whitening or
    scalar quantization. Values quantize to exact micro-units
    (floor(v·1e6 + .5), one deterministic op on the same double in both
    engines), so the per-dimension sum and min/max fold as integers —
    order-invariant at any block shape. One exchange: each batch emits
    64 partial rows (dim, n, s, mn, mx) from a vectorized column fold;
    a dims-sized groupby finishes."""
    from ray.data.aggregate import Max, Min, Sum

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        m = emb_matrix(t["embedding"])
        q = np.floor(m * DIM_Q + 0.5).astype(np.int64)
        d = q.shape[1]
        return pa.table({
            "dim": pa.array(np.arange(d), pa.int64()),
            "n": pa.array(np.full(d, q.shape[0]), pa.int64()),
            "s": pa.array(q.sum(axis=0), pa.int64()),
            "mn": pa.array(q.min(axis=0), pa.int64()),
            "mx": pa.array(q.max(axis=0), pa.int64())})

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("dim")
           .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                      Min("mn", alias_name="min_q"),
                      Max("mx", alias_name="max_q"))
           .to_pandas())
    out["mean"] = (out["s"].to_numpy().astype(np.float64)
                   / out["n"].to_numpy().astype(np.float64)) / DIM_Q
    out = out[["dim", "n", "min_q", "max_q", "mean"]]
    for c in ("n", "min_q", "max_q"):
        out[c] = out[c].astype("int64")
    return out.sort_values("dim").reset_index(drop=True)


EMBEDDING_DIM_STATS_SQL = f"""
WITH v AS (
  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {DIM_Q} + 0.5)
              AS BIGINT) AS q
  FROM embeddings
)
SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
       MIN(q) AS min_q, MAX(q) AS max_q,
       (CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) / {DIM_Q} AS mean
FROM v GROUP BY dim ORDER BY dim
"""


MUTUAL_TOPK_SQL = f"""
WITH r AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC,
                    b.vec_id) AS rnk
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
  QUALIFY rnk <= {KNN_K}
)
SELECT r1.query_id AS a, r1.neighbor_id AS b
FROM r r1
JOIN r r2 ON r1.query_id = r2.neighbor_id AND r1.neighbor_id = r2.query_id
WHERE r1.query_id < r1.neighbor_id
ORDER BY a, b
"""


# ------------------------------------------------------------------- PQ
# Product quantization (Jégou et al. 2011): split the D-dim embedding
# into PQ_M subspaces, k-means a 256-entry codebook per subspace, store
# each corpus vector as PQ_M uint8 codes. At 100 TB this is THE reason
# ANN fits at all: 64 float32 dims (256 B) become 8 bytes (32x), the
# search reads ONLY the codes table (raw embeddings never leave cold
# storage), and ADC scoring is a table lookup-sum instead of a matmul.

PQ_M = 8  # subspaces over the 64-dim embedding (8 dims each)
PQ_KSUB = 256  # codebook entries per subspace (uint8 codes)


def _kmeans_l2(m: np.ndarray, n_clusters: int, iters: int,
               seed: int = 23) -> np.ndarray:
    """Standard euclidean Lloyd (PQ quantizes raw subvectors — the
    cosine-normalized _kmeans above is wrong for subspaces)."""
    rng = np.random.default_rng(seed)
    cen = m[rng.choice(len(m), size=n_clusters, replace=False)].copy()
    for _ in range(iters):
        d = ((m[:, None, :] - cen[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)
        for c in range(n_clusters):
            members = m[assign == c]
            if len(members):
                cen[c] = members.mean(axis=0)
    return cen


def build_pq_index(sf_dir: str) -> tuple[str, np.ndarray]:
    """Train per-subspace codebooks on a bounded sample (driver holds
    TRAIN_SAMPLE rows, never the corpus) and encode every corpus vector
    into PQ_M uint8 columns c0..c{M-1} — a columnar codes table the ADC
    scan reads zero-copy per subspace. Same crash-safe cache discipline
    as the IVF index (keyed dir, build into .building, atomic rename,
    _DONE marker)."""
    import shutil
    from pathlib import Path

    idx_dir = _ivf_index_dir(sf_dir, variant="pq")
    done = Path(idx_dir) / "_DONE"
    if done.exists():
        return idx_dir, np.load(str(Path(idx_dir) / "codebooks.npy"))
    if Path(idx_dir).exists():
        shutil.rmtree(idx_dir)
    build_dir = idx_dir + ".building"
    if Path(build_dir).exists():
        shutil.rmtree(build_dir)

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    corpus = ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t["vec_id"],
                                            pa.scalar(N_QUERIES))),
        batch_format="pyarrow")
    sample = corpus.limit(TRAIN_SAMPLE).to_pandas()
    sm = np.array(sample["embedding"].to_list(), dtype=np.float64)
    sm /= np.linalg.norm(sm, axis=1, keepdims=True)
    d_sub = sm.shape[1] // PQ_M
    ksub = min(PQ_KSUB, max(16, len(sm) // 2))
    books = np.stack([_kmeans_l2(sm[:, m * d_sub:(m + 1) * d_sub], ksub,
                                 iters=8, seed=23 + m)
                      for m in range(PQ_M)])  # (M, ksub, d_sub)
    bref = ray.put(books)

    def encode(t: pa.Table) -> pa.Table:
        bks = ray.get(bref)
        mat = emb_matrix(t["embedding"])
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        cols = {"vec_id": t["vec_id"]}
        for m in range(PQ_M):
            sub = mat[:, m * d_sub:(m + 1) * d_sub]
            # argmin ||x-c||^2 == argmax(x.c - |c|^2/2): one matmul
            scores = sub @ bks[m].T - 0.5 * (bks[m] ** 2).sum(axis=1)
            cols[f"c{m}"] = pa.array(
                np.argmax(scores, axis=1).astype(np.uint8))
        return pa.table(cols)

    # codes live under codes/ so the search's read_parquet never sees
    # the sidecar .npy (read_parquet scans every file in its dir)
    corpus.map_batches(encode, batch_format="pyarrow").write_parquet(
        str(Path(build_dir) / "codes"))
    np.save(str(Path(build_dir) / "codebooks.npy"), books)
    Path(build_dir).rename(idx_dir)
    done.touch()
    return idx_dir, books


PQ_SHORTLIST = 100  # ADC candidates per query fed to the exact re-rank


def pq_topk(sf_dir: str, k: int = TOP_K) -> pd.DataFrame:
    """Approximate cosine top-k: ADC shortlist over the PQ codes table,
    then an exact re-rank of the shortlist only. The scan phase never
    touches a raw embedding — per query, a (M x ksub) lookup table of
    exact query-to-codebook inner products scores each corpus vector as
    a lookup-sum over its M codes; the top PQ_SHORTLIST candidates per
    query (a BOUNDED set, Q x 100 ids) are then re-scored exactly with
    one filtered pass over the embeddings table. This is the standard
    IVF-PQ + re-rank shape: at 100 TB the codes table is 32x smaller
    than the embeddings, the ADC scan is the only full pass, and the
    re-rank reads a few hundred rows from cold storage. Same output
    contract as brute_force_topk (ranks only); recall vs the exact
    oracle is pinned in tests (rows-only query: quantization argmins
    are not SQL-expressible)."""
    idx_dir, books = build_pq_index(sf_dir)
    q_ids, qm = _load_queries(sf_dir)
    d_sub = qm.shape[1] // PQ_M
    # (Q, M, ksub) exact query-subvector x codebook inner products
    lut = np.stack([qm[:, m * d_sub:(m + 1) * d_sub] @ books[m].T
                    for m in range(PQ_M)], axis=1)
    ref = ray.put((q_ids, lut))

    codes = ray.data.read_parquet(
        f"{idx_dir}/codes", columns=["vec_id"] + [f"c{m}" for m in range(PQ_M)])

    def partial(t: pa.Table) -> pa.Table:
        qi, lt = ray.get(ref)
        vid = t["vec_id"].to_numpy().astype(np.int64)
        sims = np.zeros((len(qi), vid.size))
        for m in range(PQ_M):
            cm = t[f"c{m}"].to_numpy(zero_copy_only=False)
            sims += lt[:, m, cm]  # (Q, B) gather-add per subspace
        rows = {"query_id": [], "neighbor_id": [], "sim": []}
        kk = min(k, vid.size)
        for qidx in range(len(qi)):
            order = np.lexsort((vid, -sims[qidx]))[:kk]
            rows["query_id"].extend([int(qi[qidx])] * len(order))
            rows["neighbor_id"].extend(int(v) for v in vid[order])
            rows["sim"].extend(float(s) for s in sims[qidx][order])
        return pa.table({"query_id": pa.array(rows["query_id"], pa.int64()),
                         "neighbor_id": pa.array(rows["neighbor_id"], pa.int64()),
                         "sim": pa.array(rows["sim"], pa.float64())})

    def final_shortlist(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["sim", "neighbor_id"],
                                       ascending=[False, True])
        return pa.Table.from_pandas(df.head(PQ_SHORTLIST)
                                    [["query_id", "neighbor_id"]],
                                    preserve_index=False)

    short = (codes.map_batches(partial, batch_format="pyarrow")
             .groupby("query_id")
             .map_groups(final_shortlist, batch_format="pyarrow")
             .to_pandas())

    # exact re-rank: ONE filtered pass pulls only the candidate rows
    # (<= Q x PQ_SHORTLIST) — the bounded small side every broadcast-
    # lookup stage in this repo uses
    cand = np.unique(short["neighbor_id"].to_numpy())
    cds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    got = cds.map_batches(
        lambda t: t.filter(pc.is_in(t["vec_id"],
                                    pa.array(cand, pa.int64()))),
        batch_format="pyarrow").to_pandas()
    gm = np.array(got["embedding"].to_list(), dtype=np.float64)
    gm /= np.linalg.norm(gm, axis=1, keepdims=True)
    gid = got["vec_id"].to_numpy().astype(np.int64)
    pos = {int(v): i for i, v in enumerate(gid)}
    rows = []
    for qidx, qid_ in enumerate(q_ids):
        mine = short[short["query_id"] == qid_]["neighbor_id"].to_numpy()
        idx = np.array([pos[int(v)] for v in mine])
        sims = qm[qidx] @ gm[idx].T
        order = np.lexsort((mine, -sims))[:k]
        for r, j in enumerate(order, 1):
            rows.append((int(qid_), int(mine[j]), r))
    out = pd.DataFrame(rows, columns=["query_id", "neighbor_id", "rank"])
    out["rank"] = out["rank"].astype("int64")
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)
