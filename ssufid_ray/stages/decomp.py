"""Decomposition + sketch analytics over big columns.

Two operator families, both registered rows-only (no SQL can express an
eigendecomposition or a mergeable sketch) with exact in-repo pins:

  - pca_project: distributed 2-component PCA over the embedding column.
    One pass folds per-row FIXED-POINT outer-product contributions
    (round(x_i*x_j*2^32) int64 — integer addition is order-independent,
    so the covariance is run-, block-split- and worker-count-invariant,
    the kmeans contract). The d x d moment matrix tree-merges through a
    bounded fan-in groupby (the HLL pattern: the driver sees <= FANIN
    partials no matter the block count). Eigendecomposition happens once
    on the driver over a 64x64 matrix; the projection pass is integer
    dot products against the quantized components, so outputs are
    bit-exact reproducible (pinned to a sequential reference in tests).

  - ddsketch_quantiles: relative-error quantile sketch (DDSketch,
    Masson/Lee/Rim VLDB'19): bucket i = ceil(log_gamma(x)) with
    gamma = (1+a)/(1-a). Per-batch partials are (bucket, count) int
    rows; counts merge associatively through one tiny groupby — no row
    shuffle, no min/max pre-pass, mergeable across any split, the
    one-pass scale path next to sampling.exact_quantiles' multi-pass
    exact answer. Accuracy (relative error <= a at the tested quantiles)
    is asserted against the exact quantile in tests.

Scale notes: both operators ship only constant-size state per block
(33 KB moment partial / <=few-hundred bucket rows); nothing corpus-sized
touches the driver or the exchange.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ssufid_ray.functions.emb import emb_matrix
from ssufid_ray.stages.relational import read

# ------------------------------------------------------------ PCA

PCA_K = 2
_FP = 1 << 24    # fixed-point scale for vectors / components
_FP2 = 1 << 32   # fixed-point scale for per-row outer products
PCA_FANIN = 64   # bounded fan-in of the distributed moment merge


def _moment_partial_rows(X: np.ndarray) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, sum of round(x*FP), sum of round(x_i*x_j*FP2)) — all int64,
    quantized PER ROW so any regrouping folds to identical totals."""
    n = X.shape[0]
    sx = np.round(X * _FP).astype(np.int64).sum(axis=0)
    outer = np.einsum("bi,bj->bij", X, X)
    sxx = np.round(outer * _FP2).astype(np.int64).sum(axis=0).ravel()
    return n, sx, sxx


def _principal_components(n: int, sx: np.ndarray, sxx: np.ndarray,
                          d: int) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side: dequantize exact integer moments -> covariance ->
    top-PCA_K eigenvectors with a deterministic sign convention."""
    mu = sx.astype(np.float64) / (_FP * n)
    S = sxx.astype(np.float64).reshape(d, d) / _FP2
    C = S / n - np.outer(mu, mu)
    C = (C + C.T) / 2.0
    vals, vecs = np.linalg.eigh(C)
    W = vecs[:, np.argsort(vals)[::-1][:PCA_K]]
    for j in range(W.shape[1]):  # sign: largest-|entry| coordinate positive
        if W[np.argmax(np.abs(W[:, j])), j] < 0:
            W[:, j] = -W[:, j]
    return mu, W


def pca_project(sf_dir: str) -> pd.DataFrame:
    """Project every embedding onto the corpus' top-2 principal
    components. Registered rows-only; tests pin the output bit-exact to
    pca_reference (same quantization contract, no distribution)."""
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()

    schema = pa.schema([("g", pa.int32()), ("n", pa.int64()),
                        ("sx", pa.list_(pa.int64())),
                        ("sxx", pa.list_(pa.int64()))])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "vec_id" not in t.column_names:
            return pa.Table.from_pylist([], schema=schema)
        X = emb_matrix(t["embedding"]).astype(np.float64)
        n, sx, sxx = _moment_partial_rows(X)
        # hash of the first vec_id: raw `id % FANIN` degenerates when
        # batch boundaries align to power-of-two sizes (all first ids
        # congruent mod FANIN -> one merge group does all the work)
        first = str(t["vec_id"][0].as_py()).encode()
        g = int.from_bytes(hashlib.blake2b(first, digest_size=2).digest(),
                           "little") % PCA_FANIN
        return pa.Table.from_pylist(
            [{"g": g, "n": n, "sx": sx.tolist(), "sxx": sxx.tolist()}],
            schema=schema)

    def merge_group(t: pa.Table) -> pa.Table:
        if "n" not in t.column_names or len(t) == 0:
            return pa.Table.from_pylist([], schema=schema)
        df = t.to_pandas()
        sx = np.sum([np.asarray(a, dtype=np.int64) for a in df["sx"]], axis=0)
        sxx = np.sum([np.asarray(a, dtype=np.int64) for a in df["sxx"]], axis=0)
        return pa.Table.from_pylist(
            [{"g": int(df["g"].iloc[0]), "n": int(df["n"].sum()),
              "sx": sx.tolist(), "sxx": sxx.tolist()}], schema=schema)

    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("g").map_groups(merge_group, batch_format="pyarrow")
             .to_pandas())  # bounded: <= PCA_FANIN rows of ~33 KB
    n = int(parts["n"].sum())
    sx = np.sum([np.asarray(a, dtype=np.int64) for a in parts["sx"]], axis=0)
    sxx = np.sum([np.asarray(a, dtype=np.int64) for a in parts["sxx"]], axis=0)
    d = sx.size
    mu, W = _principal_components(n, sx, sxx, d)
    muq = np.round(mu * _FP).astype(np.int64)
    wq = np.round(W * _FP).astype(np.int64)

    def project(t: pa.Table) -> pa.Table:
        Xq = np.round(emb_matrix(t["embedding"]).astype(np.float64)
                      * _FP).astype(np.int64)
        P = (Xq - muq) @ wq  # exact int64: |2^24 * 2^24 * 64| << 2^63
        out = P.astype(np.float64) / (_FP * float(_FP))
        return pa.table({"vec_id": t["vec_id"],
                         "pc1": pa.array(out[:, 0], pa.float64()),
                         "pc2": pa.array(out[:, 1], pa.float64())})

    df = ds.map_batches(project, batch_format="pyarrow").to_pandas()
    return df.sort_values("vec_id").reset_index(drop=True)


def pca_reference(vecs: np.ndarray) -> pd.DataFrame:
    """Sequential reference with the identical quantization contract
    (tests pin pca_project bit-exact to this)."""
    X = vecs.astype(np.float64)
    n, sx, sxx = _moment_partial_rows(X)
    mu, W = _principal_components(n, sx, sxx, X.shape[1])
    Xq = np.round(X * _FP).astype(np.int64)
    P = (Xq - np.round(mu * _FP).astype(np.int64)) \
        @ np.round(W * _FP).astype(np.int64)
    out = P.astype(np.float64) / (_FP * float(_FP))
    return pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                         "pc1": out[:, 0], "pc2": out[:, 1]})


# ------------------------------------------------ DDSketch quantiles

DD_ALPHA = 0.01
DD_GAMMA = (1 + DD_ALPHA) / (1 - DD_ALPHA)
_LOG_GAMMA = math.log(DD_GAMMA)
DD_QS = (0.5, 0.9, 0.99)


def _dd_partial(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(bucket ids, counts) for positive values; bucket = ceil(log_g v)."""
    v = values[values > 0]
    b = np.ceil(np.log(v) / _LOG_GAMMA).astype(np.int64)
    return np.unique(b, return_counts=True)


def _dd_quantile(buckets: np.ndarray, counts: np.ndarray, total: int,
                 q: float) -> float:
    """Value estimate at quantile q: midpoint 2*g^i/(g+1) of the covering
    bucket (relative error <= alpha by construction). NaN when the sketch
    is empty (the column held no positive values — only those are
    bucketed)."""
    if total == 0:
        return float("nan")
    order = np.argsort(buckets)
    cum = np.cumsum(counts[order])
    i = int(buckets[order][np.searchsorted(cum, max(1, math.ceil(q * total)))])
    return 2.0 * (DD_GAMMA ** i) / (DD_GAMMA + 1)


def _dd_over(ds: ray.data.Dataset, col: str) -> list[tuple[float, float]]:
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        b, c = _dd_partial(t[col].to_numpy())
        return pa.table({"bucket": pa.array(b, pa.int64()),
                         "n": pa.array(c, pa.int64())})

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket").aggregate(Sum("n", alias_name="n"))
            .to_pandas())  # bounded: <= log_g(max/min) buckets, data-free
    if hist.empty or "bucket" not in hist.columns:  # no positive values
        return [(q, float("nan")) for q in DD_QS]
    b = hist["bucket"].to_numpy()
    c = hist["n"].to_numpy()
    total = int(c.sum())
    return [(q, _dd_quantile(b, c, total, q)) for q in DD_QS]


def ddsketch_quantiles(sf_dir: str) -> pd.DataFrame:
    """Rows-only query: one-pass mergeable quantile estimates (p50/p90/p99)
    for two value columns; accuracy vs the exact quantile is asserted in
    tests (relative error <= 2*alpha incl. the discrete-bucket slack)."""
    rows = []
    for table, col in (("orders", "o_totalprice"), ("events", "value")):
        for q, est in _dd_over(read(sf_dir, table, [col]), col):
            rows.append({"table": table, "column": col, "q": q,
                         "estimate": round(est, 4)})
    df = pd.DataFrame(rows)
    return df.sort_values(["table", "column", "q"]).reset_index(drop=True)


def group_ddsketch_quantiles(sf_dir: str) -> pd.DataFrame:
    """Per-GROUP mergeable quantile sketch (the grouped complement of
    ddsketch_quantiles, and the approximate complement of the exact
    group_quantiles): p50/p90/p99 of document length per language. Each
    batch emits combined (lang, bucket, count) partials, one tiny
    groupby folds them, and the driver only ever sees
    groups x occupied-buckets rows (data-free size: <= log_g(max/min)
    per group). Rows-only query — the bucket index is ceil(log_g v),
    whose libm rounding the SQL engine can't be guaranteed to reproduce
    at bucket boundaries; accuracy vs the exact per-group quantile is
    asserted in tests instead."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", ["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        langs, bs, ns = [], [], []
        for lang, g in df.groupby("lang"):
            b, c = _dd_partial(g["n_chars"].to_numpy(dtype=np.float64))
            langs.extend([lang] * b.size)
            bs.append(b)
            ns.append(c)
        return pa.table({
            "lang": pa.array(langs, pa.string()),
            "bucket": pa.array(np.concatenate(bs) if bs else
                               np.array([], dtype=np.int64), pa.int64()),
            "n": pa.array(np.concatenate(ns) if ns else
                          np.array([], dtype=np.int64), pa.int64())})

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["lang", "bucket"]).aggregate(Sum("n", alias_name="n"))
            .to_pandas())
    if hist.empty or "lang" not in hist.columns:  # no positive values at all
        return pd.DataFrame({"lang": pd.Series(dtype="object"),
                             "q": pd.Series(dtype="float64"),
                             "estimate": pd.Series(dtype="float64")})
    rows = []
    for lang, g in hist.groupby("lang"):
        b = g["bucket"].to_numpy()
        c = g["n"].to_numpy()
        total = int(c.sum())
        for q in DD_QS:
            rows.append({"lang": lang, "q": q,
                         "estimate": round(_dd_quantile(b, c, total, q), 4)})
    return (pd.DataFrame(rows).sort_values(["lang", "q"])
            .reset_index(drop=True))
