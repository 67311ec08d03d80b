"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup (the training-data-pipeline family).

Scale design:
  - exact: content-hash column in map_batches, then hash-partitioned
    group-first (one shuffle of (hash, id) pairs, not of the texts)
  - minhash: signatures per batch -> explode to (band, band_hash, doc_id)
    rows -> groupby bands (the only shuffle) -> candidate pairs ->
    vectorized verification against a broadcast token-set side
  - simhash: pure map + bucket key, no shuffle until the rollup
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ssufid_ray.stages.relational import read

# ---------------------------------------------------------------- exact


def exact_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact text dedup: keep min doc_id per distinct text; group_size
    records the duplicate count (1 when unique)."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    # hash-bucket the content hashes (64 buckets), then a vectorized pandas
    # group-first within each bucket — one bounded shuffle, no per-text task
    def add_hash(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in t["text"].to_pylist()]
        t = t.append_column("h", pa.array(hs, pa.string()))
        return t.append_column(
            "bucket", pa.array([int(h[:8], 16) % 64 for h in hs], pa.int32()))

    def first_per_hash(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values("doc_id")
        g = df.groupby("h", as_index=False).agg(
            doc_id=("doc_id", "first"), text=("text", "first"),
            group_size=("doc_id", "size"))
        g["group_size"] = g["group_size"].astype("int64")
        return pa.Table.from_pandas(g[["doc_id", "text", "group_size"]],
                                    preserve_index=False)

    out = (ds.map_batches(add_hash, batch_format="pyarrow")
           .groupby("bucket").map_groups(first_per_hash, batch_format="pyarrow")
           .to_pandas())
    out["group_size"] = out["group_size"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


EXACT_DEDUP_SQL = """
SELECT MIN(doc_id) AS doc_id, text, COUNT(*) AS group_size
FROM documents GROUP BY text ORDER BY doc_id
"""


# ---------------------------------------------------------------- minhash

N_HASHES = 128
N_BANDS = 32  # 4 rows/band: P(miss | J=0.9) = (1-0.9^4)^32 ≈ 2e-7
ROWS_PER_BAND = N_HASHES // N_BANDS
MINHASH_TAU = 0.9
_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 61, size=N_HASHES, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 61, size=N_HASHES, dtype=np.uint64)
    return a, b


_TOKEN_HASH_CACHE: dict[str, int] = {}


def _token_hash(tok: str) -> int:
    h = _TOKEN_HASH_CACHE.get(tok)
    if h is None:
        h = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(),
                           "little")
        if len(_TOKEN_HASH_CACHE) < 1_000_000:  # bounded per-worker memo
            _TOKEN_HASH_CACHE[tok] = h
    return h


def _token_hashes(text: str) -> np.ndarray:
    return np.array([_token_hash(t) for t in set(text.split())], dtype=np.uint64)


def _signature(th: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    # (a*h + b) mod p for each perm; vectorized over tokens x perms
    vals = (th[:, None] * a[None, :] + b[None, :]) % _MERSENNE
    return vals.min(axis=0)


def minhash_dedup(sf_dir: str, tau: float = MINHASH_TAU) -> pd.DataFrame:
    """MinHash+LSH near-dup pairs over token SETS, verified with exact
    Jaccard >= tau. Domain restricted to doc_id % 5 == 0 (the synthetic
    corpus is dense in near-dups; the restriction keeps the verified-pair
    count O(n) — documented cap, see module docstring)."""
    def domain(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(t["doc_id"].to_numpy() % 5 == 0))

    docs = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        domain, batch_format="pyarrow")
    a, b = _perm_params()

    def bands(t: pa.Table) -> pa.Table:
        rows = []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            th = _token_hashes(text)
            if th.size == 0:
                continue
            sig = _signature(th, a, b)
            for band in range(N_BANDS):
                chunk = sig[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
                bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                rows.append({"band": band, "band_hash": bh, "doc_id": doc_id})
        return pa.Table.from_pylist(rows, schema=pa.schema(
            [("band", pa.int32()), ("band_hash", pa.string()), ("doc_id", pa.int64())]))

    def bucket_pairs(t: pa.Table) -> pa.Table:
        """Candidate pairs within one (band, band_hash) bucket, locally
        deduped and tagged with a pair-hash bucket for the global dedup."""
        ids = sorted(set(t["doc_id"].to_pylist()))
        rows = {"a": [], "b": [], "pb": []}
        for x, y in itertools.combinations(ids, 2):
            rows["a"].append(x)
            rows["b"].append(y)
            rows["pb"].append((x * 1000003 + y) % 64)
        return pa.table({"a": pa.array(rows["a"], pa.int64()),
                         "b": pa.array(rows["b"], pa.int64()),
                         "pb": pa.array(rows["pb"], pa.int32())})

    cand = (docs.map_batches(bands, batch_format="pyarrow")
            .groupby(["band", "band_hash"])
            .map_groups(bucket_pairs, batch_format="pyarrow"))

    # verification side: broadcast token sets once
    token_sets = {
        r["doc_id"]: set(r["text"].split())
        for r in docs.select_columns(["doc_id", "text"]).take_all()
    }
    sets_ref = ray.put(token_sets)

    def dedup_and_verify(t: pa.Table) -> pa.Table:
        """Per pair-bucket: drop duplicate candidates (a pair may share many
        bands), then exact-Jaccard verify. Vectorized dedup, one task per
        bucket — no per-pair groups."""
        import pandas as pd

        ts = ray.get(sets_ref)
        df = t.to_pandas().drop_duplicates(["a", "b"])
        rows = []
        for x, y in zip(df["a"], df["b"]):
            A, B = ts[x], ts[y]
            inter = len(A & B)
            j = inter / (len(A) + len(B) - inter)
            if j >= tau:
                rows.append({"a": int(x), "b": int(y), "jaccard": j})
        return pa.Table.from_pylist(rows, schema=pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]))

    out = (cand.groupby("pb").map_groups(dedup_and_verify, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values(["a", "b"]).reset_index(drop=True)


MINHASH_DEDUP_SQL = f"""
WITH d AS (
  SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS s
  FROM documents WHERE doc_id % 5 = 0
)
SELECT a.doc_id AS a, b.doc_id AS b,
       CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
FROM d a JOIN d b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= {MINHASH_TAU}
ORDER BY a, b
"""


# ---------------------------------------------------------------- simhash


def simhash_clusters(sf_dir: str) -> pd.DataFrame:
    """64-bit SimHash per doc (Charikar'02) + 16-bit prefix bucket — the
    hamming-distance blocking key. Rows-only (no SQL equivalent)."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def sim(t: pa.Table) -> pa.Table:
        rows = []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            acc = np.zeros(64, dtype=np.int64)
            for tok in set(text.split()):
                h = _token_hash(tok)
                bits = np.array([(h >> i) & 1 for i in range(64)], dtype=np.int64)
                acc += bits * 2 - 1
            sh = 0
            for i in range(64):
                if acc[i] > 0:
                    sh |= 1 << i
            rows.append({"doc_id": doc_id, "simhash": sh % (1 << 63),
                         "bucket": sh >> 48})
        return pa.Table.from_pylist(rows, schema=pa.schema(
            [("doc_id", pa.int64()), ("simhash", pa.int64()), ("bucket", pa.int64())]))

    return (ds.map_batches(sim, batch_format="pyarrow").to_pandas()
            .sort_values("doc_id").reset_index(drop=True))


# ------------------------------------------------------------ ngram pairs

NGRAM_N = 3
NGRAM_TAU = 0.01
NGRAM_MAX_ID = 80


def ngram_jaccard_pairs(sf_dir: str) -> pd.DataFrame:
    """Brute-force 3-gram shingle Jaccard pairs on a bounded domain
    (doc_id < 80) — the exact-verification baseline the LSH path
    approximates; fully SQL-mirrored."""
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    sub = [(i, t) for i, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
           if i < NGRAM_MAX_ID]

    def shingles(text: str) -> set[str]:
        toks = text.split()
        n = max(1, len(toks) - NGRAM_N + 1)
        return {" ".join(toks[i : i + NGRAM_N]) for i in range(n)}

    sets = {i: shingles(t) for i, t in sub}
    ids = sorted(sets)
    pairs_ds = ray.data.from_items(
        [{"a": a, "b": b} for a, b in itertools.combinations(ids, 2)])
    ref = ray.put(sets)

    def jac(t: pa.Table) -> pa.Table:
        s = ray.get(ref)
        rows = []
        for x, y in zip(t["a"].to_pylist(), t["b"].to_pylist()):
            A, B = s[x], s[y]
            inter = len(A & B)
            j = inter / (len(A) + len(B) - inter)
            if j >= NGRAM_TAU:
                rows.append({"a": x, "b": y, "jaccard": j})
        return pa.Table.from_pylist(rows, schema=pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]))

    out = pairs_ds.map_batches(jac, batch_format="pyarrow").to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


NGRAM_JACCARD_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents WHERE doc_id < {NGRAM_MAX_ID}
), s AS (
  SELECT doc_id,
         list_distinct(list_transform(
             generate_series(1, greatest(1, len(toks) - {NGRAM_N - 1})),
             i -> array_to_string(toks[i : i + {NGRAM_N - 1}], ' '))) AS sh
  FROM t
)
SELECT a.doc_id AS a, b.doc_id AS b,
       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= {NGRAM_TAU}
ORDER BY a, b
"""


# ------------------------------------------------- embedding near-dup

EMB_TAU = 0.35


def embedding_dup_pairs(sf_dir: str) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs (vec_id asymmetry avoided: all
    pairs a<b with cosine >= tau). Batched numpy matmul against a
    broadcast normalized matrix; sims never leave as floats (pair list
    only) so oracle comparison is precision-safe."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    ref = ray.put((ids, m))

    ds = ray.data.from_arrow(pa.table({"row": pa.array(range(len(ids)), pa.int64())}))

    def pairs(t2: pa.Table) -> pa.Table:
        all_ids, mat = ray.get(ref)
        rows_idx = t2["row"].to_numpy()
        sims = mat[rows_idx] @ mat.T
        out = []
        for k, i in enumerate(rows_idx):
            js = np.where(sims[k] >= EMB_TAU)[0]
            for j in js:
                if all_ids[i] < all_ids[j]:
                    out.append({"a": int(all_ids[i]), "b": int(all_ids[j])})
        return pa.Table.from_pylist(out, schema=pa.schema(
            [("a", pa.int64()), ("b", pa.int64())]))

    out = ds.map_batches(pairs, batch_format="pyarrow", batch_size=128).to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


EMBEDDING_DUP_SQL = f"""
SELECT a.vec_id AS a, b.vec_id AS b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= {EMB_TAU}
ORDER BY a, b
"""
