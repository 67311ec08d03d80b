"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup (the training-data-pipeline family).

Scale design:
  - exact: content-hash column in map_batches, then hash-partitioned
    group-first over (hash, id) PAIRS only — texts never cross the
    shuffle; winners re-attach text in a second streaming pass
  - minhash: signatures per batch -> explode to (band, band_hash, doc_id)
    rows -> groupby bands -> candidate pairs -> co-partitioned two-sided
    attach of token texts (no driver-side corpus broadcast) -> exact
    Jaccard per pair partition
  - embedding exact: distributed block x block cosine over object-store
    refs; embedding high-sim: sign-random-projection LSH banding scores
    only intra-bucket pairs (the 100-TB path for tau >= ~0.8)
  - simhash: pure map + bucket key, no shuffle until the rollup
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ssufid_ray.functions.emb import emb_matrix
from ssufid_ray.stages.relational import read

# ---------------------------------------------------------------- exact


EXACT_DEDUP_BROADCAST_ROWS = 2_000_000  # winner-side broadcast gate


def exact_dedup(sf_dir: str,
                broadcast_rows: int = EXACT_DEDUP_BROADCAST_ROWS) -> pd.DataFrame:
    """Exact text dedup: keep min doc_id per distinct text; group_size
    records the duplicate count (1 when unique).

    Only (hash, doc_id) pairs cross the first shuffle — ~16 bytes/doc
    instead of the text column. The winner table (doc_id -> group_size,
    one INT pair per distinct text) re-attaches texts by a second
    streaming pass, on one of two gated paths:
      small winner side -> ray.put the sorted int arrays once, filter by
                           np.isin per batch (no further shuffle)
      large winner side -> co-partitioned join: winners and corpus rows
                           bucketed by hash(doc_id), vectorized pandas
                           merge per bucket — texts cross the exchange
                           exactly once, nothing corpus-sized on the
                           driver (tests pin both paths equal with
                           broadcast_rows=0)."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def hash_pairs(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in t["text"].to_pylist()]
        return pa.table({
            "h": pa.array(hs, pa.string()),
            "doc_id": t["doc_id"],
            "bucket": pa.array([int(h[:8], 16) % 64 for h in hs], pa.int32()),
        })

    def win_per_hash(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("h", as_index=False).agg(
            doc_id=("doc_id", "min"), group_size=("doc_id", "size"))
        g["group_size"] = g["group_size"].astype("int64")
        return pa.Table.from_pandas(g[["doc_id", "group_size"]],
                                    preserve_index=False)

    winners_ds = (ds.map_batches(hash_pairs, batch_format="pyarrow")
                  .groupby("bucket").map_groups(win_per_hash,
                                                batch_format="pyarrow")
                  .materialize())  # ints only, one row per distinct text

    if winners_ds.count() <= broadcast_rows:
        winners = winners_ds.to_pandas().sort_values("doc_id")
        wref = ray.put((winners["doc_id"].to_numpy(),
                        winners["group_size"].to_numpy()))

        def attach(t: pa.Table) -> pa.Table:
            ks, gs = ray.get(wref)
            ids = t["doc_id"].to_numpy()
            mask = np.isin(ids, ks)
            t = t.filter(pa.array(mask))
            sz = gs[np.searchsorted(ks, ids[mask])]
            return t.append_column("group_size", pa.array(sz, pa.int64()))

        out = ds.map_batches(attach, batch_format="pyarrow").to_pandas()
    else:
        NB = 64

        def tag(side: str):
            def f(t: pa.Table) -> pa.Table:
                cols = {"doc_id": t["doc_id"],
                        "db": pc.cast(pc.bit_wise_and(t["doc_id"],
                                                      pa.scalar(NB - 1)),
                                      pa.int32()),
                        "text": t["text"] if side == "corpus" else
                        pa.nulls(len(t), pa.string()),
                        "group_size": t["group_size"] if side == "win" else
                        pa.nulls(len(t), pa.int64())}
                return pa.table(cols)
            return f

        both = (ds.map_batches(tag("corpus"), batch_format="pyarrow")
                .union(winners_ds.map_batches(tag("win"),
                                              batch_format="pyarrow")))

        def join_bucket(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            win = df[df["group_size"].notna()][["doc_id", "group_size"]]
            corpus = df[df["group_size"].isna()][["doc_id", "text"]]
            j = corpus.merge(win, on="doc_id", how="inner")
            j["group_size"] = j["group_size"].astype("int64")
            return pa.Table.from_pandas(j[["doc_id", "text", "group_size"]],
                                        preserve_index=False)

        out = (both.groupby("db").map_groups(join_bucket,
                                             batch_format="pyarrow")
               .to_pandas())

    out["group_size"] = out["group_size"].astype("int64")
    return (out[["doc_id", "text", "group_size"]]
            .sort_values("doc_id").reset_index(drop=True))


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


MINHASH_BROADCAST_BYTES = 64 << 20  # verification-side broadcast gate

# LSH band-bucket skew guard: max ids expanded all-pairs in one group task.
# Above this a bucket is split by a band-salted secondary hash (see
# _bucket_pairs_guarded). Bench buckets are tiny; this only fires on
# degenerate corpora (mass-identical boilerplate).
LSH_BUCKET_CAP = 1024
_SPLIT_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _triu_pairs(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All ordered (a<b) pairs of a sorted id array, vectorized."""
    iu, ju = np.triu_indices(ids.size, 1)
    return ids[iu], ids[ju]


def _bucket_pairs_guarded(t: pa.Table,
                          cap: int = LSH_BUCKET_CAP) -> pa.Table:
    """Vectorized candidate-pair emission for one (band, band_hash)
    bucket with an O(m*cap) skew guard — see bucket_pairs docstring."""
    ids = np.unique(t["doc_id"].to_numpy())  # sorted, deduped
    m = int(ids.size)
    if m < 2:
        a_arr = b_arr = np.empty(0, np.int64)
    elif m <= cap:
        a_arr, b_arr = _triu_pairs(ids)
    else:
        band = int(t["band"][0].as_py())
        g = -(-m // cap)  # ceil
        # band-salted splitmix64 finalizer: different bands split the
        # same degenerate clique independently, so cross-sub-bucket
        # pairs recover with prob ~1-(1-1/g)^n_bands across the bands.
        x = ids.astype(np.uint64) + np.uint64(band + 1) * _SPLIT_GOLDEN
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
        sub = (x % np.uint64(g)).astype(np.int64)
        import logging
        logging.getLogger(__name__).warning(
            "LSH bucket skew guard: band=%d bucket size m=%d > cap=%d; "
            "split into %d sub-buckets (within-sub pairs only)",
            band, m, cap, g)
        parts_a, parts_b = [], []
        order = np.argsort(sub, kind="stable")
        sids, ssub = ids[order], sub[order]
        bounds = np.flatnonzero(np.diff(ssub)) + 1
        for grp in np.split(sids, bounds):
            if grp.size >= 2:
                x, y = _triu_pairs(np.sort(grp))
                parts_a.append(x)
                parts_b.append(y)
        a_arr = (np.concatenate(parts_a) if parts_a
                 else np.empty(0, np.int64))
        b_arr = (np.concatenate(parts_b) if parts_b
                 else np.empty(0, np.int64))
    pb = ((a_arr * 1000003 + b_arr) % 64).astype(np.int32)
    return pa.table({"a": pa.array(a_arr, pa.int64()),
                     "b": pa.array(b_arr, pa.int64()),
                     "pb": pa.array(pb, pa.int32())})

# per-worker chunk-set table for the multi-word broadcast verify
# (one corpus at a time; keyed by the plasma object's identity)
_CHUNKSET_CACHE: dict[int, dict] = {}


def minhash_dedup(sf_dir: str, tau: float = MINHASH_TAU,
                  broadcast_bytes: int = MINHASH_BROADCAST_BYTES,
                  domain_mod: int | None = 5) -> pd.DataFrame:
    """MinHash+LSH near-dup pairs over token SETS, verified with exact
    Jaccard >= tau. The registered query restricts the domain to
    doc_id % 5 == 0 (the synthetic corpus is dense in near-dups; the
    restriction keeps the O(n^2) SQL oracle's verified-pair count O(n) —
    an oracle-cost cap, not an engine limit: the full-domain recall test
    runs with domain_mod=None on a planted-pair corpus).

    `broadcast_bytes` gates the verification data path (see inline
    comments); tests force the partitioned path with broadcast_bytes=0."""
    def domain(t: pa.Table) -> pa.Table:
        if domain_mod is None:
            return t
        return t.filter(pa.array(t["doc_id"].to_numpy() % domain_mod == 0))

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
        deduped and tagged with a pair-hash bucket for the global dedup.

        Skew guard (LSH_BUCKET_CAP): a degenerate bucket — mass-identical
        boilerplate docs landing in ONE band bucket — would expand O(m^2)
        pairs inside a single group task. Buckets over the cap are split
        by a band-salted secondary hash into g = ceil(m/CAP) sub-buckets
        and only within-sub-bucket pairs are emitted, bounding per-task
        output at O(m * CAP). Identical docs collide in ALL 32 bands and
        the salt differs per band, so a cross-sub-bucket pair gets an
        independent ~1/g chance per band: clique recall stays
        ~1-(1-1/g)^32 (>=0.96 for g<=10). The split is logged — no
        silent caps."""
        return _bucket_pairs_guarded(t)

    def local_dedup(t: pa.Table) -> pa.Table:
        # combiner: a 0.9-Jaccard pair matches most of its 32 bands, so
        # batch-local dedup slashes the rows entering the pb exchange
        df = t.to_pandas().drop_duplicates(["a", "b"])
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = (docs.map_batches(bands, batch_format="pyarrow")
            .groupby(["band", "band_hash"])
            .map_groups(bucket_pairs, batch_format="pyarrow")
            .map_batches(local_dedup, batch_format="pyarrow"))

    # Verification side = the corpus as sorted 64-bit token-hash arrays
    # (tokenized once per doc, a few hundred bytes each; hash identity
    # keeps set sizes — and thus exact Jaccard values — equal to string
    # sets). The gated verify is shared with the prefix-filter set-
    # similarity join (_pair_jaccard_verify below).
    def tok_table(t: pa.Table) -> pa.Table:
        df = t.select(["doc_id", "text"]).to_pandas()
        toks = [np.sort(_token_hashes(x)).tobytes() for x in df["text"]]
        return pa.table({"doc_id": pa.array(df["doc_id"], pa.int64()),
                         "toks": pa.array(toks, pa.binary())})

    return _pair_jaccard_verify(
        cand, docs.map_batches(tok_table, batch_format="pyarrow"),
        tau, broadcast_bytes)


def _pair_jaccard_verify(cand, toks_ds: ray.data.Dataset, tau: float,
                         broadcast_bytes: int,
                         item_words: int = 1) -> pd.DataFrame:
    """Exact-Jaccard verification of candidate pairs against a
    (doc_id, sorted-hash-array) table — each set item is `item_words`
    uint64 words (1 = 64-bit hashes, minhash's contract; 2 = full
    128-bit md5, collision-free at any corpus scale, jaccard_join's
    EXACT contract). Two data paths, gated on the verification side's
    actual size (the broadcast-vs-partition rule for joins; tests force
    the partitioned path with broadcast_bytes=0):
      small side  -> ray.put the compact hash table once, verify per
                     pair-bucket with dict lookups (one shuffle total)
      large side  -> co-partitioned two-sided attach: pairs explode into
                     membership rows keyed by doc_id, union with the
                     token table, bucket by doc_id, vectorized merge,
                     regroup by pair bucket — nothing corpus-sized ever
                     reaches the driver.
    `cand` rows carry (a, b, pb) where pb = (a*1000003 + b) % 64; dup
    candidate rows are fine (deduped inside each pair bucket)."""

    item_bytes = 8 * item_words

    def chunk_set(buf: bytes) -> frozenset:
        return frozenset(buf[i : i + item_bytes]
                         for i in range(0, len(buf), item_bytes))

    def jaccard_sets(A: frozenset, B: frozenset) -> float:
        inter = len(A & B)
        return inter / (len(A) + len(B) - inter)

    def jaccard_of(buf_a: bytes, buf_b: bytes) -> float:
        if item_words == 1:
            A = np.frombuffer(buf_a, dtype=np.uint64)
            B = np.frombuffer(buf_b, dtype=np.uint64)
            inter = np.intersect1d(A, B, assume_unique=True).size
            return inter / (A.size + B.size - inter)
        # multi-word items: byte-chunk set intersection (a lexsort-based
        # row-unique here was the verify hot loop — ~10x slower per pair)
        return jaccard_sets(chunk_set(buf_a), chunk_set(buf_b))

    def dedup_pairs(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates(["a", "b"])
        return pa.Table.from_pandas(df[["a", "b"]], preserve_index=False)

    toks_ds = toks_ds.materialize()
    small_side = toks_ds.size_bytes() <= broadcast_bytes

    if small_side:
        tok_map = {r["doc_id"]: r["toks"] for r in toks_ds.take_all()}
        tref = ray.put(tok_map)

        cache_key = tref.hex()  # object-ref identity: unique per corpus

        def lookup_of():
            tm = ray.get(tref)
            if item_words == 1:
                return tm
            # multi-word verify compares chunk SETS: build them once per
            # worker, keyed by the object REF (an id()/address key can be
            # reused by a later allocation and serve a stale corpus)
            c = _CHUNKSET_CACHE.get(cache_key)
            if c is None:
                c = {k: chunk_set(v) for k, v in tm.items()}
                _CHUNKSET_CACHE.clear()  # one corpus at a time per worker
                _CHUNKSET_CACHE[cache_key] = c
            return c

        def verify_broadcast(t: pa.Table) -> pa.Table:
            tm = lookup_of()
            df = t.to_pandas().drop_duplicates(["a", "b"])
            rows = []
            if item_words == 1:
                for x, y in zip(df["a"], df["b"]):
                    j = jaccard_of(tm[x], tm[y])
                    if j >= tau:
                        rows.append({"a": int(x), "b": int(y), "jaccard": j})
            else:
                for x, y in zip(df["a"], df["b"]):
                    j = jaccard_sets(tm[x], tm[y])
                    if j >= tau:
                        rows.append({"a": int(x), "b": int(y), "jaccard": j})
            return pa.Table.from_pylist(rows, schema=pa.schema(
                [("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]))

        out = (cand.groupby("pb")
               .map_groups(verify_broadcast, batch_format="pyarrow")
               .to_pandas())
        return out.sort_values(["a", "b"]).reset_index(drop=True)

    # A pair may arrive through many candidate routes, so dedup per
    # pair-bucket FIRST (pb is a function of (a, b): every copy lands in
    # the same group) — before any token data is attached.
    pairs = cand.groupby("pb").map_groups(dedup_pairs, batch_format="pyarrow")

    NB = 32  # doc-side partitions
    memb_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                             ("doc_id", pa.int64()), ("db", pa.int32()),
                             ("toks", pa.binary())])

    def explode(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        rows = pd.concat([
            pd.DataFrame({"a": df["a"], "b": df["b"], "doc_id": df[side]})
            for side in ("a", "b")
        ], ignore_index=True)
        rows["db"] = (rows["doc_id"] % NB).astype("int32")
        rows["toks"] = None
        return pa.Table.from_pandas(rows, preserve_index=False,
                                    schema=memb_schema)

    def tok_rows(t: pa.Table) -> pa.Table:
        df = t.to_pandas()  # already (doc_id, toks) from toks_ds
        df["a"] = -1  # sentinel: token-carrier row, not a membership
        df["b"] = -1
        df["db"] = (df["doc_id"] % NB).astype("int32")
        return pa.Table.from_pandas(df[["a", "b", "doc_id", "db", "toks"]],
                                    preserve_index=False, schema=memb_schema)

    both = pairs.map_batches(explode, batch_format="pyarrow").union(
        toks_ds.map_batches(tok_rows, batch_format="pyarrow"))

    def attach(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        tok = df[df["a"] < 0][["doc_id", "toks"]]
        mem = df[df["a"] >= 0][["a", "b", "doc_id"]]
        j = mem.merge(tok, on="doc_id", how="inner")
        j["side"] = np.where(j["doc_id"] == j["a"], "a", "b")
        j["pb"] = ((j["a"] * 1000003 + j["b"]) % 64).astype("int32")
        return pa.Table.from_pandas(
            j[["a", "b", "side", "toks", "pb"]], preserve_index=False)

    def verify(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        da = df[df["side"] == "a"][["a", "b", "toks"]].rename(columns={"toks": "ta"})
        db_ = df[df["side"] == "b"][["a", "b", "toks"]].rename(columns={"toks": "tb"})
        m = da.merge(db_, on=["a", "b"])
        rows = []
        for x, y, ta, tb in zip(m["a"], m["b"], m["ta"], m["tb"]):
            j = jaccard_of(ta, tb)
            if j >= tau:
                rows.append({"a": int(x), "b": int(y), "jaccard": j})
        return pa.Table.from_pylist(rows, schema=pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]))

    out = (both.groupby("db").map_groups(attach, batch_format="pyarrow")
           .groupby("pb").map_groups(verify, batch_format="pyarrow")
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


def _simhash64(text: str) -> int:
    """64-bit SimHash fingerprint (Charikar'02) over the token-hash set:
    all 64 bit-planes of all token hashes summed at once via byte view +
    unpackbits (little-endian bit i == (h >> i) & 1)."""
    th = _token_hashes(text)
    if th.size == 0:
        return 0
    bits = np.unpackbits(th.view(np.uint8).reshape(th.size, 8),
                         axis=1, bitorder="little")
    acc = 2 * bits.sum(axis=0).astype(np.int64) - th.size
    return int(sum(1 << int(i) for i in np.nonzero(acc > 0)[0]))


def simhash_clusters(sf_dir: str) -> pd.DataFrame:
    """64-bit SimHash per doc + 16-bit prefix bucket — the hamming-distance
    blocking key. Rows-only (no SQL equivalent)."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def sim(t: pa.Table) -> pa.Table:
        rows = []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sh = _simhash64(text)
            rows.append({"doc_id": doc_id, "simhash": sh % (1 << 63),
                         "bucket": sh >> 48})
        return pa.Table.from_pylist(rows, schema=pa.schema(
            [("doc_id", pa.int64()), ("simhash", pa.int64()), ("bucket", pa.int64())]))

    return (ds.map_batches(sim, batch_format="pyarrow").to_pandas()
            .sort_values("doc_id").reset_index(drop=True))


SIMHASH_K = 3           # max hamming distance for a "near-dup" pair
SIMHASH_ROTS = 4        # 16-bit chunks: k+1 blocks -> pigeonhole recall 1.0


def simhash_hamming_pairs(sf_dir: str, k: int = SIMHASH_K) -> pd.DataFrame:
    """Verified hamming<=k SimHash pairs via multi-probe chunk rotation
    (the Manku/Jain/Das Sarma WWW'07 blocking scheme): the 64-bit
    fingerprint splits into SIMHASH_ROTS 16-bit chunks used as rotation
    bucket keys — a pair within hamming k<=3 differs in at most 3 chunks,
    so by pigeonhole it collides in at least one of the 4 tables (FULL
    recall, no probabilistic miss). Each (rot, chunk) bucket verifies its
    candidates with an exact vectorized popcount; duplicates across
    rotations collapse in a pair-hash bucket dedup. Exchange rows are
    (rot, bucket, doc_id, fp) INTS only. Partitioning note: bucket size is
    data-dependent — a degenerate corpus (all-identical prefixes) needs a
    wider chunk or a salted secondary key. Rows-only query; recall is
    pinned against brute force in tests."""
    if k >= SIMHASH_ROTS:
        # pigeonhole guarantee needs k+1 chunk tables: a distance-k pair
        # can differ in one bit per chunk, colliding in NO table — silent
        # recall loss, so refuse rather than degrade
        raise ValueError(
            f"k={k} needs >= {k + 1} chunk tables (have {SIMHASH_ROTS}); "
            "widen SIMHASH_ROTS (smaller chunks) for larger k")
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def fp_rows(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
        fp = np.array([_simhash64(x) for x in t["text"].to_pylist()],
                      dtype=np.uint64)
        rot = np.repeat(np.arange(SIMHASH_ROTS, dtype=np.int32), ids.size)
        chunks = np.concatenate([
            ((fp >> np.uint64(16 * r)) & np.uint64(0xFFFF)).astype(np.int64)
            for r in range(SIMHASH_ROTS)])
        return pa.table({"rot": pa.array(rot),
                         "bucket": pa.array(chunks),
                         "doc_id": pa.array(np.tile(ids, SIMHASH_ROTS)),
                         "fp": pa.array(np.tile(fp.view(np.int64),
                                                SIMHASH_ROTS))})

    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                             ("hamming", pa.int64()), ("pb", pa.int32())])

    def bucket_verify(t: pa.Table) -> pa.Table:
        if t.num_rows < 2 or "doc_id" not in t.column_names:
            return pair_schema.empty_table()
        df = (t.select(["doc_id", "fp"]).to_pandas()
              .drop_duplicates("doc_id").sort_values("doc_id"))
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        fps = df["fp"].to_numpy(dtype=np.int64).view(np.uint64)
        xi, xj = np.triu_indices(ids.size, 1)
        x = (fps[xi] ^ fps[xj]).view(np.uint64)
        ham = np.unpackbits(x.view(np.uint8).reshape(x.size, 8),
                            axis=1).sum(axis=1).astype(np.int64)
        keep = ham <= k
        a, b = ids[xi][keep], ids[xj][keep]
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "hamming": pa.array(ham[keep]),
                         "pb": pa.array(((a * 1000003 + b) % 64)
                                        .astype(np.int32))})

    def dedup_pb(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pair_schema.empty_table()
        df = t.to_pandas().drop_duplicates(["a", "b"])
        return pa.Table.from_pandas(df[["a", "b", "hamming", "pb"]],
                                    preserve_index=False, schema=pair_schema)

    out = (ds.map_batches(fp_rows, batch_format="pyarrow")
           .groupby(["rot", "bucket"]).map_groups(bucket_verify,
                                                  batch_format="pyarrow")
           .groupby("pb").map_groups(dedup_pb, batch_format="pyarrow")
           .to_pandas())
    if out.empty:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64"),
                             "hamming": pd.Series(dtype="int64")})
    return (out[["a", "b", "hamming"]]
            .sort_values(["a", "b"]).reset_index(drop=True))


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
    """Embedding-cosine near-dup pairs (all pairs a<b with cosine >= tau),
    EXACT, as a distributed block x block matmul: the corpus is normalized
    per batch and materialized in the OBJECT STORE (never on the driver);
    each task pulls two block refs zero-copy and scores one block pair.
    Work is O(N^2 / B^2) tasks over B blocks — the exact all-pairs shape;
    the approximate scale path for higher tau is the LSH family above."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    def norm_block(t: pa.Table) -> pa.Table:
        m = emb_matrix(t["embedding"])
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        return pa.table({"vec_id": t["vec_id"],
                         "embedding": pa.array(list(m))})

    blocks = ds.map_batches(norm_block, batch_format="pyarrow",
                            batch_size=4096).materialize()
    refs = blocks.to_arrow_refs()  # refs only; blocks stay in shared memory
    nb = len(refs)
    # pair enumeration stays distributed: a range over linearized
    # upper-triangle indices (incl. diagonal), decoded per batch — the
    # driver never builds the O(B^2) pair list. The linearization is
    # I-MAJOR (k = row_start(i) + (j - i), so k, k+1, ... share the same
    # left block i until the row ends): consecutive pairs in a batch — and
    # consecutive batches on a real cluster — reuse one resident left
    # block instead of fetching a fresh pair of blocks per pair, cutting
    # cross-node object fetches to ~1 right-block per pair + 1 left-block
    # per row run. Pinned by test_exact_pair_enumeration_is_i_major.
    pair_ds = ray.data.range(nb * (nb + 1) // 2)

    def _row_start(i: np.ndarray) -> np.ndarray:
        return i * nb - i * (i - 1) // 2

    def score(t: pa.Table) -> pa.Table:
        out_a: list[int] = []
        out_b: list[int] = []
        ks = np.asarray(t["id"].to_pylist(), dtype=np.int64)
        # invert k = row_start(i) + (j - i); float sqrt then integer fixup
        fi = np.floor(((2 * nb + 1)
                       - np.sqrt(float(2 * nb + 1) ** 2 - 8.0 * ks))
                      / 2).astype(np.int64)
        fi = np.where(_row_start(fi + 1) <= ks, fi + 1, fi)
        fi = np.where(_row_start(fi) > ks, fi - 1, fi)
        fj = ks - _row_start(fi) + fi
        last_i = -1  # i-major runs: left block resolved/decoded once per run
        ids_i = mi = None
        for i, j in zip(fi.tolist(), fj.tolist()):
            if i != last_i:
                ti = ray.get(refs[i])
                ids_i = np.asarray(ti["vec_id"].to_pylist(), dtype=np.int64)
                mi = emb_matrix(ti["embedding"])
                last_i = i
            tj = ray.get(refs[j])
            ids_j = np.asarray(tj["vec_id"].to_pylist(), dtype=np.int64)
            mj = emb_matrix(tj["embedding"])
            sims = mi @ mj.T
            xi, xj = np.nonzero(sims >= EMB_TAU)
            if i == j:  # upper triangle only: each unordered pair once
                keep = xi < xj
                xi, xj = xi[keep], xj[keep]
            ia, ib = ids_i[xi], ids_j[xj]
            out_a.extend(np.minimum(ia, ib).tolist())
            out_b.extend(np.maximum(ia, ib).tolist())
        return pa.table({"a": pa.array(out_a, pa.int64()),
                         "b": pa.array(out_b, pa.int64())})

    out = pair_ds.map_batches(score, batch_format="pyarrow",
                              batch_size=4).to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


EMBEDDING_DUP_SQL = f"""
SELECT a.vec_id AS a, b.vec_id AS b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= {EMB_TAU}
ORDER BY a, b
"""


# ----------------------------------------- embedding near-dup, LSH path

RP_BITS = 8     # sign bits per band key
RP_BANDS = 16   # bands; recall ≈ 1-(1-p^RP_BITS)^RP_BANDS, p = 1-θ/π
EMB_NEAR_TAU = 0.9


EMB_LSH_BROADCAST_BYTES = 64 << 20  # vector-table broadcast gate


def embedding_dup_pairs_lsh(sf_dir: str, tau: float = EMB_NEAR_TAU,
                            broadcast_bytes: int = EMB_LSH_BROADCAST_BYTES,
                            ) -> pd.DataFrame:
    """Approximate embedding near-dup pairs via sign-random-projection LSH
    (Charikar'02): each normalized vector hashes to RP_BANDS bucket keys of
    RP_BITS sign bits; only intra-bucket pairs become candidates, so the
    all-pairs matmul never happens — the 100-TB path for HIGH-similarity
    near-dup (tau=0.9 -> ~99.6% expected recall at 8x16). The band
    exchange carries (band, key, vec_id) INTS only. Verification is
    size-gated like every join in this repo: a small vector table is
    ray.put once and pairs verify per pair-bucket with one einsum; a
    large one attaches vectors by the co-partitioned two-sided join
    (the minhash verify shape). Both paths are batched matmuls, no
    per-pair Python dots; tests pin them equal with broadcast_bytes=0.
    Misses are the LSH recall loss, measured against the exact operator in
    tests. Rows-only query (approximate by design)."""
    rng = np.random.default_rng(23)
    # one fixed projection matrix for all bands, deterministic
    proj = rng.standard_normal((64, RP_BITS * RP_BANDS))
    pref = ray.put(proj)

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    def keys(t: pa.Table) -> pa.Table:
        P = ray.get(pref)
        m = emb_matrix(t["embedding"])
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        signs = (m @ P) > 0  # (n, bits*bands)
        vid = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        weights = (1 << np.arange(RP_BITS)).astype(np.int64)
        bands = np.repeat(np.arange(RP_BANDS, dtype=np.int32), len(vid))
        ks = np.concatenate([
            signs[:, b * RP_BITS:(b + 1) * RP_BITS].astype(np.int64) @ weights
            for b in range(RP_BANDS)])
        vids = np.tile(vid, RP_BANDS)
        # coarse exchange group: one Ray group holds many (band, key)
        # buckets, so the shuffle has ~256 partitions instead of one task
        # per LSH bucket (per-group dispatch overhead dominated the stage)
        # keep the HIGH bits of the 31-bit Knuth product — the low bits
        # of x*c are a fixed permutation of x's low bits (no mixing)
        kb = (((ks.astype(np.int64) * np.int64(RP_BANDS)
                + bands.astype(np.int64)) * np.int64(2654435761)
               % np.int64(1 << 31)) >> np.int64(23)) & np.int64(255)
        return pa.table({"kb": pa.array(kb.astype(np.int32)),
                         "band": pa.array(bands),
                         "key": pa.array(ks),
                         "vec_id": pa.array(vids)})

    def bucket_pairs(t: pa.Table) -> pa.Table:
        """Expand intra-bucket pairs for every (band, key) bucket inside
        one coarse group — a local sort + boundary walk, no per-bucket
        Ray task."""
        df = t.to_pandas()
        a_, b_ = [], []
        for _, g in df.groupby(["band", "key"], sort=False):
            vid = np.unique(g["vec_id"].to_numpy(dtype=np.int64))
            if vid.size < 2:
                continue
            xi, xj = np.triu_indices(vid.size, 1)
            a_.append(vid[xi])
            b_.append(vid[xj])
        if not a_:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "pb": pa.array([], pa.int32())})
        a = np.concatenate(a_)
        b = np.concatenate(b_)
        return pa.table({"a": pa.array(a),
                         "b": pa.array(b),
                         "pb": pa.array(((a * 1000003 + b) % 64).astype(np.int32))})

    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    def dedup_pb(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pair_schema.empty_table()  # empty blocks lose schema
        df = t.to_pandas().drop_duplicates(["a", "b"])
        return pa.Table.from_pandas(df[["a", "b"]], preserve_index=False,
                                    schema=pair_schema)

    cand = (ds.map_batches(keys, batch_format="pyarrow")
            .groupby("kb").map_groups(bucket_pairs, batch_format="pyarrow"))

    def vec_table(t: pa.Table) -> pa.Table:
        m = emb_matrix(t["embedding"])
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        return pa.table({
            "vec_id": pa.array(t["vec_id"].to_pylist(), pa.int64()),
            "vec": pa.array([v.tobytes() for v in m], pa.binary())})

    vecs_ds = ds.map_batches(vec_table, batch_format="pyarrow").materialize()

    if vecs_ds.size_bytes() <= broadcast_bytes:
        rows = vecs_ds.take_all()
        ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
        mat = np.vstack([np.frombuffer(r["vec"], dtype=np.float64)
                         for r in rows])
        order = np.argsort(ids)
        vref = ray.put((ids[order], mat[order]))

        def verify_broadcast(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "a" not in t.column_names:
                return pair_schema.empty_table()
            ids_s, m_s = ray.get(vref)
            a = t["a"].to_numpy()
            b = t["b"].to_numpy()
            sims = np.einsum("ij,ij->i",
                             m_s[np.searchsorted(ids_s, a)],
                             m_s[np.searchsorted(ids_s, b)])
            keep = sims >= tau
            return pa.table({"a": pa.array(a[keep], pa.int64()),
                             "b": pa.array(b[keep], pa.int64())})

        # verify straight off the candidate stream (duplicate pair rows
        # from multiple band collisions just re-verify — one einsum row —
        # which is cheaper than a pb-dedup exchange; the surviving set is
        # output-sized, so the final dedup is a driver-side no-op)
        out = cand.map_batches(verify_broadcast,
                               batch_format="pyarrow").to_pandas()
        if out.empty:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        return (out.drop_duplicates(["a", "b"])
                .sort_values(["a", "b"]).reset_index(drop=True))

    # the attach volume is pairs x vectors, so dedup per pair-bucket FIRST
    pairs = cand.groupby("pb").map_groups(dedup_pb, batch_format="pyarrow")

    # co-partitioned vector attach (vectors cross once per membership)
    NB = 32
    memb_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                             ("vec_id", pa.int64()), ("vb", pa.int32()),
                             ("vec", pa.binary())])

    def explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return memb_schema.empty_table()
        df = t.to_pandas()
        rows = pd.concat([
            pd.DataFrame({"a": df["a"], "b": df["b"], "vec_id": df[side]})
            for side in ("a", "b")
        ], ignore_index=True)
        rows["vb"] = (rows["vec_id"] % NB).astype("int32")
        rows["vec"] = None
        return pa.Table.from_pandas(rows, preserve_index=False,
                                    schema=memb_schema)

    def vec_rows(t: pa.Table) -> pa.Table:
        df = t.to_pandas()  # already (vec_id, vec) from vecs_ds
        df["a"] = -1
        df["b"] = -1
        df["vb"] = (df["vec_id"] % NB).astype("int32")
        return pa.Table.from_pandas(df[["a", "b", "vec_id", "vb", "vec"]],
                                    preserve_index=False, schema=memb_schema)

    both = pairs.map_batches(explode, batch_format="pyarrow").union(
        vecs_ds.map_batches(vec_rows, batch_format="pyarrow"))

    def attach(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.schema([("a", pa.int64()), ("b", pa.int64()),
                              ("side", pa.string()), ("vec", pa.binary()),
                              ("pb", pa.int32())]).empty_table()
        df = t.to_pandas()
        vecs = df[df["a"] < 0][["vec_id", "vec"]]
        mem = df[df["a"] >= 0][["a", "b", "vec_id"]]
        j = mem.merge(vecs, on="vec_id", how="inner")
        j["side"] = np.where(j["vec_id"] == j["a"], "a", "b")
        j["pb"] = ((j["a"] * 1000003 + j["b"]) % 64).astype("int32")
        return pa.Table.from_pandas(j[["a", "b", "side", "vec", "pb"]],
                                    preserve_index=False)

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pair_schema.empty_table()
        df = t.to_pandas()
        da = df[df["side"] == "a"][["a", "b", "vec"]].rename(columns={"vec": "va"})
        db_ = df[df["side"] == "b"][["a", "b", "vec"]].rename(columns={"vec": "vb_"})
        m = da.merge(db_, on=["a", "b"])
        if m.empty:
            return pair_schema.empty_table()
        A = np.vstack([np.frombuffer(v, dtype=np.float64) for v in m["va"]])
        B = np.vstack([np.frombuffer(v, dtype=np.float64) for v in m["vb_"]])
        keep = np.einsum("ij,ij->i", A, B) >= tau
        return pa.table({"a": pa.array(m["a"].to_numpy()[keep], pa.int64()),
                         "b": pa.array(m["b"].to_numpy()[keep], pa.int64())})

    out = (both.groupby("vb").map_groups(attach, batch_format="pyarrow")
           .groupby("pb").map_groups(verify, batch_format="pyarrow")
           .to_pandas())
    if out.empty:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64")})
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def embedding_dup_pairs_lsh_q(sf_dir: str) -> pd.DataFrame:
    """Registered rows-only query for the LSH near-dup scale path, run at
    the EXACT operator's tau (0.35) so the driver corpus yields pairs
    (its max inter-vector cosine is ~0.51 — tau 0.9 would be vacuous).
    Every returned pair is exact-cosine verified >= tau, i.e. a subset of
    embedding_dup_pairs with precision 1.0; the deficit vs the exact pair
    set is the LSH recall loss, asserted in tests (planted-pair fixture +
    subset property)."""
    return embedding_dup_pairs_lsh(sf_dir, tau=EMB_TAU)


# ------------------------------------------- SemDeDup (cluster-pruned)


SEMDEDUP_TARGET = 1024   # target vectors per (sub-)cluster
SEMDEDUP_CAP = 4096      # split any cluster above this before the pairwise
SEMDEDUP_KMAX = 1 << 16  # global k ceiling; deeper structure is hierarchical
SEMDEDUP_DEPTH = 3       # sub-k-means rounds before the tiled fallback
SEMDEDUP_TILE = 2048     # pairwise matmul tile edge (32 MB float64 / tile)


def _semdedup_assign(sf_dir: str, target: int, cap: int,
                     max_depth: int) -> tuple[np.ndarray, np.ndarray]:
    """(sorted vec_ids, cluster labels): global fixed-point k-means with k
    scaled to corpus size (ceil(N/target), clamped to [8, SEMDEDUP_KMAX]),
    then refine_oversized splits every cluster above `cap` — hierarchical
    k-means, so per-pairwise-task group size is bounded by `cap` except
    for provably unsplittable (identical-vector) clusters."""
    import pyarrow.parquet as _pq

    from ssufid_ray.stages.clustering import (kmeans_clusters,
                                              refine_oversized)

    n = _pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    k0 = min(SEMDEDUP_KMAX, max(8, -(-n // target)), n)
    assign = kmeans_clusters(sf_dir, k=k0)  # sorted by vec_id
    ids = assign["vec_id"].to_numpy().astype(np.int64)
    labels = assign["cluster"].to_numpy().astype(np.int64)
    labels = refine_oversized(sf_dir, ids, labels, cap=cap, target=target,
                              max_depth=max_depth)
    return ids, labels


def semdedup_pairs(sf_dir: str, tau: float = EMB_TAU,
                   target: int = SEMDEDUP_TARGET, cap: int = SEMDEDUP_CAP,
                   max_depth: int = SEMDEDUP_DEPTH,
                   tile: int = SEMDEDUP_TILE) -> pd.DataFrame:
    """SemDeDup-style near-dup pairs (Abbas et al. 2023, arXiv 2303.09540,
    public): k-means partitions the embedding space, then exact cosine
    pairs are computed only WITHIN clusters — O(sum n_c^2) instead of the
    exact baseline's O(N^2), the standard semantic-dedup scale path for
    moderate tau where sign-RP banding degenerates (see
    embedding_dup_pairs_lsh's regime note).

    Precision is 1.0 by construction (every emitted pair is an exact
    cosine >= tau); recall deficit vs embedding_dup_pairs is exactly the
    cross-cluster pair mass, pinned in tests (subset property + planted
    near-identical dups, which share a nearest centroid by definition,
    recalled at 1.0). Registered rows-only: k-means is not
    SQL-expressible; the assignment itself is bit-pinned elsewhere.

    100-TB shape: k scales with corpus size (ceil(N/target)); any cluster
    the global pass leaves above `cap` is sub-k-means split
    (clustering.refine_oversized — all oversized parents in one
    distributed pass per round, int-only exchanges) so no pairwise task
    materializes an unbounded group; the within-cluster matmul is TILED
    (SEMDEDUP_TILE edge) so even an unsplittable identical-vector cluster
    runs in bounded memory. The assignment broadcast is one int per
    vector — beyond broadcast range it becomes a co-partitioned int join
    on vec_id (the minhash-verify exchange shape)."""
    ids_sorted, labels = _semdedup_assign(sf_dir, target, cap, max_depth)
    aref = ray.put((ids_sorted, labels.astype(np.int32)))
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    def tag(t: pa.Table) -> pa.Table:
        nodes, labs = ray.get(aref)  # sorted-array searchsorted, no dict
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        ix = np.searchsorted(nodes, vid)
        ix[ix >= nodes.size] = 0
        return t.append_column("cluster", pa.array(labs[ix], pa.int32()))

    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                             ("cluster", pa.int32())])

    def cluster_pairs(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "vec_id" not in t.column_names:
            return pair_schema.empty_table()
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = emb_matrix(t["embedding"])
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        order = np.argsort(ids)  # id-ascending: tile order-invariant
        ids, m = ids[order], m[order]
        n, T = ids.size, tile
        outs_a, outs_b = [], []
        for i0 in range(0, n, T):
            mi = m[i0: i0 + T]
            for j0 in range(i0, n, T):
                sims = mi @ m[j0: j0 + T].T
                if i0 == j0:
                    xi, xj = np.nonzero(np.triu(sims >= tau, k=1))
                else:
                    xi, xj = np.nonzero(sims >= tau)
                if xi.size:
                    outs_a.append(ids[i0 + xi])
                    outs_b.append(ids[j0 + xj])
        if not outs_a:
            return pair_schema.empty_table()
        ia = np.concatenate(outs_a)
        ib = np.concatenate(outs_b)
        return pa.table({"a": pa.array(np.minimum(ia, ib), pa.int64()),
                         "b": pa.array(np.maximum(ia, ib), pa.int64()),
                         "cluster": pa.array(
                             np.full(ia.size, int(t["cluster"][0].as_py()),
                                     dtype=np.int32), pa.int32())})

    out = (ds.map_batches(tag, batch_format="pyarrow")
           .groupby("cluster")
           .map_groups(cluster_pairs, batch_format="pyarrow")
           .to_pandas())
    if out.empty:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64"),
                             "cluster": pd.Series(dtype="int32")})
    return out.sort_values(["a", "b"]).reset_index(drop=True)


# ------------------------------------------- duplicated-substring coverage

DUPGRAM_L = 8            # tokens per exact gram (suffix-array-dedup analogue)
DUPGRAM_BUCKETS = 64     # gram-hash exchange width


def dup_gram_stats(sf_dir: str, L: int = DUPGRAM_L) -> pd.DataFrame:
    """Exact duplicated-substring coverage per document: hash every
    L-token gram, count occurrences corpus-wide, and report per doc how
    many of its gram starts belong to a gram that occurs >= 2 times
    anywhere in the corpus (the substring-dedup primitive from
    suffix-array training-data dedup, at fixed gram length so it is
    SQL-oracle-able).

    Scale shape: the only corpus-sized exchange carries (bucket, hi, lo,
    doc_id) int rows — gram TEXT never leaves the scan stage. Grams are
    keyed by their full 128-bit md5 (two int64 columns), so engine counts
    equal the oracle's count-by-string exactly (no 64-bit birthday risk
    at 100-TB gram cardinalities); the bucket key is 6 bits of hi. Each
    bucket counts its grams and collapses to per-doc partial dup counts
    before the second (doc-sized) exchange. The final result IS per-doc,
    so the driver holds only the answer."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def gram_rows(t: pa.Table) -> pa.Table:
        doc_ids: list[int] = []
        his: list[int] = []
        los: list[int] = []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = text.split()
            for i in range(len(toks) - L + 1):
                d = hashlib.md5(" ".join(toks[i : i + L]).encode()).digest()
                his.append(int.from_bytes(d[:8], "big", signed=True))
                los.append(int.from_bytes(d[8:], "big", signed=True))
                doc_ids.append(doc_id)
        hi = np.asarray(his, dtype=np.int64)
        return pa.table({
            "b": pa.array((hi & (DUPGRAM_BUCKETS - 1)).astype("int32")),
            "hi": pa.array(hi, pa.int64()),
            "lo": pa.array(np.asarray(los, dtype=np.int64), pa.int64()),
            "doc_id": pa.array(np.asarray(doc_ids, dtype=np.int64), pa.int64()),
        })

    grams = ds.map_batches(gram_rows, batch_format="pyarrow")

    def count_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        occ = df.groupby(["hi", "lo"])["doc_id"].transform("size")
        g = (df.assign(n_grams=1, n_dup=(occ >= 2).astype("int64"))
             .groupby("doc_id", as_index=False)[["n_grams", "n_dup"]].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (grams.groupby("b").map_groups(count_bucket, batch_format="pyarrow")
           .groupby("doc_id")
           .aggregate(Sum("n_grams", alias_name="n_grams"),
                      Sum("n_dup", alias_name="n_dup"))
           .to_pandas())
    out["n_grams"] = out["n_grams"].astype("int64")
    out["n_dup"] = out["n_dup"].astype("int64")
    out["dup_rate"] = out["n_dup"].to_numpy() / out["n_grams"].to_numpy()
    return out.sort_values("doc_id").reset_index(drop=True)


DUP_GRAM_STATS_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(tk[i + 1 : i + {DUPGRAM_L}], ' ') AS g
  FROM toks, LATERAL (SELECT unnest(range(len(tk) - {DUPGRAM_L} + 1)) AS i) r
  WHERE len(tk) >= {DUPGRAM_L}
),
cnt AS (SELECT g, count(*) AS c FROM grams GROUP BY g)
SELECT doc_id, count(*) AS n_grams,
       coalesce(sum(CASE WHEN c >= 2 THEN 1 END), 0)::BIGINT AS n_dup,
       (coalesce(sum(CASE WHEN c >= 2 THEN 1 END), 0)::DOUBLE / count(*)) AS dup_rate
FROM grams JOIN cnt USING (g)
GROUP BY doc_id ORDER BY doc_id
"""


# --------------------------------- exact set-similarity join (prefix filter)

SSJ_TAU_NUM, SSJ_TAU_DEN = 3, 10   # tau = 0.3, kept integer for prefix math
SSJ_N = 3                          # tokens per shingle
SSJ_BROADCAST_BYTES = 64_000_000


def _shingle_hashes(text: str, n: int = SSJ_N) -> np.ndarray:
    """(m, 2) uint64 rows = full 128-bit md5 per DISTINCT shingle, so the
    verify's set sizes equal string-set sizes exactly at any corpus
    scale (no 64-bit birthday risk — the dup_gram_stats standard). The
    candidate path may key on either word alone: a collision there only
    merges buckets (extra candidates), never loses a true pair."""
    toks = text.split()
    grams = {" ".join(toks[i : i + n]) for i in range(max(1, len(toks) - n + 1))}
    buf = b"".join(hashlib.md5(g.encode()).digest() for g in grams)
    return np.frombuffer(buf, dtype=np.uint64).reshape(-1, 2)


def jaccard_join(sf_dir: str,
                 broadcast_bytes: int = SSJ_BROADCAST_BYTES) -> pd.DataFrame:
    """EXACT set-similarity self-join (AllPairs/PPJoin prefix filtering):
    all document pairs with shingle-set Jaccard >= tau, no approximation —
    the deterministic complement of minhash_dedup (which trades recall
    for fewer candidates). Prefix lemma: order every doc's shingles by a
    single global order (document frequency ascending, rarest first,
    ties by hash); two sets with J >= tau must collide inside their
    prefixes of length |s| - ceil(tau*|s|) + 1, so emitting ONLY prefix
    shingles into the candidate exchange loses nothing — the full-domain
    SQL oracle equality is the recall proof. All exchanges carry int64
    rows; candidates are exact-verified through the same gated
    broadcast/co-partitioned machinery as minhash (_pair_jaccard_verify).
    """
    docs = read(sf_dir, "documents", ["doc_id", "text"])

    def shingle_rows(t: pa.Table) -> pa.Table:
        # candidate path keys on the md5 HIGH word only — collisions
        # merge buckets (extra candidates that the exact verify rejects),
        # never lose a true pair (see _shingle_hashes)
        ids, shs, ns = [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            h = _shingle_hashes(text)[:, 0]
            ids.extend([doc_id] * h.size)
            shs.append(h)
            ns.extend([h.size] * h.size)
        sh = np.concatenate(shs) if shs else np.array([], dtype=np.uint64)
        return pa.table({
            "sb": pa.array((sh & np.uint64(63)).astype("int32")),
            "sh": pa.array(sh.view(np.int64), pa.int64()),
            "doc_id": pa.array(np.asarray(ids, np.int64), pa.int64()),
            "n": pa.array(np.asarray(ns, np.int64), pa.int64())})

    rows = docs.map_batches(shingle_rows, batch_format="pyarrow")

    # pass 1 (shingle-bucket exchange): document frequency per shingle,
    # attached to every row inside its bucket group
    def attach_df(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["df"] = df.groupby("sh")["sh"].transform("size")
        df["db"] = (df["doc_id"] % 64).astype("int32")
        return pa.Table.from_pandas(
            df[["db", "sh", "doc_id", "n", "df"]], preserve_index=False)

    # pass 2 (doc exchange): per doc, keep the prefix under the global
    # (df asc, hash) order; prefix_len = n - ceil(tau*n) + 1, integer
    def prefix(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["doc_id", "df", "sh"])
        pos = df.groupby("doc_id").cumcount()
        n = df["n"].to_numpy()
        plen = n - (SSJ_TAU_NUM * n + SSJ_TAU_DEN - 1) // SSJ_TAU_DEN + 1
        keep = df[pos.to_numpy() < plen]
        out = keep[["sh", "doc_id", "n"]].copy()
        out["sb"] = (out["sh"] & 63).astype("int32")
        return pa.Table.from_pandas(out, preserve_index=False)

    # pass 3 (prefix-shingle exchange): candidate pairs per shingle with
    # the length filter |small| * DEN >= NUM * |large|
    def cand_pairs(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates(["sh", "doc_id"])
        a_, b_, pb_ = [], [], []
        for _, g in df.groupby("sh"):
            if len(g) < 2:
                continue
            recs = sorted(zip(g["doc_id"], g["n"]))
            for (x, nx), (y, ny) in itertools.combinations(recs, 2):
                lo, hi = (nx, ny) if nx <= ny else (ny, nx)
                if lo * SSJ_TAU_DEN >= SSJ_TAU_NUM * hi:
                    a_.append(x)
                    b_.append(y)
                    pb_.append((x * 1000003 + y) % 64)
        return pa.table({"a": pa.array(a_, pa.int64()),
                         "b": pa.array(b_, pa.int64()),
                         "pb": pa.array(pb_, pa.int32())})

    cand = (rows.groupby("sb").map_groups(attach_df, batch_format="pyarrow")
            .groupby("db").map_groups(prefix, batch_format="pyarrow")
            .groupby("sb").map_groups(cand_pairs, batch_format="pyarrow"))

    def sh_table(t: pa.Table) -> pa.Table:
        df = t.select(["doc_id", "text"]).to_pandas()
        toks = [_shingle_hashes(x).tobytes() for x in df["text"]]
        return pa.table({"doc_id": pa.array(df["doc_id"], pa.int64()),
                         "toks": pa.array(toks, pa.binary())})

    return _pair_jaccard_verify(
        cand, docs.map_batches(sh_table, batch_format="pyarrow"),
        SSJ_TAU_NUM / SSJ_TAU_DEN, broadcast_bytes, item_words=2)


JACCARD_JOIN_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents
),
s AS (
  SELECT doc_id, list_distinct(CASE WHEN len(tk) >= {SSJ_N}
    THEN list_transform(range(len(tk) - {SSJ_N} + 1),
                        i -> array_to_string(tk[i + 1 : i + {SSJ_N}], ' '))
    ELSE [array_to_string(tk, ' ')] END) AS sh
  FROM toks
)
SELECT a.doc_id AS a, b.doc_id AS b,
       len(list_intersect(a.sh, b.sh))::DOUBLE
       / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh)) * {SSJ_TAU_DEN}
      >= {SSJ_TAU_NUM} * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
ORDER BY a, b
"""


def dedup_substring_spans(sf_dir: str, L: int = DUPGRAM_L) -> pd.DataFrame:
    """Exact duplicated-substring REMOVAL accounting (the cut step of
    suffix-array training-data dedup at fixed gram length, completing
    dup_gram_stats' coverage stats): every L-token gram occurring >= 2
    times corpus-wide keeps only its first occurrence (min (doc_id,
    pos)); all other occurrences' token ranges are marked, overlapping
    marks merge into spans, and each document reports its removed/kept
    token counts and span count.

    Scale shape mirrors dup_gram_stats: the corpus-sized exchange
    carries (bucket, hi, lo, doc_id, pos) int rows keyed by the gram's
    full 128-bit md5 (gram text never leaves the scan); each hash
    bucket selects keepers and emits ONLY the marked occurrences
    (bounded by the dup mass); the doc-sized span merge is a vectorized
    cummax pass. Spans merge when they OVERLAP (pos < running end);
    adjacent spans stay separate — the SQL oracle pins the same rule."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def gram_rows(t: pa.Table) -> pa.Table:
        doc_ids: list[int] = []
        poss: list[int] = []
        his: list[int] = []
        los: list[int] = []
        for doc_id, text in zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist()):
            toks = text.split()
            for i in range(len(toks) - L + 1):
                d = hashlib.md5(" ".join(toks[i:i + L]).encode()).digest()
                his.append(int.from_bytes(d[:8], "big", signed=True))
                los.append(int.from_bytes(d[8:], "big", signed=True))
                doc_ids.append(doc_id)
                poss.append(i)
        hi = np.asarray(his, dtype=np.int64)
        return pa.table({
            "b": pa.array((hi & (DUPGRAM_BUCKETS - 1)).astype("int32")),
            "hi": pa.array(hi, pa.int64()),
            "lo": pa.array(np.asarray(los, dtype=np.int64), pa.int64()),
            "doc_id": pa.array(np.asarray(doc_ids, dtype=np.int64), pa.int64()),
            "pos": pa.array(np.asarray(poss, dtype=np.int64), pa.int64()),
        })

    def mark_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["hi", "lo", "doc_id", "pos"])
        grp = df.groupby(["hi", "lo"], sort=False)
        dup = grp["doc_id"].transform("size") >= 2
        first = grp.cumcount() == 0
        marked = df[dup & ~first]
        return pa.Table.from_pandas(marked[["doc_id", "pos"]],
                                    preserve_index=False)

    def doc_spans(t: pa.Table) -> pa.Table:
        p = np.sort(t["pos"].to_numpy().astype(np.int64))
        e = p + L
        prev_end = np.concatenate(([-1], np.maximum.accumulate(e)[:-1]))
        new = p >= prev_end  # overlap merges; adjacency starts a new span
        island = np.cumsum(new) - 1
        n_spans = int(island[-1]) + 1
        starts = p[new]
        ends = np.maximum.reduceat(e, np.flatnonzero(new))
        removed = int((ends - starts).sum())
        return pa.table({"doc_id": t["doc_id"][:1],
                         "removed_tokens": pa.array([removed], pa.int64()),
                         "n_spans": pa.array([n_spans], pa.int64())})

    marked = (ds.map_batches(gram_rows, batch_format="pyarrow")
              .groupby("b").map_groups(mark_bucket, batch_format="pyarrow"))
    rem = (marked.groupby("doc_id")
           .map_groups(doc_spans, batch_format="pyarrow").to_pandas())

    def tok_counts(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t["text"], r"[^\s]+")
        return pa.table({"doc_id": t["doc_id"], "n_tokens": n})

    totals = ds.map_batches(tok_counts, batch_format="pyarrow").to_pandas()
    out = totals.merge(rem, on="doc_id", how="left").fillna(
        {"removed_tokens": 0, "n_spans": 0})
    out["removed_tokens"] = out["removed_tokens"].astype("int64")
    out["n_spans"] = out["n_spans"].astype("int64")
    out["kept_tokens"] = (out["n_tokens"].astype("int64")
                          - out["removed_tokens"]).astype("int64")
    return (out[["doc_id", "removed_tokens", "n_spans", "kept_tokens"]]
            .sort_values("doc_id").reset_index(drop=True))


DEDUP_SUBSTRING_SPANS_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents
),
grams AS (
  SELECT doc_id, i AS pos, array_to_string(tk[i + 1 : i + {DUPGRAM_L}], ' ') AS g
  FROM toks, LATERAL (SELECT unnest(range(len(tk) - {DUPGRAM_L} + 1)) AS i) r
  WHERE len(tk) >= {DUPGRAM_L}
),
marked AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           ROW_NUMBER() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn,
           COUNT(*) OVER (PARTITION BY g) AS c
    FROM grams) WHERE c >= 2 AND rn > 1
),
brk AS (
  SELECT doc_id, pos,
         CASE WHEN pos >= COALESCE(MAX(pos + {DUPGRAM_L}) OVER (
              PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
         THEN 1 ELSE 0 END AS is_new
  FROM marked
),
isl AS (
  SELECT doc_id, pos,
         SUM(is_new) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM brk
),
spans AS (
  SELECT doc_id, MIN(pos) AS s, MAX(pos) + {DUPGRAM_L} AS e
  FROM isl GROUP BY doc_id, island
),
rem AS (
  SELECT doc_id, COUNT(*)::BIGINT AS n_spans,
         SUM(e - s)::BIGINT AS removed_tokens
  FROM spans GROUP BY doc_id
)
SELECT t.doc_id,
       COALESCE(r.removed_tokens, 0)::BIGINT AS removed_tokens,
       COALESCE(r.n_spans, 0)::BIGINT AS n_spans,
       (len(t.tk) - COALESCE(r.removed_tokens, 0))::BIGINT AS kept_tokens
FROM toks t LEFT JOIN rem r USING (doc_id) ORDER BY doc_id
"""
