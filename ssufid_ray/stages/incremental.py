"""Incremental exact dedup against a PERSISTED fingerprint index — the
"dedup the new crawl against the existing corpus" pattern a 100-TB
pipeline runs daily (analogous to the reference's cache-then-merge crawl
loop, packages/ssufid/src/core/mod.rs merge_entries, re-expressed as a
corpus-scale artifact):

  1. build (once, resumable): the corpus side's text fingerprints are
     written as bucket-partitioned parquet with a _DONE marker — built in
     a temp dir and atomically renamed, exactly like the IVF index, so a
     crashed build never leaves a half-index that a resume would append
     into.
  2. incremental run (cheap, repeatable): only the incoming slice is
     hashed; membership against the index is a co-partitioned anti-join
     on (bucket, hi, lo) INT rows — the index's text never loads, the
     incoming text crosses one bucketed exchange for the final attach.

The corpus/incoming split here is deterministic (doc_id % 5) so the
DuckDB oracle can mirror it; a real deployment keys the split on
ingestion time and appends the new uniques' fingerprints to the index
afterwards (same write path as the builder).
"""

from __future__ import annotations

import hashlib
import os
import shutil
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ssufid_ray.stages.relational import read

INC_MOD = 5            # incoming = doc_id % INC_MOD == 0, corpus = rest
INC_BUCKETS = 16       # index partitions (pruned-exchange width)
INC_JOIN_BUCKETS = 64  # text-attach exchange width
INC_ROOT_ENV = "SSUFID_INC_ROOT"

_IDX_SCHEMA = pa.schema([("bucket", pa.int32()),
                         ("hi", pa.int64()), ("lo", pa.int64())])


def _fp_cols(texts: list[str]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """128-bit md5 per text as two int64 columns + a bucket (LOW 4 bits
    of hi — the same low-bits scheme as dup_gram_stats) — int-only
    exchanges, no 64-bit birthday risk at corpus scale."""
    his = np.empty(len(texts), dtype=np.int64)
    los = np.empty(len(texts), dtype=np.int64)
    for i, x in enumerate(texts):
        d = hashlib.md5(x.encode("utf-8")).digest()
        his[i] = int.from_bytes(d[:8], "big", signed=True)
        los[i] = int.from_bytes(d[8:], "big", signed=True)
    return (his & (INC_BUCKETS - 1)).astype(np.int32), his, los


def _index_dir(sf_dir: str) -> str:
    """Index location — same contract as the IVF index: must be shared
    storage on a multi-node cluster (set SSUFID_INC_ROOT); the node-local
    /tmp default is refused when more than one node is alive. Keyed by
    the source table's identity so a regenerated documents.parquet
    invalidates the cache instead of serving stale fingerprints."""
    root = os.environ.get(INC_ROOT_ENV)
    if root is None:
        alive = [n for n in ray.nodes() if n.get("Alive")]
        if len(alive) > 1:
            raise RuntimeError(
                "fingerprint index root defaults to node-local /tmp, which "
                "is incorrect on a multi-node cluster: set "
                f"{INC_ROOT_ENV} to a shared filesystem path")
        root = "/tmp/ssufid_fpindex"
    src = Path(sf_dir) / "documents.parquet"
    st = src.stat()
    key = hashlib.blake2b(
        f"{sf_dir}|{st.st_size}|{st.st_mtime_ns}|{INC_MOD}|{INC_BUCKETS}|v1"
        .encode(), digest_size=8).hexdigest()
    return str(Path(root) / key)


def build_fingerprint_index(sf_dir: str) -> str:
    """Write the corpus side's fingerprint index once; later calls see
    _DONE and return immediately (the resumable-artifact contract)."""
    idx_dir = _index_dir(sf_dir)
    done = Path(idx_dir) / "_DONE"
    if done.exists():
        return idx_dir
    shutil.rmtree(idx_dir, ignore_errors=True)  # partial build: discard
    tmp_dir = idx_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)

    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        t = t.filter(pa.array(ids % INC_MOD != 0))
        b, hi, lo = _fp_cols(t["text"].to_pylist())
        return pa.table({"bucket": pa.array(b), "hi": pa.array(hi),
                         "lo": pa.array(lo)})

    # co-locate rows by bucket before the partitioned write: without it
    # every (input block x bucket) pair emits its own file (~1k tiny
    # files at sf0.1 — the probe paid per-file metadata cost). One group
    # per bucket keeps it to one file per bucket here; a 100-TB build
    # writes one file per bucket PER INPUT SHARD instead (bounded by
    # shard count), same read path.
    (ds.map_batches(fp, batch_format="pyarrow")
     .groupby("bucket").map_groups(lambda t: t, batch_format="pyarrow")
     .write_parquet(tmp_dir, partition_cols=["bucket"]))
    os.replace(tmp_dir, idx_dir)
    done.touch()
    return idx_dir


def incremental_dedup(sf_dir: str) -> pd.DataFrame:
    """Incoming docs (doc_id % INC_MOD == 0) that are exact-text new: not
    in the fingerprint index, and first-occurrence (min doc_id) within
    the incoming slice itself. Anti-join + within-slice dedup run per
    fingerprint bucket over int rows; the surviving doc_ids re-attach
    text through one co-partitioned bucketed join (no driver-side corpus
    state, no broadcast needed — winner volume is incoming-sized)."""
    idx_dir = build_fingerprint_index(sf_dir)

    docs = read(sf_dir, "documents", ["doc_id", "text"])

    def incoming_fp(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        t = t.filter(pa.array(ids % INC_MOD == 0))
        b, hi, lo = _fp_cols(t["text"].to_pylist())
        return pa.table({"bucket": pa.array(b), "hi": pa.array(hi),
                         "lo": pa.array(lo),
                         "doc_id": pc.cast(t["doc_id"], pa.int64())})

    inc = docs.map_batches(incoming_fp, batch_format="pyarrow")

    def index_rows(t: pa.Table) -> pa.Table:
        # partition read recovers bucket as a column; doc_id = -1 marks
        # an index row through the union
        return pa.table({
            "bucket": pc.cast(t["bucket"], pa.int32()),
            "hi": t["hi"], "lo": t["lo"],
            "doc_id": pa.array(np.full(len(t), -1, dtype=np.int64))})

    idx = ray.data.read_parquet(idx_dir).map_batches(
        index_rows, batch_format="pyarrow")

    empty = pa.table({"doc_id": pa.array([], pa.int64())})

    def anti_join_bucket(t: pa.Table) -> pa.Table:
        if "doc_id" not in t.column_names or len(t) == 0:
            return empty
        df = t.to_pandas()
        known = df[df["doc_id"] < 0]
        new = df[df["doc_id"] >= 0]
        if new.empty:
            return empty
        m = new.merge(known[["hi", "lo"]].drop_duplicates(),
                      on=["hi", "lo"], how="left", indicator=True)
        fresh = m[m["_merge"] == "left_only"]
        win = fresh.groupby(["hi", "lo"], as_index=False)["doc_id"].min()
        return pa.table({"doc_id": pa.array(win["doc_id"].to_numpy(),
                                            pa.int64())})

    winners = inc.union(idx).groupby("bucket").map_groups(
        anti_join_bucket, batch_format="pyarrow")

    # text attach: winners (ints) co-partitioned with the incoming slice
    attach_schema = pa.schema([("doc_id", pa.int64()), ("jb", pa.int32()),
                               ("text", pa.string())])

    def win_rows(t: pa.Table) -> pa.Table:
        if "doc_id" not in t.column_names or len(t) == 0:
            return attach_schema.empty_table()
        ids = t["doc_id"]
        return pa.table({"doc_id": ids,
                         "jb": pc.cast(pc.bit_wise_and(
                             ids, pa.scalar(INC_JOIN_BUCKETS - 1)), pa.int32()),
                         "text": pa.nulls(len(t), pa.string())})

    def doc_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        t = t.filter(pa.array(ids % INC_MOD == 0))
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "jb": pc.cast(pc.bit_wise_and(
                             t["doc_id"], pa.scalar(INC_JOIN_BUCKETS - 1)),
                             pa.int32()),
                         "text": t["text"]})

    out_schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])

    def attach(t: pa.Table) -> pa.Table:
        if "text" not in t.column_names or len(t) == 0:
            return out_schema.empty_table()
        df = t.to_pandas()
        win = df[df["text"].isna()][["doc_id"]]
        txt = df[df["text"].notna()][["doc_id", "text"]]
        j = win.merge(txt, on="doc_id", how="inner")
        return pa.Table.from_pandas(j[["doc_id", "text"]],
                                    preserve_index=False, schema=out_schema)

    both = (winners.map_batches(win_rows, batch_format="pyarrow")
            .union(docs.map_batches(doc_rows, batch_format="pyarrow")))
    out = (both.groupby("jb").map_groups(attach, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


INCREMENTAL_DEDUP_SQL = f"""
SELECT doc_id, text FROM documents d
WHERE doc_id % {INC_MOD} = 0
  AND NOT EXISTS (SELECT 1 FROM documents e
                  WHERE e.doc_id % {INC_MOD} <> 0 AND e.text = d.text)
  AND NOT EXISTS (SELECT 1 FROM documents e2
                  WHERE e2.doc_id % {INC_MOD} = 0 AND e2.doc_id < d.doc_id
                    AND e2.text = d.text)
ORDER BY doc_id
"""
