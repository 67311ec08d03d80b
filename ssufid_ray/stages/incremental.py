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
  3. append (closes the daily loop, the reference's cache-then-merge
     durability story — /root/reference/packages/ssufid/src/core/
     mod.rs:269-311 writes the merged cache back after every run): the
     run's new-unique fingerprints are written into the bucket layout
     (tmp-dir write, then one deterministic rename per file into the
     live bucket dirs) and the applied tag is recorded in the _DONE
     marker atomically (tmp + os.replace), so tomorrow's slice dedups
     against corpus + today's uniques. Idempotent per tag: a re-run of
     a tag already in the marker is a no-op; a crash between bucket
     renames and the marker bump re-writes the same deterministic
     filenames, and duplicate fingerprint rows are harmless to the
     membership anti-join.

The corpus/incoming split here is deterministic (doc_id % 5) so the
DuckDB oracle can mirror it; a real deployment keys the split on
ingestion time. The day-2 chain (incremental_append_day2) models two
consecutive daily runs: slice A (doc_id % 10 == 0) dedups and appends,
slice B (doc_id % 10 == 5) then dedups against corpus + A's uniques.
Because append ships the winners' fingerprints and every A duplicate's
text is already represented (corpus dup -> corpus row; within-A dup ->
its winner), the index's membership set after append is exactly
{corpus texts} ∪ {A texts} — which is what the SQL oracle states.
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
INC_COMPACT_AFTER = 4  # parts per bucket dir before day-parts compact
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


def _index_dir(sf_dir: str, variant: str = "base") -> str:
    """Index location — same contract as the IVF index: must be shared
    storage on a multi-node cluster (set SSUFID_INC_ROOT); the node-local
    /tmp default is refused when more than one node is alive. Keyed by
    the source table's identity so a regenerated documents.parquet
    invalidates the cache instead of serving stale fingerprints. The
    variant keys independent index lineages (the day-2 append chain must
    not mutate the base index the plain incremental_dedup oracle reads)."""
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
        f"{sf_dir}|{st.st_size}|{st.st_mtime_ns}|{INC_MOD}|{INC_BUCKETS}|"
        f"{variant}|v1".encode(), digest_size=8).hexdigest()
    return str(Path(root) / key)


def build_fingerprint_index(sf_dir: str, variant: str = "base",
                            corpus_mod: int = INC_MOD,
                            corpus_keep_rems: tuple[int, ...] | None = None
                            ) -> str:
    """Write the corpus side's fingerprint index once; later calls see
    _DONE and return immediately (the resumable-artifact contract).
    corpus rows are doc_id % corpus_mod IN corpus_keep_rems (default:
    everything except remainder 0 — the base corpus/incoming split)."""
    if corpus_keep_rems is None:
        corpus_keep_rems = tuple(r for r in range(corpus_mod) if r != 0)
    idx_dir = _index_dir(sf_dir, variant)
    done = Path(idx_dir) / "_DONE"
    if done.exists():
        return idx_dir
    shutil.rmtree(idx_dir, ignore_errors=True)  # partial build: discard
    tmp_dir = idx_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)

    ds = read(sf_dir, "documents", ["doc_id", "text"])
    rems = np.array(corpus_keep_rems, dtype=np.int64)

    def fp(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        t = t.filter(pa.array(np.isin(ids % corpus_mod, rems)))
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
    done.write_text("v1\n")
    return idx_dir


def _applied_tags(idx_dir: str) -> set[str]:
    done = Path(idx_dir) / "_DONE"
    if not done.exists():
        return set()
    return set(done.read_text().split()[1:])  # line 0 is the format tag


def append_fingerprints(idx_dir: str, winners: ray.data.Dataset,
                        tag: str) -> None:
    """Append the run's new-unique fingerprints (doc_id, hi, lo rows)
    into the live bucket layout. Distributed write into a tmp dir, then
    deterministic renames into the bucket dirs, then an atomic marker
    bump recording the tag. Idempotent: a tag already in the marker is a
    no-op; a crash mid-rename re-writes the same filenames on retry."""
    if tag in _applied_tags(idx_dir):
        return
    tmp_dir = f"{idx_dir}.append-{tag}.tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)

    def fp_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(
                t["hi"], pa.scalar(INC_BUCKETS - 1)), pa.int32()),
            "hi": t["hi"], "lo": t["lo"]})

    rows = winners.map_batches(fp_rows, batch_format="pyarrow")
    if rows.count() > 0:
        (rows.groupby("bucket")
         .map_groups(lambda t: t, batch_format="pyarrow")
         .write_parquet(tmp_dir, partition_cols=["bucket"]))
        for bdir in sorted(Path(tmp_dir).glob("bucket=*")):
            dest = Path(idx_dir) / bdir.name
            dest.mkdir(exist_ok=True)
            for i, f in enumerate(sorted(bdir.glob("*.parquet"))):
                os.replace(f, dest / f"append-{tag}-{i:04d}.parquet")
    shutil.rmtree(tmp_dir, ignore_errors=True)

    done = Path(idx_dir) / "_DONE"
    marker_tmp = Path(idx_dir) / "_DONE.tmp"
    marker_tmp.write_text(done.read_text() + f"{tag}\n")
    os.replace(marker_tmp, done)
    # periodic maintenance: merge accumulated day-parts per bucket once a
    # bucket dir exceeds INC_COMPACT_AFTER files (crash-safe; see
    # storage.compact_partition_dirs) — membership reads stay one-file-
    # per-bucket-ish instead of growing with append count
    from ssufid_ray import storage as _st

    _st.compact_partition_dirs(idx_dir, "bucket=*",
                               max_parts=INC_COMPACT_AFTER)


_WIN_SCHEMA = pa.schema([("doc_id", pa.int64()),
                         ("hi", pa.int64()), ("lo", pa.int64())])


def _winners_against_index(sf_dir: str, idx_dir: str,
                           mod: int, rem: int) -> ray.data.Dataset:
    """Fingerprint the incoming slice (doc_id % mod == rem), anti-join
    it against the index per bucket, keep the first occurrence per text
    within the slice. Returns (doc_id, hi, lo) winner rows — the hi/lo
    ride along so the append step never re-hashes text."""
    from ssufid_ray import storage as _st

    _st.repair_compaction(idx_dir, "bucket=*")  # crashed-compaction guard
    docs = read(sf_dir, "documents", ["doc_id", "text"])

    def incoming_fp(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        t = t.filter(pa.array(ids % mod == rem))
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

    def anti_join_bucket(t: pa.Table) -> pa.Table:
        if "doc_id" not in t.column_names or len(t) == 0:
            return _WIN_SCHEMA.empty_table()
        df = t.to_pandas()
        known = df[df["doc_id"] < 0]
        new = df[df["doc_id"] >= 0]
        if new.empty:
            return _WIN_SCHEMA.empty_table()
        m = new.merge(known[["hi", "lo"]].drop_duplicates(),
                      on=["hi", "lo"], how="left", indicator=True)
        fresh = m[m["_merge"] == "left_only"]
        win = fresh.groupby(["hi", "lo"], as_index=False)["doc_id"].min()
        return pa.Table.from_pandas(win[["doc_id", "hi", "lo"]],
                                    preserve_index=False, schema=_WIN_SCHEMA)

    return inc.union(idx).groupby("bucket").map_groups(
        anti_join_bucket, batch_format="pyarrow")


def _attach_text(sf_dir: str, winners: ray.data.Dataset,
                 mod: int, rem: int) -> pd.DataFrame:
    """Winner doc_ids (ints) co-partitioned with the incoming slice for
    the text re-attach — one bucketed exchange, no driver-side corpus
    state, no broadcast (winner volume is incoming-sized)."""
    docs = read(sf_dir, "documents", ["doc_id", "text"])
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
        t = t.filter(pa.array(ids % mod == rem))
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


def incremental_dedup(sf_dir: str) -> pd.DataFrame:
    """Incoming docs (doc_id % INC_MOD == 0) that are exact-text new: not
    in the fingerprint index, and first-occurrence (min doc_id) within
    the incoming slice itself."""
    idx_dir = build_fingerprint_index(sf_dir)
    winners = _winners_against_index(sf_dir, idx_dir, INC_MOD, 0)
    return _attach_text(sf_dir, winners, INC_MOD, 0)


def incremental_append_day2(sf_dir: str) -> pd.DataFrame:
    """Two consecutive daily runs against one persisted index: day A
    (doc_id % 10 == 0) dedups and APPENDS its uniques' fingerprints;
    day B (doc_id % 10 == 5) then dedups against corpus + A's uniques.
    Returns day B's new-unique rows. Uses its own index lineage (variant
    day2) so the base incremental_dedup oracle never sees the appended
    rows. Idempotent across invocations: the append tag is recorded in
    the marker, so a re-run skips straight to day B's dedup."""
    idx_dir = build_fingerprint_index(sf_dir, variant="day2")
    if "dayA" not in _applied_tags(idx_dir):
        win_a = _winners_against_index(sf_dir, idx_dir, 10, 0).materialize()
        append_fingerprints(idx_dir, win_a, "dayA")
    win_b = _winners_against_index(sf_dir, idx_dir, 10, 5)
    return _attach_text(sf_dir, win_b, 10, 5)


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

# membership after the dayA append = {corpus texts} ∪ {A texts}: every A
# duplicate's text is represented either by its corpus row or by its
# within-A winner, so the NOT EXISTS can range over all of A directly.
INCREMENTAL_APPEND_DAY2_SQL = f"""
SELECT doc_id, text FROM documents d
WHERE doc_id % 10 = 5
  AND NOT EXISTS (SELECT 1 FROM documents e
                  WHERE (e.doc_id % {INC_MOD} <> 0 OR e.doc_id % 10 = 0)
                    AND e.text = d.text)
  AND NOT EXISTS (SELECT 1 FROM documents e2
                  WHERE e2.doc_id % 10 = 5 AND e2.doc_id < d.doc_id
                    AND e2.text = d.text)
ORDER BY doc_id
"""
