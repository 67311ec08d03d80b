"""Incremental merge-upsert (J1) and calendar range-replace merge (J2).

Reference semantics (/root/reference/packages/ssufid/src/core/mod.rs:336-437):

merge_posts (mod.rs:336-385):
  - both sides sorted by created_at (stable)
  - new post id absent in cache  -> insert              (post_created)
  - contents_eq (trimmed id/title/content, category
    untrimmed, post.rs:50-55)    -> keep old row as-is  (skipped)
  - else -> update (post_updated, mod.rs:371-382): with a
    crawler-supplied updated_at the NEW post is inserted wholesale (its
    own created_at included); only when updated_at is absent does the old
    created_at survive, with updated_at stamped `now`
  - cache rows never re-crawled stay                    (preserved)

merge_calendar (mod.rs:397-437): old entries inside the crawl range are
dropped; new entries win inside the range; outside-range old preserved;
per-id upsert with all-field contents_eq (calendar.rs:56-65).

Ray mapping: tag each side, union, bucket by hash(doc_id) % B, and merge
each bucket in `groupby("bucket").map_groups` — the explicit partitioned
hash join of SURVEY §7.3 (key `(plugin_id, post_id)` ≡ doc_id). Buckets
bound group size so no driver-side state is needed and hot boards spread
across buckets.
"""

from __future__ import annotations

from datetime import datetime

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ssufid_ray.functions.textnorm import calendar_contents_eq
from ssufid_ray.schema import CALENDAR_SCHEMA, POSTS_SCHEMA
from ssufid_ray.urlnorm import shard_of

MERGED_SCHEMA = pa.schema(list(POSTS_SCHEMA) + [("outcome", pa.string())])
MERGED_CAL_SCHEMA = pa.schema(list(CALENDAR_SCHEMA) + [("outcome", pa.string())])


def _with_bucket_and_side(ds: ray.data.Dataset, side: str, num_buckets: int,
                          key: str = "doc_id") -> ray.data.Dataset:
    def add(t: pa.Table) -> pa.Table:
        buckets = pa.array(
            [shard_of(v, num_buckets) for v in t[key].to_pylist()], pa.int32()
        )
        t = t.append_column("bucket", buckets)
        return t.append_column("side", pa.array([side] * len(t), pa.string()))

    return ds.map_batches(add, batch_format="pyarrow")


MERGE_ROWS_PER_BUCKET = 20_000  # target rows per merge partition


def _auto_buckets(n_rows: int) -> int:
    """Bucket count scales with input so one bucket stays a bounded unit of
    work at any corpus size (fixed 32 was a 100-TB ceiling)."""
    return max(32, -(-n_rows // MERGE_ROWS_PER_BUCKET))


def merge_posts(
    new_ds: ray.data.Dataset,
    cache_ds: ray.data.Dataset,
    *,
    now: datetime,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """-> merged dataset (POSTS_SCHEMA + outcome column).

    Within a bucket the match + contents_eq compare is VECTORIZED (pandas
    merge on doc_id, column-wise trimmed equality); only the category
    list-equality residual is per-row Python."""
    post_cols = [f.name for f in POSTS_SCHEMA]
    if num_buckets is None:
        num_buckets = _auto_buckets(new_ds.count() + cache_ds.count())
    both = _with_bucket_and_side(new_ds.select_columns(post_cols), "new", num_buckets).union(
        _with_bucket_and_side(cache_ds.select_columns(post_cols), "old", num_buckets)
    )

    def merge_bucket(t: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        df = t.to_pandas().drop(columns=["bucket"])
        old = df[df["side"] == "old"].drop(columns=["side"])
        new = df[df["side"] == "new"].drop(columns=["side"])
        j = new.merge(old, on="doc_id", how="left", suffixes=("", "__o"),
                      indicator=True)
        has_old = (j["_merge"] == "both").to_numpy()

        def _trim(s: pd.Series) -> pd.Series:
            return s.fillna("").astype(str).str.strip()

        # contents_eq (post.rs:50-55): trimmed id/title/content, category
        # UNTRIMMED exact list equality (the per-row Python residual)
        eq = np.zeros(len(j), dtype=bool)
        if has_old.any():
            m = j[has_old]
            veq = ((_trim(m["post_id"]) == _trim(m["post_id__o"]))
                   & (_trim(m["title"]) == _trim(m["title__o"]))
                   & (_trim(m["content"]) == _trim(m["content__o"]))).to_numpy()
            # None ≡ [] like contents_eq (the reference deserializes a
            # missing category as the serde default empty Vec, post.rs:30)
            cat = np.fromiter(
                (list(a if a is not None else []) ==
                 list(b if b is not None else [])
                 for a, b in zip(m["category"], m["category__o"])),
                dtype=bool, count=len(m))
            eq[has_old] = veq & cat

        out_parts: list[pd.DataFrame] = []
        # created: no cache row -> new post wholesale
        created = j[~has_old][post_cols].copy()
        created["outcome"] = "created"
        out_parts.append(created)
        # skipped: contents equal -> the OLD row is kept as-is (mod.rs:361)
        skipped = j[eq][["doc_id"] + [c + "__o" for c in post_cols if c != "doc_id"]]
        skipped.columns = ["doc_id"] + [c for c in post_cols if c != "doc_id"]
        skipped = skipped[post_cols].copy()
        skipped["outcome"] = "skipped"
        out_parts.append(skipped)
        # updated (mod.rs:371-382): crawler-supplied updated_at -> new post
        # wholesale; else old created_at survives and updated_at = now
        upd = j[has_old & ~eq][post_cols + ["created_at__o"]].copy()
        stamp = upd["updated_at"].isna()
        upd.loc[stamp, "created_at"] = upd.loc[stamp, "created_at__o"]
        upd.loc[stamp, "updated_at"] = pd.Timestamp(now)
        upd = upd[post_cols].copy()
        upd["outcome"] = "updated"
        out_parts.append(upd)
        # preserved: cache rows never re-crawled
        pres = old[~old["doc_id"].isin(set(new["doc_id"]))][post_cols].copy()
        pres["outcome"] = "preserved"
        out_parts.append(pres)

        out = pd.concat(out_parts, ignore_index=True)
        # stable order inside the bucket (mod.rs:344-347 sorts by
        # created_at; doc_id tie-break keeps the output deterministic)
        out = out.sort_values(["created_at", "doc_id"], kind="stable")
        return pa.Table.from_pandas(out, preserve_index=False,
                                    schema=MERGED_SCHEMA)

    return both.groupby("bucket").map_groups(merge_bucket, batch_format="pyarrow")


def merge_calendar(
    new_ds: ray.data.Dataset,
    cache_ds: ray.data.Dataset,
    *,
    range_start: datetime,
    range_end: datetime,
    num_buckets: int = 8,
) -> ray.data.Dataset:
    """Range-replace merge (mod.rs:397-437): the crawl range is
    authoritative — old entries whose starts_at falls inside [start, end]
    are dropped unless re-crawled; new entries upsert by id."""
    cal_cols = [f.name for f in CALENDAR_SCHEMA]
    both = _with_bucket_and_side(new_ds.select_columns(cal_cols), "new", num_buckets,
                                 key="id").union(
        _with_bucket_and_side(cache_ds.select_columns(cal_cols), "old", num_buckets,
                              key="id")
    )

    def merge_bucket(t: pa.Table) -> pa.Table:
        rows = t.to_pylist()
        old = {r["id"]: r for r in rows if r["side"] == "old"}
        new = [r for r in rows if r["side"] == "new"]
        new.sort(key=lambda r: (r["starts_at"], r["id"]))  # calendar.rs:45-53
        out: list[dict] = []
        matched: set[str] = set()
        for r in new:
            o = old.get(r["id"])
            if o is None:
                out.append({**r, "outcome": "created"})
                continue
            matched.add(r["id"])
            if calendar_contents_eq(o, r):
                out.append({**o, "outcome": "skipped"})
            else:
                out.append({**r, "outcome": "updated"})
        for eid, o in old.items():
            if eid in matched:
                continue
            inside = range_start <= o["starts_at"] <= range_end
            if not inside:  # outside the crawl range -> preserved
                out.append({**o, "outcome": "preserved"})
            # inside and not re-crawled -> dropped (range-replace)
        for r in out:
            r.pop("bucket", None)
            r.pop("side", None)
        return pa.Table.from_pylist(out, schema=MERGED_CAL_SCHEMA)

    return both.groupby("bucket").map_groups(merge_bucket, batch_format="pyarrow")


def topk_per_board(merged: ray.data.Dataset, k: int = 100) -> ray.data.Dataset:
    """Final site output (A3, mod.rs:142-147): per board, the k newest
    posts, newest first; ties broken by doc_id for determinism."""
    def head_k(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("created_at", "descending"), ("doc_id", "descending")]
        )
        out = t.take(idx[:k])
        ranks = pa.array(range(len(out)), pa.int32())
        return out.append_column("rank", ranks)

    return merged.groupby("plugin_id").map_groups(head_k, batch_format="pyarrow")
