"""The flagship crawl pipeline (SURVEY §3.1 re-architected Ray-Data-first).

    seeds ─ groupby(host) ─ map_groups(HostScout) ──► scout parquet
                                   │  (records + issued tasks + embedded posts;
                                   │   seen-set shard actors consulted in issue order)
    tasks+posts ─ map_batches(FetchParser pool) ──► posts parquet
    records ─ groupby(outcome/plugin) ──► metrics parquet
    seen shards ──► per-shard checkpoint dump

Streaming end to end: every stage is a Dataset transform consumed by a
parquet write; nothing driver-side ever holds the corpus. The scout phase
output (frontier working set) is written to storage and re-read with column
pruning — at 10^10-URL scale this is the per-generation frontier spill, and
it is what makes the run resumable (the manifest records completed phases;
a rerun skips finished ones).

Partitioning keys (SURVEY §7.3): host (scout groups = politeness/seen
domains), plugin_id (posts output layout), outcome (metrics rollup).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ssufid_ray import storage
from ssufid_ray.state.seen import SeenSet
from ssufid_ray.stages.fetchparse import FetchParser
from ssufid_ray.stages.scout import HostScout


def run_crawl(
    corpus_dir: str,
    out_dir: str,
    *,
    num_seen_shards: int = 8,
    seen_capacity: int = 1 << 20,
    politeness_scale: float = 0.0,
    fetch_concurrency: int | tuple = 4,
    fetch_batch_size: int = 128,
    resume: bool = True,
) -> dict:
    """Run the full crawl replay. Returns the output manifest (paths +
    counters). `resume=True` skips phases whose outputs a previous run
    committed to the manifest (kill/resume correctness test relies on it)."""
    from pathlib import Path

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    manifest_path = str(out / "manifest.json")
    manifest = (storage.read_manifest(manifest_path) or {}) if resume else {}
    seeds_path = str(Path(corpus_dir) / "seeds.parquet")

    seen = SeenSet.create(num_seen_shards, seen_capacity)
    seen_dir = str(out / "seen")

    # ---- phase 1: scout (frontier walk; assigns fetch_seq, dedups, gates)
    scout_dir = str(out / "scout")
    if manifest.get("scout_done"):
        seen.restore(seen_dir)  # resume: rebuild seen state from checkpoint
    else:
        seeds = ray.data.from_arrow(storage.read_table(seeds_path))
        scout = HostScout(corpus_dir, seen.handles(), num_seen_shards,
                          politeness_scale)
        def scout_host(group):  # map_groups needs a named function
            return scout(group)

        scout_ds = seeds.groupby("host").map_groups(
            scout_host, batch_format="pandas")
        scout_ds.write_parquet(scout_dir)
        seen.checkpoint(seen_dir)  # per-shard atomic dumps (partition lineage)
        manifest["scout_done"] = True
        storage.write_manifest(manifest_path, manifest)

    # ---- phase 2: fetch + parse details (parallel actor pool)
    posts_dir = str(out / "posts")
    if not manifest.get("fetch_done"):
        tasks = ray.data.read_parquet(scout_dir).map_batches(
            lambda t: t.filter(pc.field("rec_type") != "record"),
            batch_format="pyarrow",
        )
        fetched = tasks.map_batches(
            FetchParser,
            fn_constructor_kwargs={"corpus_dir": corpus_dir,
                                   "seeds_path": seeds_path,
                                   "politeness_scale": politeness_scale},
            batch_format="pyarrow",
            batch_size=fetch_batch_size,
            concurrency=fetch_concurrency,
            num_cpus=0.5,  # leave headroom so the pool can't starve read/write tasks
        )
        fetched.write_parquet(posts_dir, partition_cols=["plugin_id"])
        manifest["fetch_done"] = True
        storage.write_manifest(manifest_path, manifest)

    # ---- phase 3: metrics rollup (A1/A2 analogue) — column-pruned reads,
    # per-batch partial counts, tiny driver-side sum (no all-to-all shuffle)
    metrics_path = str(out / "metrics.parquet")
    if not manifest.get("metrics_done"):
        def value_counts(col):
            def f(t: pa.Table) -> pa.Table:
                vc = t[col].value_counts()
                return pa.table({"key": vc.field("values"),
                                 "count": pc.cast(vc.field("counts"), pa.int64())})
            return f

        scout_counts = (
            ray.data.read_parquet(scout_dir, columns=["rec_type", "outcome"])
            .map_batches(lambda t: t.filter(pc.equal(t["rec_type"], pa.scalar("record"))),
                         batch_format="pyarrow")
            .map_batches(value_counts("outcome"), batch_format="pyarrow")
            .to_pandas()
        )
        post_counts = (
            ray.data.read_parquet(posts_dir, columns=["plugin_id", "outcome"])
            .map_batches(
                lambda t: pa.concat_tables([
                    value_counts("outcome")(t),
                    pa.table({
                        "key": pc.binary_join_element_wise(
                            pa.array(["plugin"] * len(t)), t["plugin_id"], ":"),
                        "count": pa.array([1] * len(t), pa.int64()),
                    }),
                ]),
                batch_format="pyarrow",
            )
            .to_pandas()
        )
        import pandas as pd

        agg = (pd.concat([scout_counts, post_counts])
               .groupby("key", as_index=False)["count"].sum())
        tbl = pa.Table.from_pandas(agg, preserve_index=False)
        storage.write_table(tbl, metrics_path)
        manifest["metrics_done"] = True
        manifest["paths"] = {
            "scout": scout_dir, "posts": posts_dir, "seen": seen_dir,
            "metrics": metrics_path,
        }
        storage.write_manifest(manifest_path, manifest)

    manifest["seen_size"] = seen.size()
    return manifest


def records_dataset(out_dir: str) -> ray.data.Dataset:
    """The unified fetch-decision record stream: scout records (lists, dups,
    robots blocks) + detail fetch outcomes. Column-pruned at the read."""
    from pathlib import Path

    cols = ["url", "host", "fetch_seq", "doc_id", "outcome"]
    scout = ray.data.read_parquet(str(Path(out_dir) / "scout"),
                                  columns=["rec_type"] + cols)
    scout = scout.map_batches(
        lambda t: t.filter(pc.field("rec_type") == "record").drop_columns(["rec_type"]),
        batch_format="pyarrow",
    )
    posts = ray.data.read_parquet(str(Path(out_dir) / "posts"),
                                  columns=cols)
    return scout.union(posts)


def documents_dataset(out_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """The crawled documents table (posts with spans), successful rows only."""
    from pathlib import Path

    ds = ray.data.read_parquet(str(Path(out_dir) / "posts"), columns=columns)
    return ds.map_batches(
        lambda t: t.filter(pc.is_in(t["outcome"], pa.array(["fetched", "embedded"]))),
        batch_format="pyarrow",
    )
