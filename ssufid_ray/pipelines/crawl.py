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
            FetchParser(corpus_dir, seeds_path, politeness_scale),
            batch_format="pyarrow",
            batch_size=fetch_batch_size,
            concurrency=fetch_concurrency,
        )
        fetched.write_parquet(posts_dir, partition_cols=["plugin_id"])
        manifest["fetch_done"] = True
        storage.write_manifest(manifest_path, manifest)

    # ---- phase 3: metrics rollup (A1/A2 analogue) — column-pruned reads
    metrics_path = str(out / "metrics.parquet")
    if not manifest.get("metrics_done"):
        recs = records_dataset(out_dir)
        counts = recs.groupby("outcome").count().to_pandas()
        by_plugin = (
            ray.data.read_parquet(posts_dir, columns=["plugin_id", "outcome"])
            .groupby("plugin_id")
            .count()
            .to_pandas()
        )
        tbl = pa.table({
            "key": list(counts["outcome"]) + [f"plugin:{p}" for p in by_plugin["plugin_id"]],
            "count": list(counts["count()"].astype("int64"))
            + list(by_plugin["count()"].astype("int64")),
        })
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
