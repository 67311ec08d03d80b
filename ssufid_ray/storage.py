"""Lance-first storage with transparent Parquet fallback.

The north rule targets Lance tables; this sandbox has no `lance` package, so
every read/write goes through this module: if `lance` is importable we use
it, else we write/read a directory of Parquet part files with identical
semantics. Datasets are written partitioned (one subdirectory per partition
key value) so a resumed run can skip finished partitions (SURVEY §7.1 step 6).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

try:  # pragma: no cover - lance absent in this sandbox
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def write_dataset(ds: ray.data.Dataset, path: str, partition_col: str | None = None) -> None:
    """Consume a Dataset to storage. Streaming write — never materializes."""
    if HAVE_LANCE:  # pragma: no cover
        ds.write_lance(path)
        return
    if partition_col is not None:
        ds.write_parquet(path, partition_cols=[partition_col])
    else:
        ds.write_parquet(path)


def read_dataset(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    if HAVE_LANCE and Path(path).suffix == ".lance":  # pragma: no cover
        return ray.data.read_lance(path, columns=columns)
    return ray.data.read_parquet(path, columns=columns)


def write_table(table: pa.Table, path: str, row_group_size: int = 2048) -> None:
    """Atomic single-file table write (manifests, metrics, fixtures,
    per-partition checkpoints). Small row groups let block-splitting reads
    parallelize a single file."""
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    # dot-prefixed tmp: must never match '*.parquet' globs (resume markers)
    # or directory reads — Arrow datasets skip '.'-prefixed files
    tmp = p.parent / f".{p.name}.tmp"
    pq.write_table(table, tmp, row_group_size=row_group_size)
    tmp.rename(p)


def read_table(path: str, columns: list[str] | None = None) -> pa.Table:
    return pq.read_table(path, columns=columns)


# ----------------------- partitioned-index compaction (append day-parts)


def repair_compaction(idx_dir: str, part_glob: str) -> None:
    """Public pre-read hook: readers of an append-compacted index call
    this first so a crash mid-compaction can never surface duplicate or
    missing partition rows."""
    _repair_compaction(Path(idx_dir), part_glob)


def _repair_compaction(root: Path, part_glob: str) -> None:
    """Roll a crashed compaction forward or back, per partition: if the
    generation's compact file landed (write_table is tmp+rename, so its
    presence means it is COMPLETE), the old parts are consumed; otherwise
    any consumed parts are restored. Idempotent."""
    intent = root / "_COMPACTING"
    if not intent.exists():
        return
    gen = intent.read_text().strip()
    for pdir in sorted(root.glob(part_glob)):
        cf = pdir / f"compact_{gen}.parquet"
        if cf.exists():  # roll forward: every other part is consumed
            for f in sorted(pdir.glob("*.parquet")):
                if f != cf:
                    f.rename(f.with_name(f.name + ".consumed"))
        else:  # roll back: restore consumed parts
            for f in sorted(pdir.glob("*.parquet.consumed")):
                f.rename(f.with_name(f.name[: -len(".consumed")]))
    for f in sorted(root.glob(f"{part_glob}/*.parquet.consumed")):
        f.unlink()
    intent.unlink()


def compact_partition_dirs(idx_dir: str, part_glob: str,
                           max_parts: int = 4) -> int:
    """Merge each partition dir's parquet parts (base build + appended
    day-parts) into ONE compact file when the dir has grown past
    `max_parts` files — the periodic maintenance step that keeps the
    daily append loop from accumulating unbounded per-partition file
    counts (every probe/scan pays per-file metadata cost).

    OFFLINE operation: the daily loop runs it between runs, never
    concurrently with probes (same assumption as the index builds).
    Crash-safe: an intent marker is written first; each compact file is
    atomic (write_table tmp+rename); consumed parts are renamed to
    *.consumed only AFTER their partition's compact file is durable; a
    crash anywhere is repaired on the next call (_repair_compaction rolls
    each partition forward or back by whether its compact file landed).
    Merges run as parallel Ray tasks, one per partition — a partition's
    rows are bounded by the index design (cluster target size / bucket
    width), the same bound its probe-side map_groups already relies on.

    Returns the number of partitions compacted."""
    import ray as _ray

    root = Path(idx_dir)
    _repair_compaction(root, part_glob)
    work = [p for p in sorted(root.glob(part_glob))
            if len(list(p.glob("*.parquet"))) > max_parts]
    if not work:
        return 0
    gens = [int(f.name[len("compact_"): -len(".parquet")])
            for p in root.glob(part_glob)
            for f in p.glob("compact_*.parquet")]
    gen = (max(gens) + 1) if gens else 0
    intent_tmp = root / "._COMPACTING.tmp"
    intent_tmp.write_text(f"{gen}\n")
    intent_tmp.rename(root / "_COMPACTING")

    @_ray.remote(num_cpus=0.5)
    def merge_one(pdir: str, gen: int) -> int:
        d = Path(pdir)
        cf = d / f"compact_{gen}.parquet"
        parts = sorted(f for f in d.glob("*.parquet") if f != cf)
        if not cf.exists():  # retry-safe: a landed compact file is final
            merged = pa.concat_tables([pq.read_table(f) for f in parts])
            write_table(merged, str(cf))
        for f in parts:  # consume only after the compact file is durable
            f.rename(f.with_name(f.name + ".consumed"))
        return len(parts)

    _ray.get([merge_one.remote(str(p), gen) for p in work])
    for f in sorted(root.glob(f"{part_glob}/*.parquet.consumed")):
        f.unlink()
    (root / "_COMPACTING").unlink()
    return len(work)


def write_manifest(path: str, manifest: dict[str, Any]) -> None:
    """Atomic JSON manifest (the checkpoint commit record)."""
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp = p.with_suffix(".tmp")
    tmp.write_text(json.dumps(manifest, indent=1, sort_keys=True, default=str))
    tmp.rename(p)


def read_manifest(path: str) -> dict[str, Any] | None:
    p = Path(path)
    if not p.exists():
        return None
    return json.loads(p.read_text())
