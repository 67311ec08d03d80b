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
