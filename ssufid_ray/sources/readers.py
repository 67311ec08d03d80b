"""Document readers: accept BOTH document layouts (FIXTURES.md note).

- span docs: (doc_id:string, spans:list<struct<kind,text,media_ref,offset>>)
  — the engine's native input_hint schema
- flat docs: (doc_id:int64, text, lang, source, n_chars) — the driver's
  generic table

`read_documents` normalizes either to the span-doc schema (flat text is
segmented into fixed-word text spans, same rule as the flagship pipeline).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ssufid_ray.functions.segment import segment_text
from ssufid_ray.schema import DOCUMENTS_SCHEMA


def _flat_to_spans(t: pa.Table) -> pa.Table:
    rows = []
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        spans = [
            {"kind": "text", "text": chunk, "media_ref": "", "offset": off}
            for off, chunk in enumerate(segment_text(text))
        ]
        rows.append({"doc_id": str(doc_id), "spans": spans})
    return pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)


def read_documents(path: str) -> ray.data.Dataset:
    """-> Dataset in the span-doc schema, whichever layout `path` holds."""
    ds = ray.data.read_parquet(path)
    schema = ds.schema()
    names = set(schema.names)
    if "spans" in names:
        return ds.select_columns(["doc_id", "spans"])
    if "text" in names:
        return ds.map_batches(_flat_to_spans, batch_format="pyarrow")
    raise ValueError(f"unrecognized documents layout at {path}: {schema.names}")
