"""Flagship pipeline for the driver smoke check (`entry()`): the driver's
flat documents table -> interleaved span documents (the input_hint schema)
enriched with text-quality columns — the same span representation the crawl
engine produces, over the generic corpus."""

from __future__ import annotations

import re

import pyarrow as pa
import ray.data

from ssufid_ray.functions.segment import segment_text
from ssufid_ray.schema import SPAN_STRUCT

_HANGUL = re.compile(r"[가-힣]")

FLAGSHIP_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
        ("n_spans", pa.int32()),
        ("n_tokens", pa.int64()),
        ("n_chars", pa.int64()),
        ("lang_pred", pa.string()),
        ("source", pa.string()),
    ]
)


def span_document_pipeline(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "source"])

    def to_span_docs(t: pa.Table) -> pa.Table:
        rows = []
        for doc_id, text, source in zip(t["doc_id"].to_pylist(),
                                        t["text"].to_pylist(),
                                        t["source"].to_pylist()):
            toks = text.split()
            spans = [{"kind": "text", "text": chunk, "media_ref": "",
                      "offset": off}
                     for off, chunk in enumerate(segment_text(text))]
            rows.append({
                "doc_id": str(doc_id),
                "spans": spans,
                "n_spans": len(spans),
                "n_tokens": len(toks),
                "n_chars": len(text),
                "lang_pred": "ko" if _HANGUL.search(text) else "en",
                "source": source,
            })
        return pa.Table.from_pylist(rows, schema=FLAGSHIP_SCHEMA)

    return ds.map_batches(to_span_docs, batch_format="pyarrow")
