"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extract / resize / frame-sample as actor-pool stages.

The image/audio libraries are not in this container, so the default DECODE
KERNELS are stubbed (deterministic fake features derived from the bytes, or
NotImplementedError for real codecs) — the Ray-side plumbing (schemas,
actor-pool signature, batch sizing for large binary rows, output layout) is
real and tested. When PIL IS importable the image path decodes for real
(`_decode_real`), same schema; audio/video still stub until their codecs
are present. Both modes are covered by tests (the real path via an
injected fake codec in this container).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("content_type", pa.string()),
    ]
)

MEDIA_META_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),
        ("n_bytes", pa.int64()),
        ("checksum", pa.int64()),  # crc32
        ("width", pa.int32()),  # stub-decoded dims
        ("height", pa.int32()),
        ("feature", pa.list_(pa.float32(), 8)),  # stub feature vector
    ]
)


def synthesize_media(docs_ds: ray.data.Dataset) -> ray.data.Dataset:
    """Derive deterministic binary payloads from the flat documents table
    (no external data): payload = zlib(text bytes), kind by doc_id mod 3."""

    def make(t: pa.Table) -> pa.Table:
        rows = []
        kinds = ("image", "audio", "video")
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            payload = zlib.compress(text.encode("utf-8"))
            kind = kinds[doc_id % 3]
            rows.append({
                "media_id": f"m{doc_id}",
                "kind": kind,
                "payload": payload,
                "content_type": {"image": "image/png", "audio": "audio/wav",
                                 "video": "video/mp4"}[kind],
            })
        return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)

    return docs_ds.map_batches(make, batch_format="pyarrow")


class MediaDecoder:
    """Actor-pool decode stage. __init__ loads the (stubbed) codecs once;
    __call__ decodes a batch of binary payloads into typed metadata +
    features. Use small batch_size: payload bytes dominate block size."""

    def __init__(self, strict: bool = False):
        self.strict = strict  # strict=True surfaces the unimplemented codecs
        try:  # the real path, absent in this container
            import PIL.Image  # type: ignore # noqa: F401

            self.have_pil = True
        except ImportError:
            self.have_pil = False

    def _decode_stub(self, payload: bytes, kind: str) -> dict:
        if self.strict and not self.have_pil:
            raise NotImplementedError(
                "real media decode requires PIL/torchaudio/pyav; "
                "install them and MediaDecoder uses them automatically")
        # deterministic fake decode: dims/features from a keyed hash
        h = hashlib.blake2b(payload, digest_size=16).digest()
        w = 64 + h[0] % 192
        feat = np.frombuffer(h, dtype=np.uint8).astype(np.float32) / 255.0
        return {"width": w, "height": 64 + h[1] % 192,
                "feature": feat[:8].tolist()}

    def _decode_real(self, payload: bytes, kind: str) -> dict:
        """PIL image decode (used automatically when PIL is importable):
        real dims + an 8-bucket grayscale mean feature. Non-image kinds and
        undecodable payloads fall back to the deterministic stub so the
        schema and row count never depend on payload validity."""
        if kind != "image":
            return self._decode_stub(payload, kind)
        import io

        import PIL.Image  # deferred: only reachable when have_pil

        try:
            img = PIL.Image.open(io.BytesIO(payload))
            w, h = img.size
            g = img.convert("L").resize((8, 1))
            feat = (np.asarray(g, dtype=np.float32).ravel() / 255.0)
            return {"width": int(w), "height": int(h),
                    "feature": feat[:8].tolist()}
        except Exception:  # noqa: BLE001 — corrupt payload, keep the row
            return self._decode_stub(payload, kind)

    def __call__(self, t: pa.Table) -> pa.Table:
        decode = self._decode_real if self.have_pil else self._decode_stub
        rows = []
        for mid, kind, payload in zip(t["media_id"].to_pylist(),
                                      t["kind"].to_pylist(),
                                      t["payload"].to_pylist()):
            d = decode(payload, kind)
            rows.append({
                "media_id": mid, "kind": kind,
                "n_bytes": len(payload),
                "checksum": zlib.crc32(payload),
                "width": d["width"], "height": d["height"],
                "feature": d["feature"],
            })
        return pa.Table.from_pylist(rows, schema=MEDIA_META_SCHEMA)


def multimodal_meta(sf_dir: str) -> pd.DataFrame:
    """Rows-only query: synthesize media payloads from documents, decode
    through the actor pool, return typed metadata (deterministic)."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    media = synthesize_media(docs)
    meta = media.map_batches(MediaDecoder, batch_format="pyarrow",
                             batch_size=64, concurrency=2)
    df = meta.drop_columns(["feature"]).to_pandas()
    return df.sort_values("media_id").reset_index(drop=True)
