"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extract / resize / frame-sample as actor-pool stages.

Round-3 upgrade: the decode kernels are REAL for every format this
container can synthesize —

  image  P6 PPM, parsed with numpy (header + raw RGB block), no PIL needed;
         PIL remains the fallback for other image formats when importable
  audio  RIFF/WAV PCM16, parsed with the stdlib `wave` module
  video  SSUV, a deterministic multi-frame container (magic + frame-length
         table + concatenated PPM frames) whose frame SAMPLING is a real
         byte-range seek — the stand-in for mp4 keyframe extraction until a
         real codec is present

Payloads the kernels can't identify fall back to the deterministic stub
PER ROW (schema and row count never depend on payload validity), so the
actor-pool plumbing — schemas, batch sizing for large binary rows, setup
in __init__ — is exercised identically in stub and real modes.
"""

from __future__ import annotations

import hashlib
import io
import struct
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
        ("width", pa.int32()),  # image/video: pixels; audio: n_samples
        ("height", pa.int32()),  # image/video: pixels; audio: sample rate
        ("feature", pa.list_(pa.float32(), 8)),  # per-kind 8-bucket feature
    ]
)

FRAME_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("frame_no", pa.int32()),
        ("frame_payload", pa.binary()),  # one P6 PPM per frame
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)

RESIZED_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("payload", pa.binary()),  # re-encoded P6 PPM
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


# ------------------------------------------------------------- codecs
# Deterministic generators (synthesis) and their exact inverse parsers.


def ppm_encode(pixels: np.ndarray) -> bytes:
    """uint8 (h, w, 3) -> P6 PPM bytes."""
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def ppm_decode(payload: bytes) -> np.ndarray | None:
    """P6 PPM bytes -> uint8 (h, w, 3), or None if not a P6 stream."""
    if not payload.startswith(b"P6"):
        return None
    try:
        # header: magic, whitespace-separated w h maxval, ONE whitespace
        parts = payload.split(maxsplit=4)
        w, h, maxval = int(parts[1]), int(parts[2]), int(parts[3])
        if maxval != 255:
            return None
        body = payload[len(payload) - w * h * 3:]
        px = np.frombuffer(body, dtype=np.uint8, count=w * h * 3)
        return px.reshape(h, w, 3)
    except (ValueError, IndexError):
        return None


def make_ppm(doc_id: int, text: str) -> bytes:
    """Deterministic small RGB image: dims from doc_id, pixels from a
    blake2b stream over the text (repeated to fill)."""
    w = 8 + (doc_id % 24)
    h = 8 + ((doc_id * 7) % 24)
    need = w * h * 3
    seed = hashlib.blake2b(text.encode("utf-8"), digest_size=32).digest()
    reps = need // len(seed) + 1
    px = np.frombuffer((seed * reps)[:need], dtype=np.uint8).reshape(h, w, 3)
    return ppm_encode(px)


def make_wav(doc_id: int) -> bytes:
    """Deterministic PCM16 mono WAV: 8 kHz sine, doc-dependent freq/len."""
    import wave

    rate = 8000
    n = 160 + (doc_id % 160)
    freq = 100.0 + (doc_id % 400)
    t = np.arange(n, dtype=np.float64) / rate
    pcm = (np.sin(2 * np.pi * freq * t) * 12000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def wav_decode(payload: bytes) -> tuple[np.ndarray, int] | None:
    """WAV bytes -> (mono int16 samples, sample_rate), None if not RIFF."""
    import wave

    if not payload.startswith(b"RIFF"):
        return None
    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            if wf.getsampwidth() != 2:
                return None
            raw = wf.readframes(wf.getnframes())
            pcm = np.frombuffer(raw, dtype="<i2")
            if wf.getnchannels() > 1:
                pcm = pcm.reshape(-1, wf.getnchannels()).mean(axis=1)
            return pcm.astype(np.float64), wf.getframerate()
    except (wave.Error, EOFError):
        return None


SSUV_MAGIC = b"SSUV"


def make_ssuv(doc_id: int, text: str) -> bytes:
    """Deterministic multi-frame container: magic + uint32 frame count +
    uint32 frame-length table + concatenated P6 PPM frames."""
    n_frames = 2 + (doc_id % 3)
    frames = [make_ppm(doc_id + i * 1013, f"{text}#{i}")
              for i in range(n_frames)]
    head = SSUV_MAGIC + struct.pack("<I", n_frames)
    head += b"".join(struct.pack("<I", len(f)) for f in frames)
    return head + b"".join(frames)


def ssuv_frame_table(payload: bytes) -> list[tuple[int, int]] | None:
    """SSUV bytes -> [(offset, length)] per frame WITHOUT touching frame
    bytes — the byte-range seek a real keyframe index enables."""
    if not payload.startswith(SSUV_MAGIC):
        return None
    try:
        (n,) = struct.unpack_from("<I", payload, 4)
        lens = struct.unpack_from("<%dI" % n, payload, 8)
        off = 8 + 4 * n
        out = []
        for ln in lens:
            out.append((off, ln))
            off += ln
        return out if off <= len(payload) else None
    except struct.error:
        return None


def synthesize_media(docs_ds: ray.data.Dataset) -> ray.data.Dataset:
    """Derive deterministic REAL binary payloads from the flat documents
    table (no external data): P6 image / PCM WAV / SSUV multi-frame
    container, kind by doc_id mod 3."""

    def make(t: pa.Table) -> pa.Table:
        rows = []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            kind = ("image", "audio", "video")[doc_id % 3]
            if kind == "image":
                payload, ctype = make_ppm(doc_id, text), "image/x-portable-pixmap"
            elif kind == "audio":
                payload, ctype = make_wav(doc_id), "audio/wav"
            else:
                payload, ctype = make_ssuv(doc_id, text), "video/x-ssuv"
            rows.append({"media_id": f"m{doc_id}", "kind": kind,
                         "payload": payload, "content_type": ctype})
        return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)

    return docs_ds.map_batches(make, batch_format="pyarrow")


# ------------------------------------------------------------- decode


def _luma_buckets(px: np.ndarray) -> list[float]:
    """8-bucket column-mean grayscale feature of an (h, w, 3) image."""
    gray = px.astype(np.float32).mean(axis=2) / 255.0
    cols = np.array_split(gray.mean(axis=0), 8)
    return [float(c.mean()) if c.size else 0.0 for c in cols]


class MediaDecoder:
    """Actor-pool decode stage. __init__ probes the optional codecs once;
    __call__ decodes a batch of binary payloads into typed metadata +
    features. Use small batch_size: payload bytes dominate block size."""

    def __init__(self, strict: bool = False):
        self.strict = strict  # strict=True surfaces the unimplemented codecs
        try:  # optional: broadens the image path beyond PPM
            import PIL.Image  # type: ignore # noqa: F401

            self.have_pil = True
        except ImportError:
            self.have_pil = False

    def _decode_stub(self, payload: bytes, kind: str) -> dict:
        if self.strict:
            raise NotImplementedError(
                "payload is not PPM/WAV/SSUV and no optional codec "
                "(PIL/torchaudio/pyav) can identify it")
        # deterministic fake decode: dims/features from a keyed hash
        h = hashlib.blake2b(payload, digest_size=16).digest()
        w = 64 + h[0] % 192
        feat = np.frombuffer(h, dtype=np.uint8).astype(np.float32) / 255.0
        return {"width": w, "height": 64 + h[1] % 192,
                "feature": feat[:8].tolist()}

    def _decode_pil(self, payload: bytes) -> dict | None:
        if not self.have_pil:
            return None
        import PIL.Image  # deferred: only reachable when have_pil

        try:
            img = PIL.Image.open(io.BytesIO(payload))
            w, h = img.size
            g = img.convert("L").resize((8, 1))
            feat = (np.asarray(g, dtype=np.float32).ravel() / 255.0)
            return {"width": int(w), "height": int(h),
                    "feature": feat[:8].tolist()}
        except Exception:  # noqa: BLE001 — unidentifiable, try next codec
            return None

    def _decode(self, payload: bytes, kind: str) -> dict:
        """Real in-container codecs first, optional PIL next, stub last."""
        if kind == "image":
            px = ppm_decode(payload)
            if px is not None:
                return {"width": px.shape[1], "height": px.shape[0],
                        "feature": _luma_buckets(px)}
            d = self._decode_pil(payload)
            if d is not None:
                return d
        elif kind == "audio":
            dec = wav_decode(payload)
            if dec is not None:
                pcm, rate = dec
                # 8-bucket RMS envelope, normalized to int16 full scale
                chunks = np.array_split(pcm, 8)
                feat = [float(np.sqrt(np.mean(c * c)) / 32768.0)
                        if c.size else 0.0 for c in chunks]
                return {"width": len(pcm), "height": rate, "feature": feat}
        elif kind == "video":
            table = ssuv_frame_table(payload)
            if table:
                off, ln = table[0]
                px = ppm_decode(payload[off:off + ln])
                if px is not None:
                    return {"width": px.shape[1], "height": px.shape[0],
                            "feature": _luma_buckets(px)}
        return self._decode_stub(payload, kind)

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = []
        for mid, kind, payload in zip(t["media_id"].to_pylist(),
                                      t["kind"].to_pylist(),
                                      t["payload"].to_pylist()):
            d = self._decode(payload, kind)
            rows.append({
                "media_id": mid, "kind": kind,
                "n_bytes": len(payload),
                "checksum": zlib.crc32(payload),
                "width": d["width"], "height": d["height"],
                "feature": d["feature"],
            })
        return pa.Table.from_pylist(rows, schema=MEDIA_META_SCHEMA)


# ------------------------------------------- frame-sample and resize


class FrameSampler:
    """Actor-pool frame-sample stage over SSUV video payloads: every k-th
    frame extracts via the container's length table (byte-range slice —
    frames we skip are never decoded or copied)."""

    def __init__(self, every_k: int = 2):
        self.k = max(1, every_k)

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = []
        for mid, payload in zip(t["media_id"].to_pylist(),
                                t["payload"].to_pylist()):
            table = ssuv_frame_table(payload)
            if table is None:
                continue  # not a video container: drop, like a parse skip
            for frame_no in range(0, len(table), self.k):
                off, ln = table[frame_no]
                frame = payload[off:off + ln]
                px = ppm_decode(frame)
                if px is None:
                    continue
                rows.append({"media_id": mid, "frame_no": frame_no,
                             "frame_payload": frame,
                             "width": px.shape[1], "height": px.shape[0]})
        return pa.Table.from_pylist(rows, schema=FRAME_SCHEMA)


class ImageResizer:
    """Actor-pool nearest-neighbor resize for PPM payloads: decode ->
    integer index gather -> re-encode. Non-PPM rows are dropped (a real
    deployment would route them to the PIL/codec pool instead)."""

    def __init__(self, width: int = 16, height: int = 16):
        self.w, self.h = width, height

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = []
        for mid, payload in zip(t["media_id"].to_pylist(),
                                t["payload"].to_pylist()):
            px = ppm_decode(payload)
            if px is None:
                continue
            sh, sw, _ = px.shape
            yi = (np.arange(self.h) * sh) // self.h
            xi = (np.arange(self.w) * sw) // self.w
            out = px[yi][:, xi]
            rows.append({"media_id": mid, "payload": ppm_encode(out),
                         "width": self.w, "height": self.h})
        return pa.Table.from_pylist(rows, schema=RESIZED_SCHEMA)


# ------------------------------------------------------------ queries


def multimodal_meta(sf_dir: str) -> pd.DataFrame:
    """Rows-only query: synthesize media payloads from documents, decode
    through the actor pool, return typed metadata (deterministic; image
    and audio dims are REAL decode output, not hashes)."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    media = synthesize_media(docs)
    meta = media.map_batches(MediaDecoder, batch_format="pyarrow",
                             batch_size=64, concurrency=2)
    df = meta.drop_columns(["feature"]).to_pandas()
    return df.sort_values("media_id").reset_index(drop=True)


def media_frame_sample(sf_dir: str, every_k: int = 2) -> pd.DataFrame:
    """Rows-only query: video payloads -> byte-range frame sampling ->
    per-media sampled-frame count + first sampled frame's dims."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    vids = synthesize_media(docs).filter(
        expr="kind == 'video'")
    frames = vids.map_batches(FrameSampler(every_k), batch_format="pyarrow",
                              batch_size=64, concurrency=2)
    df = frames.drop_columns(["frame_payload"]).to_pandas()
    if df.empty:
        return pd.DataFrame({"media_id": pd.Series(dtype="object"),
                             "n_frames": pd.Series(dtype="int64"),
                             "width": pd.Series(dtype="int32"),
                             "height": pd.Series(dtype="int32")})
    first = (df.sort_values(["media_id", "frame_no"])
             .drop_duplicates("media_id")[["media_id", "width", "height"]])
    counts = (df.groupby("media_id", as_index=False).size()
              .rename(columns={"size": "n_frames"}))
    counts["n_frames"] = counts["n_frames"].astype("int64")
    out = counts.merge(first, on="media_id")
    return out.sort_values("media_id").reset_index(drop=True)


def media_resize(sf_dir: str, width: int = 16, height: int = 16
                 ) -> pd.DataFrame:
    """Rows-only query: image payloads -> nearest-neighbor resize ->
    (media_id, out dims, re-encoded size, checksum of resized bytes)."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    imgs = synthesize_media(docs).filter(expr="kind == 'image'")
    resized = imgs.map_batches(ImageResizer(width, height),
                               batch_format="pyarrow",
                               batch_size=64, concurrency=2)

    def summarize(t: pa.Table) -> pa.Table:
        return pa.table({
            "media_id": t["media_id"],
            "width": t["width"], "height": t["height"],
            "n_bytes": pa.array([len(p) for p in t["payload"].to_pylist()],
                                pa.int64()),
            "checksum": pa.array(
                [zlib.crc32(p) for p in t["payload"].to_pylist()],
                pa.int64())})

    df = resized.map_batches(summarize, batch_format="pyarrow").to_pandas()
    return df.sort_values("media_id").reset_index(drop=True)
