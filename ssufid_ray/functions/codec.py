"""Compressed-XHR payload codec (S10).

The reference's study plugin speaks an lz-string-UTF16-compressed XHR
protocol (/root/reference/plugins/study/src/lib.rs:23-63). No lz-string
implementation ships in this sandbox, so the synthetic corpus and the
engine agree on a zlib+base64 stand-in with identical call structure
(request/response bodies are opaque compressed blobs that the fetch actor
must decode before parsing). Swapping in real lz-string is a two-function
change here."""

from __future__ import annotations

import base64
import json
import zlib
from typing import Any


def encode_payload(obj: Any) -> bytes:
    return base64.b64encode(zlib.compress(
        json.dumps(obj, ensure_ascii=False, sort_keys=True).encode("utf-8")))


def decode_payload(blob: bytes) -> Any:
    return json.loads(zlib.decompress(base64.b64decode(blob)).decode("utf-8"))
