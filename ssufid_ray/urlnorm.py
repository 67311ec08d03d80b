"""URL canonicalization and joining.

Mirrors the reference's Url::parse + join + query-pair handling (SURVEY §2.3
M7; e.g. /root/reference/plugins/chemeng/src/lib.rs:180-195,
/root/reference/plugins/ee/src/lib.rs:129-147): lowercase scheme/host, strip
fragments, drop default ports, resolve relative hrefs against a base,
stable-sort query pairs so two spellings of the same URL dedup to one key.

Pure functions — safe to call from any map_batches stage. The vectorized
entry point `canonicalize_column` operates on an Arrow string array.
"""

from __future__ import annotations

import re

from urllib.parse import parse_qsl, quote, urlencode, urljoin, urlsplit, urlunsplit

import pyarrow as pa

_DEFAULT_PORTS = {"http": "80", "https": "443"}

# pchar set plus '%' so already-encoded sequences are not double-encoded —
# quoting is then idempotent (hypothesis: test_canonicalize_idempotent)
_PATH_SAFE = "/%!$&'()*+,;=:@~-._"

# Fast-path detector: a URL matching this is ALREADY in canonical form
# (lowercase http(s) scheme, lowercase host with no port/userinfo, a
# non-empty path of chars that quote() leaves untouched with no '%', no
# fragment, and at most one query pair — trivially sorted — whose key and
# value survive urlencode unchanged). For matches canonicalize is the
# identity, skipping urlsplit/quote/parse_qsl/urlencode entirely: ~10x on
# the hot join() path, and the overwhelmingly common shape for URLs the
# strategies construct. Equivalence vs the full path is property-pinned
# (tests/test_urlnorm.py: fast==full on hypothesis + corpus URLs).
_CANONICAL_RE = re.compile(
    r"^https?://"
    r"[a-z0-9]([a-z0-9.-]*[a-z0-9])?"          # host: no port, no '@'
    r"/[A-Za-z0-9/!$&'()*+,;=:@~\-._]*"        # path: quote()-stable, no %
    r"(\?[A-Za-z0-9\-._~]+=[A-Za-z0-9\-._~]*)?$"  # <=1 urlencode-stable pair
)


def canonicalize(url: str) -> str:
    """Canonical form: lowercase scheme+host, no fragment, no default port,
    percent-encoded path, sorted query pairs, '/' path for empty path."""
    u = url.strip()
    if _CANONICAL_RE.match(u):
        return u
    return _canonicalize_full(u)


def _canonicalize_full(url: str) -> str:
    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower()
    host = parts.hostname.lower() if parts.hostname else ""
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = quote(parts.path or "/", safe=_PATH_SAFE)
    query = urlencode(sorted(parse_qsl(parts.query, keep_blank_values=True)))
    return urlunsplit((scheme, netloc, path, query, ""))


def join(base: str, href: str) -> str:
    """Resolve a (possibly relative) href against a base URL, canonicalized.
    Absolute http(s) hrefs skip urljoin — it returns them unchanged."""
    if href.startswith("http://") or href.startswith("https://"):
        return canonicalize(href)
    return canonicalize(urljoin(base, href))


def host_of(url: str) -> str:
    return urlsplit(url).hostname or ""


def query_param(url: str, name: str) -> str | None:
    """First value of a query parameter, or None (reference uses this to
    extract board-local ids like wr_id/idx/slug)."""
    for k, v in parse_qsl(urlsplit(url).query, keep_blank_values=True):
        if k == name:
            return v
    return None


def canonicalize_column(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Canonicalize an Arrow string column. Python-level loop is acceptable
    here: urlsplit dominates and there is no vectorized kernel; this stage is
    never the bottleneck (parse/fetch are)."""
    return pa.array(
        [canonicalize(u) if u is not None else None for u in urls.to_pylist()],
        type=pa.string(),
    )


def shard_of(host: str, num_shards: int) -> int:
    """Stable host-hash shard id (seen-set partitioning key, SURVEY §7.3).

    Uses a simple FNV-1a over the host string — stable across processes
    (unlike Python's salted hash())."""
    h = 0xCBF29CE484222325
    for b in host.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h % num_shards
