"""Property-based tests (hypothesis) for pure-function invariants."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from ssufid_ray.functions.ics import escape_text, fold_line
from ssufid_ray.functions.segment import segment_text
from ssufid_ray.state.filters import BloomFilter, CuckooFilter
from ssufid_ray.urlnorm import canonicalize, join

url_path = st.text(alphabet=string.ascii_lowercase + string.digits + "/-_.", max_size=30)
qkey = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=6)
qval = st.text(alphabet=string.ascii_lowercase + string.digits, max_size=8)


@given(
    host=st.from_regex(r"[a-z]{1,10}(\.[a-z]{2,5}){1,2}", fullmatch=True),
    path=url_path,
    q=st.lists(st.tuples(qkey, qval), max_size=4),
)
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(host, path, q):
    query = "&".join(f"{k}={v}" for k, v in q)
    url = f"http://{host}/{path}" + (f"?{query}" if query else "")
    c1 = canonicalize(url)
    assert canonicalize(c1) == c1  # idempotence
    # query-pair order never matters
    if len(q) > 1:
        query2 = "&".join(f"{k}={v}" for k, v in reversed(q))
        assert canonicalize(f"http://{host}/{path}?{query2}") == c1


@given(st.text(max_size=40))
@settings(max_examples=100, deadline=None)
def test_join_absolute_wins(href):
    base = "http://h.kr/a/b?x=1"
    out = join(base, "http://other.kr/z")
    assert out.startswith("http://other.kr/")
    # join result is canonical
    assert canonicalize(join(base, href)) == join(base, href)


@given(st.lists(st.text(min_size=1, max_size=30), min_size=1, max_size=200, unique=True))
@settings(max_examples=50, deadline=None)
def test_bloom_never_false_negative(keys):
    bf = BloomFilter(capacity=max(64, len(keys)), fpp=0.01)
    for k in keys:
        bf.add(k)
    assert all(k in bf for k in keys)


@given(st.lists(st.text(min_size=1, max_size=30), min_size=1, max_size=150, unique=True))
@settings(max_examples=50, deadline=None)
def test_cuckoo_membership_and_delete(keys):
    cf = CuckooFilter(capacity=max(64, len(keys) * 4), seed=1)
    ok = [cf.add(k) for k in keys]
    for k, added in zip(keys, ok):
        if added:
            assert k in cf
    for k, added in zip(keys, ok):
        if added:
            assert cf.delete(k)


@given(st.text(max_size=400))
@settings(max_examples=200, deadline=None)
def test_fold_line_75_octets_utf8_safe(s):
    s = s.replace("\r", "").replace("\n", "")
    folded = fold_line(s)
    for ln in folded.split("\r\n"):
        assert len(ln.encode("utf-8")) <= 75
    # unfolding (strip continuation space) reproduces the input
    lines = folded.split("\r\n")
    assert lines[0] + "".join(ln[1:] for ln in lines[1:]) == s


@given(st.text(max_size=100))
@settings(max_examples=100, deadline=None)
def test_ics_escape_roundtrip_shape(s):
    e = escape_text(s)
    assert "\n" not in e
    # every comma/semicolon is escaped
    for i, ch in enumerate(e):
        if ch in ",;" and (i == 0 or e[i - 1] != "\\"):
            raise AssertionError(f"unescaped {ch!r} in {e!r}")


@given(st.text(alphabet=string.printable, max_size=500))
@settings(max_examples=100, deadline=None)
def test_segment_text_reconstructs(s):
    chunks = segment_text(s)
    assert chunks  # never empty
    assert " ".join(chunks).split() == s.split()  # token-preserving
    for c in chunks[:-1]:
        assert len(c.split()) == 10  # all but the last are full windows


# ---- merge-upsert property: engine merge vs an independent spec model


def _spec_merge(new_rows, old_rows, now):
    """Independent reference model of J1 (core/mod.rs:336-385), written as
    plainly as possible: dict upsert with trimmed-content comparison."""
    from ssufid_ray.functions.textnorm import contents_eq

    old = {r["doc_id"]: r for r in old_rows}
    out = {}
    for r in sorted(new_rows, key=lambda r: (r["created_at"], r["doc_id"])):
        o = old.get(r["doc_id"])
        if o is None:
            out[r["doc_id"]] = dict(r, outcome="created")
        elif contents_eq(o, r):
            out[r["doc_id"]] = dict(o, outcome="skipped")
        else:
            merged = dict(r, created_at=o["created_at"],
                          updated_at=r["updated_at"] or now, outcome="updated")
            out[r["doc_id"]] = merged
    for doc_id, o in old.items():
        if doc_id not in out:
            out[doc_id] = dict(o, outcome="preserved")
    return out


def _post(doc_id, title, content, created_min, updated=None):
    from datetime import datetime, timedelta

    return {
        "doc_id": doc_id, "plugin_id": doc_id.split("/")[0],
        "post_id": doc_id.split("/")[1], "url": f"http://h/{doc_id}",
        "author": None, "title": title, "description": None, "category": [],
        "created_at": datetime(2026, 1, 1) + timedelta(minutes=created_min),
        "updated_at": updated, "thumbnail": None, "content": content,
        "attachments": [], "metadata": [],
        "spans": [{"kind": "text", "text": content, "media_ref": "", "offset": 0}],
    }


posts_strategy = st.lists(
    st.tuples(st.integers(0, 7),             # doc id
              st.sampled_from(["a", "b "]),  # title (trim case)
              st.sampled_from(["x", "x ", "y"]),  # content (trim + change)
              st.integers(0, 100)),          # created offset
    max_size=8, unique_by=lambda t: t[0])


@given(new=posts_strategy, old=posts_strategy)
@settings(max_examples=40, deadline=None)
def test_merge_posts_matches_spec_model(ray_session, new, old):
    from datetime import datetime

    import ray.data

    from ssufid_ray.schema import POSTS_SCHEMA
    from ssufid_ray.stages.merge import merge_posts

    import pyarrow as pa

    now = datetime(2026, 6, 1)
    new_rows = [_post(f"b/{i}", t, c, m) for i, t, c, m in new]
    old_rows = [_post(f"b/{i}", t, c, m) for i, t, c, m in old]
    expected = _spec_merge(new_rows, old_rows, now)

    new_ds = ray.data.from_arrow(pa.Table.from_pylist(new_rows, schema=POSTS_SCHEMA))
    old_ds = ray.data.from_arrow(pa.Table.from_pylist(old_rows, schema=POSTS_SCHEMA))
    got = {r["doc_id"]: r for r in merge_posts(new_ds, old_ds, now=now,
                                               num_buckets=4).take_all()}
    assert set(got) == set(expected)
    for doc_id, e in expected.items():
        g = got[doc_id]
        for f in ("outcome", "title", "content", "created_at", "updated_at"):
            assert g[f] == e[f], (doc_id, f, e[f], g[f])


@given(s=st.text(max_size=400))
@settings(max_examples=300, deadline=None)
def test_lz_string_roundtrip_property(s):
    """compress_to_utf16 ∘ decompress_from_utf16 is the identity for any
    Python string (astral chars pass through UTF-16 surrogate pairs), and
    the container stays within the 15-bit + 32 printable-safe range."""
    from ssufid_ray.functions.codec import (compress_to_utf16,
                                            decompress_from_utf16)

    z = compress_to_utf16(s)
    assert z.endswith(" ")
    assert all(32 <= ord(ch) < 32 + (1 << 15) for ch in z[:-1])
    assert decompress_from_utf16(z) == s


@given(h=st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
                 max_size=300))
@settings(max_examples=200, deadline=None)
def test_fast_html_parser_never_crashes_and_matches_stdlib(h):
    """The fast scanner accepts arbitrary text without raising (tree
    equality with the stdlib builder is pinned separately on realistic
    pages in test_html; pathological fragments may legally differ)."""
    from ssufid_ray.functions.html import parse_html, parse_html_stdlib

    def canon(el):
        kids, buf = [], ""
        for c in el.children:
            if isinstance(c, str):
                buf += c
            else:
                if buf:
                    kids.append(("#t", buf))
                    buf = ""
                kids.append(canon(c))
        if buf:
            kids.append(("#t", buf))
        return (el.tag, tuple(sorted(el.attrs.items())), tuple(kids))

    canon(parse_html(h))  # never raises


@given(st.lists(st.decimals(min_value=0, max_value=10_000_000, places=2),
                min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_cents_contract_exact_for_two_decimal_values(vals):
    """The money-sum contract's foundation: floor(v*100 + 0.5) recovers
    the exact integer cents for ANY 2-decimal value stored as a double —
    so integer-cents sums are order-invariant where float sums are not."""
    import numpy as np

    from ssufid_ray.stages.relational import _cents

    doubles = np.array([float(v) for v in vals])
    expect = np.array([int((v * 100).to_integral_value()) for v in vals],
                      dtype=np.int64)
    assert (_cents(doubles) == expect).all()


@given(st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6),
                min_size=1, max_size=40),
       st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6),
                min_size=1, max_size=40))
@settings(max_examples=100, deadline=None)
def test_md5_chunkset_jaccard_equals_string_set_jaccard(ta, tb):
    """128-bit md5 chunk-set jaccard (the jaccard_join verify identity)
    equals string-set jaccard on arbitrary token lists."""
    import hashlib

    A, B = set(ta), set(tb)
    want = len(A & B) / len(A | B)

    def blob(s):
        return b"".join(sorted(hashlib.md5(x.encode()).digest() for x in s))

    def chunks(buf):
        return frozenset(buf[i:i + 16] for i in range(0, len(buf), 16))

    CA, CB = chunks(blob(A)), chunks(blob(B))
    inter = len(CA & CB)
    got = inter / (len(CA) + len(CB) - inter)
    assert got == want
