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
