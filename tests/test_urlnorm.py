from ssufid_ray.urlnorm import canonicalize, host_of, join, query_param, shard_of


def test_canonicalize_basic():
    assert canonicalize("HTTP://Ssu.ac.KR/board?b=2&a=1#frag") == (
        "http://ssu.ac.kr/board?a=1&b=2"
    )


def test_canonicalize_default_port_and_path():
    assert canonicalize("https://ssu.ac.kr:443") == "https://ssu.ac.kr/"
    assert canonicalize("http://ssu.ac.kr:8080/x") == "http://ssu.ac.kr:8080/x"


def test_join_relative():
    assert join("http://h.kr/bbs/list.php?page=2", "view.php?wr_id=7") == (
        "http://h.kr/bbs/view.php?wr_id=7"
    )
    assert join("http://h.kr/a/b/", "/c?z=1&a=2") == "http://h.kr/c?a=2&z=1"


def test_query_param():
    assert query_param("http://h.kr/v?wr_id=42&page=1", "wr_id") == "42"
    assert query_param("http://h.kr/v?page=1", "wr_id") is None


def test_shard_stability_and_spread():
    assert shard_of("scatch.ssu.ac.kr", 8) == shard_of("scatch.ssu.ac.kr", 8)
    shards = {shard_of(f"host{i}.ssu.ac.kr", 8) for i in range(64)}
    assert len(shards) >= 6  # spreads over most shards


def test_same_url_two_spellings_same_key():
    a = canonicalize("http://h.kr/bbs/view.php?page=1&wr_id=9")
    b = canonicalize("http://h.kr/bbs/view.php?wr_id=9&page=1")
    assert a == b


def test_fast_path_equals_full_path_fixed():
    """The _CANONICAL_RE fast path must be EXACTLY the identity cases of
    the full path — adversarial shapes near the regex boundary."""
    from ssufid_ray.urlnorm import _canonicalize_full

    cases = [
        "http://h.kr/",
        "http://h.kr/a/b.php",
        "https://notice.ssu.ac.kr/bbs/view.php?wr_id=42",
        "http://h.kr/a?k=",                     # blank value kept
        "http://h.kr/p!$&'()*+,;=:@~-._/x",     # full safe set
        "http://h.kr",                          # empty path -> '/'
        "http://h.kr:80/x",                     # default port dropped
        "http://h.kr:8080/x",                   # real port kept
        "HTTP://H.kr/x",                        # case folding
        "http://h.kr/x#frag",                   # fragment stripped
        "http://h.kr/x?b=2&a=1",                # multi-pair sort
        "http://h.kr/sp%20ace",                 # pre-encoded, '%' path
        "http://h.kr/x?k=v%2B",                 # encoded query value
        "http://u@h.kr/x",                      # userinfo
        "http://h.kr/안녕",             # non-ascii path
        "  http://h.kr/x  ",                    # strip
        "http://h.kr/x?",                       # bare '?'
        "http://h.kr./x",                       # trailing-dot host
    ]
    for u in cases:
        assert canonicalize(u) == _canonicalize_full(u), u


def test_fast_path_equals_full_path_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ssufid_ray.urlnorm import _canonicalize_full

    piece = st.text(
        alphabet="abcXYZ09/!$&'()*+,;=:@~-._%?#= é안", max_size=12)

    @settings(max_examples=300, deadline=None)
    @given(st.sampled_from(["http://", "https://", "HTTP://"]),
           st.sampled_from(["h.kr", "Notice.SSU.ac.kr", "h.kr:8080",
                            "h.kr:80", "a--b.c"]),
           piece, piece)
    def check(scheme, host, p1, p2):
        u = f"{scheme}{host}/{p1}{p2}"
        assert canonicalize(u) == _canonicalize_full(u)

    check()
