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
