from ssufid_ray.state.filters import BloomFilter, CuckooFilter


def test_bloom_membership_and_fpp():
    bf = BloomFilter(capacity=10_000, fpp=0.01)
    keys = [f"http://h{i}.kr/p{i}" for i in range(5_000)]
    for k in keys:
        bf.add(k)
    assert all(k in bf for k in keys)  # no false negatives, ever
    probes = [f"http://absent{i}.kr/x" for i in range(5_000)]
    fp = sum(1 for p in probes if p in bf)
    assert fp / len(probes) < 0.03  # ~target fpp with slack


def test_bloom_dump_load_roundtrip():
    bf = BloomFilter(1000, 0.01)
    bf.add("a")
    bf.add("b")
    bf2 = BloomFilter.load(bf.dump())
    assert "a" in bf2 and "b" in bf2 and "c" not in bf2


def test_cuckoo_add_contains_delete():
    cf = CuckooFilter(capacity=10_000, seed=3)
    keys = [f"url-{i}" for i in range(5_000)]
    assert all(cf.add(k) for k in keys)
    assert all(k in cf for k in keys)
    assert cf.delete("url-0")
    # re-add works after delete
    assert cf.add("url-0")
    fp = sum(1 for i in range(5_000) if f"absent-{i}" in cf)
    assert fp / 5_000 < 0.01  # 16-bit fingerprints -> tiny fp rate


def test_cuckoo_dump_load_roundtrip():
    cf = CuckooFilter(1000, seed=7)
    for i in range(100):
        cf.add(f"k{i}")
    cf2 = CuckooFilter.load(cf.dump())
    assert all(f"k{i}" in cf2 for i in range(100))
    assert cf2.size == cf.size
