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


def test_bloom_batch_equals_scalar_property():
    """add_batch must leave the EXACT bit pattern n scalar add()s leave —
    the seen-shard checkpoint/restore equality depends on it. Random
    key sets, duplicates included."""
    import random

    import numpy as np

    rng = random.Random(1234)
    for trial in range(20):
        n = rng.randrange(0, 200)
        keys = [f"u{rng.randrange(0, 150)}" for _ in range(n)]
        b1 = BloomFilter(1 << 14, 0.01)
        b2 = BloomFilter(1 << 14, 0.01)
        for k in keys:
            b1.add(k)
        b2.add_batch(keys)
        assert np.array_equal(b1.bits, b2.bits), f"trial {trial}"
        assert all((k in b2) for k in keys)


def test_seen_shard_batch_path_matches_reference_loop():
    """The vectorized check_and_add must give the same verdicts and final
    membership as the straightforward per-URL reference loop, across
    random call sequences with duplicates and replays."""
    import importlib
    import random

    m = importlib.import_module("ssufid_ray.state.seen")
    cls = m.SeenShardActor.__ray_metadata__.modified_class
    rng = random.Random(99)
    shard = cls(0, 1 << 16)
    ref_exact: set[str] = set()
    for call in range(30):
        urls = [f"http://h/{rng.randrange(0, 120)}"
                for _ in range(rng.randrange(0, 40))]
        got = shard.check_and_add(urls)
        want, call_seen = [], set()
        for u in urls:  # reference semantics
            if u in call_seen:
                want.append(False)
                continue
            call_seen.add(u)
            want.append(u not in ref_exact)
            ref_exact.add(u)
        assert got == want, f"call {call}"
    assert set(shard.members()) == ref_exact
