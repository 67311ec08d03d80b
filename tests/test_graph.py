"""Connected-components tests beyond the oracle gate: multi-round
convergence on a diameter-9 chain (labels must propagate end to end, not
just one hop) plus agreement with a driver-side union-find on the real
pair set."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"


def test_cc_chain_and_triangle(ray_session):
    import ray.data

    from ssufid_ray.stages.graph import connected_components

    edges = pd.DataFrame({"a": list(range(9)) + [100, 101, 100],
                          "b": list(range(1, 10)) + [101, 102, 102]})
    out = (connected_components(ray.data.from_pandas(edges))
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert out[out["node"] < 100]["label"].tolist() == [0] * 10
    assert out[out["node"] >= 100]["label"].tolist() == [100] * 3


def test_cc_matches_union_find(ray_session):
    from ssufid_ray.stages.dedup import ngram_jaccard_pairs
    from ssufid_ray.stages.graph import dup_clusters

    pairs = ngram_jaccard_pairs(SF)
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    want = {n: find(n) for n in parent}
    got = dup_clusters(SF)
    assert dict(zip(got["doc_id"], got["cluster_id"])) == want


def test_cc_bucketed_fold_random_graph(ray_session):
    """Parity vs a local union-find on a 100k-edge random graph over 30k
    nodes — far denser than the near-dup pair lists. The bucketed-fold
    rewrite must agree exactly; the old per-node map_groups would pay one
    Python group call per node per round here."""
    import numpy as np
    import ray.data

    from ssufid_ray.stages.graph import connected_components

    rng = np.random.default_rng(7)
    n, m = 30_000, 100_000
    a = rng.integers(0, n, m).astype("int64")
    b = rng.integers(0, n, m).astype("int64")

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(a.tolist(), b.tolist()):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    touched = set(a.tolist()) | set(b.tolist())
    want = {x: find(x) for x in touched}

    ds = ray.data.from_pandas(pd.DataFrame({"a": a, "b": b}))
    # distributed bucketed loop, forced past the size gate
    out = connected_components(ds, local_rows_max=0).to_pandas()
    assert dict(zip(out["node"], out["label"])) == want
    # gated local numpy path must agree exactly (threshold parity)
    loc = connected_components(ds).to_pandas()
    assert dict(zip(loc["node"], loc["label"])) == want


def test_cc_empty_edges(ray_session):
    import ray.data

    from ssufid_ray.stages.graph import connected_components

    empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                          "b": pd.Series(dtype="int64")})
    out = connected_components(ray.data.from_pandas(empty))
    assert out.count() == 0
    assert out.schema().names == ["node", "label"]


def test_cc_no_fixpoint_raises(ray_session):
    import ray.data

    from ssufid_ray.stages.graph import connected_components

    edges = pd.DataFrame({"a": list(range(20)), "b": list(range(1, 21))})
    with pytest.raises(RuntimeError, match="no fixpoint"):
        # local_rows_max=0: the numpy path needs no iteration budget, so
        # the max_iter contract is a distributed-loop property
        connected_components(ray.data.from_pandas(edges), max_iter=2,
                             local_rows_max=0)


def test_pagerank_bit_exact_and_path_parity(ray_session):
    """PageRank's integer contract: the registered query (gated local
    path) equals the sequential reference bit-for-bit, and the
    distributed path (forced via local_rows_max=0, 3 iterations to keep
    the suite fast — every iteration applies identical integer ops, so
    3-round equality pins the machinery) equals the same-round
    reference."""
    import pandas as pd
    import ray.data

    from ssufid_ray.stages.dedup import ngram_jaccard_pairs
    from ssufid_ray.stages.graph import (pagerank, pagerank_dup,
                                         pagerank_reference)

    sf = "/root/testdata/sf0.01"
    pairs = ngram_jaccard_pairs(sf)[["a", "b"]]
    pd.testing.assert_frame_equal(pagerank_dup(sf), pagerank_reference(pairs))
    dist = pagerank(ray.data.from_pandas(pairs), iters=3, local_rows_max=0)
    pd.testing.assert_frame_equal(dist, pagerank_reference(pairs, iters=3))


def test_pagerank_self_loop_parity_and_guard(ray_session):
    """General-input contract: the gated local path and the distributed
    path agree on inputs with self-loops and duplicate edges, and
    negative node ids are rejected (they would collide with the
    distributed attach's -1 sentinel)."""
    import pandas as pd
    import pytest
    import ray.data

    from ssufid_ray.stages.graph import pagerank

    pairs = pd.DataFrame({"a": [0, 1, 2, 3, 3, 0], "b": [1, 2, 0, 3, 0, 1]})
    loc = pagerank(ray.data.from_pandas(pairs), iters=3)
    dist = pagerank(ray.data.from_pandas(pairs), iters=3, local_rows_max=0)
    assert loc.equals(dist)

    bad = pd.DataFrame({"a": [-1], "b": [2]})
    with pytest.raises(Exception, match="non-negative"):
        pagerank(ray.data.from_pandas(bad), iters=1)
