"""Cleaning/clustering operators: the parity and determinism contracts the
oracle gate can't see (it only runs each query's default path)."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_tfidf_partitioned_path_equals_broadcast(ray_session):
    """threshold-0 forces the co-partitioned token join + doc regroup;
    both paths must produce identical rows (same pin as every gated
    broadcast join in the repo)."""
    from ssufid_ray.stages.cleaning import tfidf_topk

    a = tfidf_topk(SF)
    b = tfidf_topk(SF, broadcast_rows=0)
    assert a.equals(b)


def test_paragraph_dedup_counts_local_reference(ray_session):
    """Per-doc kept/dropped counts vs a direct sequential recomputation of
    the first-occurrence-wins rule."""
    from ssufid_ray.functions.segment import segment_text
    from ssufid_ray.stages.cleaning import paragraph_dedup

    out = paragraph_dedup(SF).set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    seen: set[str] = set()
    kept: dict[int, int] = {}
    tot: dict[int, int] = {}
    for d in sorted(docs, key=lambda r: r["doc_id"]):
        chunks = segment_text(d["text"])
        tot[d["doc_id"]] = len(chunks)
        n = 0
        for c in chunks:
            if c not in seen:
                seen.add(c)
                n += 1
        kept[d["doc_id"]] = n
    for doc_id in tot:
        row = out.loc[doc_id]
        assert row["n_spans"] == tot[doc_id]
        assert row["n_kept"] == kept[doc_id], doc_id
        assert row["n_dropped"] == tot[doc_id] - kept[doc_id]


def test_kmeans_matches_sequential_reference(ray_session):
    """The distributed fixed-point Lloyd must equal the sequential
    reference bit-for-bit (same init, same quantization) — this is the
    determinism contract that makes the rows-only registration stable."""
    from ssufid_ray.functions.emb import emb_matrix
    from ssufid_ray.stages.clustering import kmeans_clusters, kmeans_reference

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    order = np.argsort(np.asarray(t["vec_id"]))
    X = emb_matrix(t["embedding"])[order]
    want = kmeans_reference(X)

    got = kmeans_clusters(SF)
    assert (got["vec_id"].to_numpy() == np.arange(len(X))).all()
    np.testing.assert_array_equal(got["cluster"].to_numpy(), want)


def test_kmeans_run_invariance(ray_session):
    """Two runs (different block plans possible) produce identical
    assignments — the integer-fold guarantee."""
    from ssufid_ray.stages.clustering import kmeans_clusters

    a = kmeans_clusters(SF)
    b = kmeans_clusters(SF)
    assert a.equals(b)


def test_shuffle_shards_balance_and_determinism(ray_session):
    """Shard assignment is md5-deterministic and roughly balanced (the
    property that makes partitioned shuffle writes skew-free)."""
    from ssufid_ray.stages.cleaning import shuffle_shards

    out = shuffle_shards(SF)
    assert out["shard"].between(0, 15).all()
    sizes = out.groupby("shard").size()
    assert len(sizes) > 8  # sf0.001 has 50 docs; most shards hit
    assert shuffle_shards(SF).equals(out)
