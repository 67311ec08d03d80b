"""Sampling / quantile operator tests beyond the oracle gate:
- exact_quantiles' skew fallback (recursive narrowing) must agree with the
  single-collect fast path — forced by shrinking COLLECT_LIMIT so every
  target bin overflows.
- stratified_sample is a pure row-hash decision: rerunning must be
  byte-identical (resumability contract).
- fact_fact_join's bucket count is a power of two (the & mask requires it).
"""

import pandas as pd

SF = "/root/testdata/sf0.01"


def test_exact_quantiles_skew_fallback_matches(ray_session, monkeypatch):
    from ssufid_ray.stages import sampling

    fast = sampling.exact_quantiles(SF)
    monkeypatch.setattr(sampling, "COLLECT_LIMIT", 10)  # every bin "skewed"
    slow = sampling.exact_quantiles(SF)
    pd.testing.assert_frame_equal(fast, slow)


def test_kth_smallest_terminates_on_heavy_multiplicity(ray_session, monkeypatch):
    """A single value repeated more than COLLECT_LIMIT times must not
    loop forever in the range-narrowing (identical values never split
    across bins) — the per-value-count terminator handles it."""
    import ray.data

    from ssufid_ray.stages import sampling

    monkeypatch.setattr(sampling, "COLLECT_LIMIT", 50)
    ds = ray.data.from_items([{"v": 7.5}] * 200 + [{"v": 1.0}] * 10
                             + [{"v": 9.0}] * 10)
    assert sampling._kth_smallest(ds, 11, 1.0, 9.0) == 7.5   # first of the 7.5s
    assert sampling._kth_smallest(ds, 210, 1.0, 9.0) == 7.5  # last of them
    assert sampling._kth_smallest(ds, 211, 1.0, 9.0) == 9.0


def test_stratified_sample_unknown_lang_drops_row(ray_session):
    """Engine and oracle must agree on languages outside SAMPLE_RATES:
    both drop the row (oracle CASE without ELSE -> NULL comparison)."""
    import numpy as np
    import pyarrow as pa

    from ssufid_ray.stages.sampling import SAMPLE_RATES, _keep_hash

    h = _keep_hash(np.array([123], dtype=np.int64)) % 1000
    rates = np.array([SAMPLE_RATES.get("ja", 0)], dtype=np.int64)
    assert not (h < rates).any()
    tbl = pa.table({"doc_id": pa.array([123], pa.int64()),
                    "lang": pa.array(["ja"]),
                    "n_chars": pa.array([10], pa.int64())})
    assert len(tbl.filter(pa.array(h < rates))) == 0


def test_stratified_sample_deterministic(ray_session):
    from ssufid_ray.stages.sampling import stratified_sample

    a = stratified_sample(SF)
    b = stratified_sample(SF)
    pd.testing.assert_frame_equal(a, b)
    # every language keeps SOMETHING at this corpus size, rates differ
    counts = a.groupby("lang").size()
    assert set(counts.index) == {"en", "de", "es", "fr", "zh"}


def test_corpus_mix_hits_exact_quotas(ray_session):
    """The output must contain exactly k_s docs per language (the integer
    quota formula), and rerunning must be byte-identical."""
    import duckdb

    from ssufid_ray.stages.sampling import _mix_quota, corpus_mix

    counts = dict(duckdb.sql(
        f"SELECT lang, COUNT(*) FROM read_parquet('{SF}/documents.parquet') "
        "GROUP BY lang").fetchall())
    quota = _mix_quota({k: int(v) for k, v in counts.items()})
    out = corpus_mix(SF)
    assert out.groupby("lang").size().to_dict() == {k: v for k, v in quota.items()
                                                   if v > 0}
    pd.testing.assert_frame_equal(out, corpus_mix(SF))


def test_decontaminate_drops_benchmark_and_dups(ray_session):
    """No benchmark doc (doc_id < 50) survives, and no surviving doc
    shares a fingerprint with the benchmark set."""
    import duckdb

    from ssufid_ray.stages.sampling import DECON_BENCH_MAX, decontaminate

    out = decontaminate(SF)
    assert (out["doc_id"] >= DECON_BENCH_MAX).all()
    n_dups = duckdb.sql(f"""
        WITH d AS (SELECT doc_id, md5(lower(trim(text))) fp
                   FROM read_parquet('{SF}/documents.parquet'))
        SELECT COUNT(*) FROM d
        WHERE doc_id >= {DECON_BENCH_MAX}
          AND fp IN (SELECT fp FROM d WHERE doc_id < {DECON_BENCH_MAX})
        """).fetchone()[0]
    total = duckdb.sql(f"SELECT COUNT(*) FROM read_parquet('{SF}/documents.parquet')").fetchone()[0]
    assert len(out) == total - DECON_BENCH_MAX - n_dups


def test_sequence_pack_invariants(ray_session):
    """Budget respected (except single oversized docs), sequences never
    span a packing partition, greedy: each new sequence starts only
    because its first doc would not fit the previous one."""
    import re

    import duckdb

    from ssufid_ray.stages.sampling import (PACK_BUDGET, PACK_PART_DOCS,
                                            sequence_pack)

    out = sequence_pack(SF)
    ws = re.compile(r"[^\s]+", re.ASCII)
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')").df()
    dl = {int(r.doc_id): len(ws.findall(r.text)) for r in docs.itertuples()}
    out = out.assign(dl=out["doc_id"].map(dl),
                     part=out["doc_id"] // PACK_PART_DOCS)

    g = out.groupby("seq_id")
    fills = g["dl"].sum()
    sizes = g.size()
    assert ((fills <= PACK_BUDGET) | (sizes == 1)).all()
    assert (g["part"].nunique() == 1).all()  # no seq spans a partition
    # greedy within partition: first doc of seq k+1 would overflow seq k
    for _, grp in out.groupby("part"):
        seq_fill = grp.groupby("seq_id")["dl"].sum()
        first_dl = grp.groupby("seq_id")["dl"].first()
        seqs = sorted(seq_fill.index)
        for prev, nxt in zip(seqs, seqs[1:]):
            assert seq_fill[prev] + first_dl[nxt] > PACK_BUDGET


def test_fact_join_bucket_mask_poweroftwo():
    from ssufid_ray.stages.relational import FACT_JOIN_BUCKETS

    assert FACT_JOIN_BUCKETS & (FACT_JOIN_BUCKETS - 1) == 0


def test_dsir_weights_match_sequential_reference(ray_session):
    """dsir_weights == an independent sequential implementation of the
    DSIR bag model (hashed unigram+bigram log-likelihood ratio, +1
    smoothing), bit-exact, and the target language is upweighted."""
    import re
    import zlib

    import numpy as np
    import pyarrow.parquet as pq

    from ssufid_ray.stages.sampling import (DSIR_BUCKETS, DSIR_TARGET_LANG,
                                            dsir_weights)

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "text", "lang"]).to_pandas()
    tok = re.compile(r"[a-z0-9']+")

    def feats(text):
        ts = tok.findall(text.lower())
        f = [zlib.crc32(x.encode()) for x in ts]
        f += [zlib.crc32((a + " " + b).encode()) for a, b in zip(ts, ts[1:])]
        return np.asarray(f, dtype=np.int64) % DSIR_BUCKETS if f else \
            np.empty(0, dtype=np.int64)

    raw = np.ones(DSIR_BUCKETS)
    tgt = np.ones(DSIR_BUCKETS)
    per_doc = {}
    for _, r in t.iterrows():
        ids = feats(r.text)
        per_doc[r.doc_id] = ids
        binc = np.bincount(ids, minlength=DSIR_BUCKETS)
        raw += binc
        if r.lang == DSIR_TARGET_LANG:
            tgt += binc
    logr = np.log(tgt / tgt.sum()) - np.log(raw / raw.sum())

    got = dsir_weights(sf).set_index("doc_id")
    for doc_id, ids in per_doc.items():
        want = float(logr[ids].sum()) if ids.size else 0.0
        assert got.loc[doc_id, "logw"] == want  # bit-exact: same fp order
        assert got.loc[doc_id, "n_feats"] == ids.size

    m = got.join(t.set_index("doc_id")["lang"])
    assert (m[m.lang == DSIR_TARGET_LANG].logw.mean()
            > m[m.lang != DSIR_TARGET_LANG].logw.mean())


def test_dsir_resample_exact_k_deterministic_target_enriched(ray_session):
    import math

    import pyarrow.parquet as pq

    from ssufid_ray.stages.sampling import (DSIR_KEEP_FRAC,
                                            DSIR_TARGET_LANG, dsir_resample)

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "lang"]).to_pandas()
    r1 = dsir_resample(sf)
    assert len(r1) == math.ceil(len(t) * DSIR_KEEP_FRAC)
    assert r1.doc_id.is_unique and set(r1.doc_id) <= set(t.doc_id)
    r2 = dsir_resample(sf)
    assert r1.equals(r2)
    m = r1.merge(t, on="doc_id")
    corpus_share = (t.lang == DSIR_TARGET_LANG).mean()
    assert (m.lang == DSIR_TARGET_LANG).mean() > corpus_share
