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


def test_stratified_sample_deterministic(ray_session):
    from ssufid_ray.stages.sampling import stratified_sample

    a = stratified_sample(SF)
    b = stratified_sample(SF)
    pd.testing.assert_frame_equal(a, b)
    # every language keeps SOMETHING at this corpus size, rates differ
    counts = a.groupby("lang").size()
    assert set(counts.index) == {"en", "de", "es", "fr", "zh"}


def test_fact_join_bucket_mask_poweroftwo():
    from ssufid_ray.stages.relational import FACT_JOIN_BUCKETS

    assert FACT_JOIN_BUCKETS & (FACT_JOIN_BUCKETS - 1) == 0
