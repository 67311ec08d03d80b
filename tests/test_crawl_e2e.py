"""End-to-end crawl replay vs the generation-metadata oracle (BASELINE.md):
per-host issue ordering, URL-seen membership, outcome sets, span-sequence
equality, full post field equality — plus kill/resume correctness."""

import shutil

import pytest
from pathlib import Path


def test_crawl_matches_oracle(corpus, crawl_out):
    from ssufid_ray.pipelines.verify import compare_crawl

    (d, meta), (out, _) = corpus, crawl_out
    rep = compare_crawl(d, out)
    assert rep["problems"] == []
    assert rep["span_pass_rate"] == 1.0
    assert rep["docs_checked"] == meta["n_docs"]


def test_metrics_written(crawl_out):
    import pyarrow.parquet as pq

    out, manifest = crawl_out
    assert manifest["scout_done"] and manifest["fetch_done"]
    m = pq.read_table(Path(out) / "metrics.parquet").to_pylist()
    keys = {r["key"] for r in m}
    assert "fetched" in keys and any(k.startswith("plugin:") for k in keys)


def test_resume_after_kill(corpus, crawl_out):
    """Deleting phase-2/3 outputs (simulated mid-run kill after the scout
    checkpoint committed) and re-running with resume=True must restore the
    seen set from the shard dumps and reproduce identical final tables."""
    from ssufid_ray import storage
    from ssufid_ray.pipelines.crawl import run_crawl
    from ssufid_ray.pipelines.verify import compare_crawl

    (d, _), (out, _) = corpus, crawl_out
    resumed = "/tmp/ssufid_test/crawl_resumed"
    shutil.rmtree(resumed, ignore_errors=True)
    shutil.copytree(out, resumed)
    # kill after phase 1: phase 2/3 outputs lost, manifest says scout_done only
    shutil.rmtree(Path(resumed) / "posts")
    (Path(resumed) / "metrics.parquet").unlink()
    storage.write_manifest(str(Path(resumed) / "manifest.json"), {"scout_done": True})

    m2 = run_crawl(d, resumed, resume=True)
    assert m2["fetch_done"] and m2["metrics_done"]
    rep = compare_crawl(d, resumed)
    assert rep["problems"] == []
    assert rep["span_pass_rate"] == 1.0


def test_politeness_budget_accounting(corpus):
    """With politeness_scale>0 the per-host clock must actually space
    fetches (wordpress/mod.rs:146 semantics)."""
    import time

    from ssufid_ray.sources.pagestore import PageStoreClient

    d, _ = corpus
    store = PageStoreClient(d, politeness_scale=1.0)
    import pyarrow.parquet as pq

    host = "notice.ssu.ac.kr"
    urls = pq.read_table(Path(d) / "pages" / f"{host}.parquet", columns=["url"])
    u = urls["url"][0].as_py()
    t = time.monotonic()
    for _ in range(3):
        store.get(u, host, politeness_ms=50)
    assert time.monotonic() - t >= 0.08  # ≥2 enforced 50ms gaps
    assert store.virtual_wait_ms >= 150


def test_strict_politeness_spacing(corpus):
    """politeness_scale=1 must space fetches per host: the most-loaded
    wordpress host's budget bounds the wall time from below."""
    import time

    from ssufid_ray.pipelines.crawl import run_crawl
    from ssufid_ray.pipelines.verify import compare_crawl

    d, _ = corpus
    out = "/tmp/ssufid_test/crawl_polite"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.monotonic()
    run_crawl(d, out, politeness_scale=0.02)
    elapsed = time.monotonic() - t0
    rep = compare_crawl(d, out)
    assert rep["problems"] == []  # strict mode changes timing, not results
    assert elapsed > 0.5  # budget-enforced spacing is actually happening


def test_include_exclude_and_limit_override(corpus):
    """Reference CLI -i/-e/-l semantics (cli/main.rs:82-94, macros.rs:46-113)."""
    import collections

    import pyarrow.dataset as pads
    import pytest as _pytest

    from ssufid_ray import storage
    from ssufid_ray.pipelines.crawl import run_crawl

    d, _ = corpus
    seeds = storage.read_table(d + "/seeds.parquet").to_pylist()
    chosen = sorted({r["board_id"] for r in seeds})[:3]

    out = "/tmp/ssufid_test/crawl_include"
    shutil.rmtree(out, ignore_errors=True)
    run_crawl(d, out, include=chosen, posts_limit=5)
    docs = pads.dataset(Path(out) / "posts", partitioning="hive").to_table(
        columns=["plugin_id", "outcome"]).to_pylist()
    per_board = collections.Counter(
        r["plugin_id"] for r in docs if r["outcome"] in ("fetched", "embedded"))
    assert set(per_board) <= set(chosen)
    assert per_board and all(n <= 5 for n in per_board.values())

    out2 = "/tmp/ssufid_test/crawl_exclude"
    shutil.rmtree(out2, ignore_errors=True)
    run_crawl(d, out2, exclude=chosen, posts_limit=3)
    docs2 = pads.dataset(Path(out2) / "posts", partitioning="hive").to_table(
        columns=["plugin_id"]).to_pylist()
    assert not ({r["plugin_id"] for r in docs2} & set(chosen))

    with _pytest.raises(ValueError):
        run_crawl(d, "/tmp/ssufid_test/x", include=[chosen[0]], exclude=[chosen[1]])
    with _pytest.raises(ValueError, match="unknown board id"):
        run_crawl(d, "/tmp/ssufid_test/x2", include=["no-such-board"])
    with _pytest.raises(ValueError, match="different filters"):
        run_crawl(d, out, include=None)  # out holds the include-filtered run


def test_fetch_retry_metric_and_crawl_delay(corpus, crawl_out):
    """Flaky pages produce a fetch_retry count (K5); robots Crawl-delay
    raises the effective politeness for its host."""
    import pyarrow.parquet as pq

    from ssufid_ray.functions.robots import crawl_delay_ms, parse_robots

    (d, _), (out, _) = corpus, crawl_out
    m = {r["key"]: r["count"] for r in
         pq.read_table(Path(out) / "metrics.parquet").to_pylist()}
    assert m.get("fetch_retry", 0) > 0
    rp = parse_robots(b"User-agent: *\nCrawl-delay: 2\n")
    assert crawl_delay_ms(rp) == 2000
    assert crawl_delay_ms(parse_robots(b"User-agent: *\n")) == 0


def test_pipelined_fetch_parity(corpus, crawl_out):
    """The pipelined scout→fetch path (chunks fired per-host as finalizes
    land; the session default) and the phase-barrier Dataset path must
    produce byte-identical posts + metrics — the overlap is scheduling
    only, never semantics."""
    import pyarrow.dataset as pads

    from ssufid_ray.pipelines.crawl import run_crawl

    (d, _), (out_pipe, _) = corpus, crawl_out
    out_bar = "/tmp/ssufid_test/crawl_barrier"
    shutil.rmtree(out_bar, ignore_errors=True)
    run_crawl(d, out_bar, pipeline_fetch=False)

    import pyarrow as pa

    def posts(out):
        t = pads.dataset(str(Path(out) / "posts"), partitioning="hive") \
            .to_table()
        keys = [(c, "ascending") for c in sorted(t.column_names)
                if not pa.types.is_nested(t.schema.field(c).type)]
        return t.sort_by(keys).combine_chunks()

    a, b = posts(out_pipe), posts(out_bar)
    assert a.schema.equals(b.schema)
    assert a.num_rows == b.num_rows
    assert a.equals(b)

    def metrics(out):
        import pyarrow.parquet as pq

        return sorted(map(tuple, (
            (r["key"], r["count"]) for r in
            pq.read_table(Path(out) / "metrics.parquet").to_pylist())))

    assert metrics(out_pipe) == metrics(out_bar)


@pytest.mark.parametrize("seed", [7, 99])
def test_crawl_matches_oracle_other_seeds(ray_session, seed):
    """The replay must hold for ANY deterministic corpus, not just seed 42."""
    from ssufid_ray.pipelines.crawl import run_crawl
    from ssufid_ray.pipelines.verify import compare_crawl
    from ssufid_ray.synth import ensure_corpus

    d, meta = ensure_corpus(scale=0.1, seed=seed)
    out = f"/tmp/ssufid_test/crawl_seed{seed}"
    shutil.rmtree(out, ignore_errors=True)
    run_crawl(d, out)
    rep = compare_crawl(d, out)
    assert rep["problems"] == []
    assert rep["span_pass_rate"] == 1.0
