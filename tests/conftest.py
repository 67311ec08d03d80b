import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE = 0.12


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=8,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus(ray_session):
    from ssufid_ray.synth import ensure_corpus

    d, meta = ensure_corpus(scale=SCALE)
    return d, meta


@pytest.fixture(scope="session")
def crawl_out(corpus):
    from ssufid_ray.pipelines.crawl import run_crawl

    d, _ = corpus
    out = "/tmp/ssufid_test/crawl_out"
    shutil.rmtree(out, ignore_errors=True)
    manifest = run_crawl(d, out)
    return out, manifest
