import os

import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """Deterministic 120-page corpus shared by crawl/extract tests."""
    from web_scraper_ray.corpus import build_corpus

    out = str(tmp_path_factory.mktemp("corpus"))
    build_corpus(out, n_pages=120, n_hosts=12, seed=42, n_seeds=10, links_per_page=7)
    return out


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
