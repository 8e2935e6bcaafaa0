"""Crawl parity fuzz: engine == sequential model on corpora generated
from different seeds (different link graphs, host skews, seed lists) —
broader evidence than the single shared fixture."""

import pytest

from web_scraper_ray.corpus import build_corpus
from web_scraper_ray.crawl.config import CrawlConfig
from web_scraper_ray.crawl.model import sequential_crawl
from web_scraper_ray.crawl.robots import RobotsRules


@pytest.mark.parametrize("corpus_seed,max_depth", [(7, 2), (123, 3)])
def test_engine_matches_model_random_corpora(ray_session, tmp_path_factory,
                                             corpus_seed, max_depth):
    from web_scraper_ray.crawl.frontier import load_crawl_order, run_crawl

    corpus = str(tmp_path_factory.mktemp(f"fuzz{corpus_seed}"))
    build_corpus(corpus, n_pages=90, n_hosts=9, seed=corpus_seed, n_seeds=9,
                 links_per_page=6)
    cfg = CrawlConfig(max_depth=max_depth, seen_shards=3)
    robots = RobotsRules.from_parquet(f"{corpus}/robots.parquet",
                                      cfg.default_crawl_delay_ms)
    m_order, m_seen = sequential_crawl(
        f"{corpus}/pages", f"{corpus}/seeds.parquet", robots, cfg
    )
    ckpt = str(tmp_path_factory.mktemp(f"fuzz_ckpt{corpus_seed}"))
    res = run_crawl(f"{corpus}/pages", f"{corpus}/seeds.parquet", ckpt,
                    robots_path=f"{corpus}/robots.parquet", config=cfg)
    order = load_crawl_order(ckpt)
    assert list(zip(order["round"], order["url"], order["vt"])) == [
        (r["round"], r["url"], r["vt"]) for r in m_order
    ]
    assert res.seen.snapshot() == m_seen


def test_robots_cache_actor(ray_session):
    import ray

    from web_scraper_ray.crawl.robots import RobotsCacheActor, RobotsRules
    from web_scraper_ray.functions.urls import url_hash64

    rules = RobotsRules(
        {"a.example": ("/private/",), "b.example": ("/x/", "/y/")},
        {"a.example": 200},
        default_delay_ms=100,
    )
    n = 2
    actors = [
        ray.remote(RobotsCacheActor).options(num_cpus=0).remote(rules, i, n)
        for i in range(n)
    ]

    def ask(url):
        host = url.split("/")[2]
        sid = url_hash64(host) % n
        return ray.get(actors[sid].allowed_batch.remote([url]))[0]

    assert ask("https://a.example/public/page")
    assert not ask("https://a.example/private/page")
    assert not ask("https://b.example/y/z")
    assert ask("https://unknown.example/anything")

    host = "a.example"
    sid = url_hash64(host) % n
    assert ray.get(actors[sid].delays_batch.remote([host, "zz.example"])) == [200, 100]


def test_hot_host_skew(ray_session, tmp_path_factory):
    """Extreme skew: zipf_s high -> one host owns most of the corpus.
    The engine must stay correct (parity) — the hot host's ordering is
    one vectorized task, its fetches stay distributed (SURVEY.md §4.1
    skew row)."""
    import collections

    import pyarrow.parquet as pq

    from web_scraper_ray.crawl.frontier import load_crawl_order, run_crawl

    corpus = str(tmp_path_factory.mktemp("hot"))
    build_corpus(corpus, n_pages=300, n_hosts=30, seed=11, n_seeds=40,
                 links_per_page=7, zipf_s=8.0)  # extreme concentration
    urls = pq.read_table(f"{corpus}/pages", columns=["url"])["url"].to_pylist()
    host_counts = collections.Counter(u.split("/")[2] for u in urls)
    top_share = host_counts.most_common(1)[0][1] / len(urls)
    assert top_share > 0.5  # the skew is real

    cfg = CrawlConfig(max_depth=2, seen_shards=4)
    robots = RobotsRules.from_parquet(f"{corpus}/robots.parquet",
                                      cfg.default_crawl_delay_ms)
    m_order, m_seen = sequential_crawl(
        f"{corpus}/pages", f"{corpus}/seeds.parquet", robots, cfg
    )
    ckpt = str(tmp_path_factory.mktemp("hot_ckpt"))
    res = run_crawl(f"{corpus}/pages", f"{corpus}/seeds.parquet", ckpt,
                    robots_path=f"{corpus}/robots.parquet", config=cfg)
    order = load_crawl_order(ckpt)
    assert list(order["url"]) == [r["url"] for r in m_order]
    assert res.seen.snapshot() == m_seen
