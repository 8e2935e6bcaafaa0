"""Capstone integration: every subsystem composed in one flow —
WARC archive → pages parquet → robots.txt-parsed rules → frontier crawl
→ extraction → markdown rendering → file sink + combined doc + stats."""

from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq


def test_warc_to_crawl_to_files(ray_session, tmp_path):
    from web_scraper_ray.crawl import CrawlConfig, run_crawl, sequential_crawl
    from web_scraper_ray.crawl.frontier import load_crawl_order
    from web_scraper_ray.crawl.robots import RobotsRules, parse_robots_txt
    from web_scraper_ray.formatters import FormatStage
    from web_scraper_ray.sinks import combined_single_file, run_stats, write_formatted_files
    from web_scraper_ray.sources.warc import read_warc, write_warc
    import ray.data

    # 1. a tiny web inside one WARC archive, with links between pages
    def page(body):
        return f"<html><body><main>{body}</main></body></html>".encode()

    site = [
        {"url": "https://site.example/", "warc_ts": datetime(2025, 3, 28),
         "html": page('<h1>Home</h1><a href="/a">a</a><a href="/blocked/x">b</a>'
                      '<a href="/b">c</a>')},
        {"url": "https://site.example/a", "warc_ts": datetime(2025, 3, 28),
         "html": page('<h1>A</h1><p>alpha page</p><a href="/b">b</a>')},
        {"url": "https://site.example/b", "warc_ts": datetime(2025, 3, 28),
         "html": page("<h1>B</h1><p>beta page</p>")},
        {"url": "https://site.example/blocked/x", "warc_ts": datetime(2025, 3, 28),
         "html": page("<h1>Secret</h1>")},
    ]
    warc_path = str(tmp_path / "site.warc.gz")
    write_warc(warc_path, site, compress=True)

    # 2. WARC → pages parquet (the corpus the engine fetch-joins against)
    pages_dir = str(tmp_path / "pages")
    read_warc(warc_path).write_parquet(pages_dir)

    # 3. robots.txt text → rules table semantics
    prefixes, delay = parse_robots_txt(
        "User-agent: *\nDisallow: /blocked/\nCrawl-delay: 0.1"
    )
    robots_tbl = pa.table({
        "host": pa.array(["site.example"], pa.string()),
        "disallow_prefixes": pa.array([list(prefixes)], pa.list_(pa.string())),
        "crawl_delay_ms": pa.array([delay], pa.int64()),
    })
    robots_path = str(tmp_path / "robots.parquet")
    pq.write_table(robots_tbl, robots_path)

    seeds = pa.table({
        "seed_index": pa.array([0], pa.int64()),
        "url": pa.array(["https://site.example/"], pa.string()),
    })
    seeds_path = str(tmp_path / "seeds.parquet")
    pq.write_table(seeds, seeds_path)

    # 4. crawl (engine) + the sequential spec agree
    cfg = CrawlConfig(max_depth=2, seen_shards=2)
    ckpt = str(tmp_path / "ckpt")
    res = run_crawl(pages_dir, seeds_path, ckpt, robots_path=robots_path, config=cfg)
    rules = RobotsRules.from_parquet(robots_path, cfg.default_crawl_delay_ms)
    m_order, m_seen = sequential_crawl(pages_dir, seeds_path, rules, cfg)
    order = load_crawl_order(ckpt)
    assert list(order["url"]) == [r["url"] for r in m_order]
    assert res.seen.snapshot() == m_seen
    crawled = set(order["url"])
    assert crawled == {"https://site.example/", "https://site.example/a",
                       "https://site.example/b"}  # /blocked/ excluded by robots

    # 5. crawl output → markdown files + combined + stats
    import glob

    out_files = sorted(glob.glob(f"{ckpt}/output_*/*.parquet"))
    extracted = ray.data.read_parquet(out_files)
    stats = run_stats(extracted)
    assert stats["successful_urls"] == 3
    formatted = extracted.map_batches(FormatStage("markdown"), batch_format="pandas")
    paths = write_formatted_files(formatted, str(tmp_path / "md"), "md")
    assert len(paths) == 3
    combined = combined_single_file(formatted, ["url"])
    assert "alpha page" in combined and "beta page" in combined
    assert combined.count("=" * 50) == 2
