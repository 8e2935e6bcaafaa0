"""WARC source round trip + robots.txt parsing."""

from datetime import datetime

import pytest

from web_scraper_ray.crawl.robots import RobotsRules, parse_robots_txt
from web_scraper_ray.sources.warc import parse_warc_bytes, write_warc

RECS = [
    {"url": "https://a.example/p1", "warc_ts": datetime(2025, 3, 28, 0, 0, 0),
     "html": b"<html><body><main><p>one caf\xc3\xa9</p></main></body></html>"},
    {"url": "https://b.example/p2", "warc_ts": datetime(2025, 3, 28, 1, 2, 3),
     "html": b"<p>two</p>"},
]


@pytest.mark.parametrize("compress", [False, True])
def test_warc_roundtrip(tmp_path, compress):
    path = str(tmp_path / ("a.warc.gz" if compress else "a.warc"))
    write_warc(path, RECS, compress=compress)
    with open(path, "rb") as f:
        got = list(parse_warc_bytes(f.read()))
    assert [r["url"] for r in got] == [r["url"] for r in RECS]
    assert got[0]["html"] == RECS[0]["html"]
    assert got[1]["warc_ts"] == RECS[1]["warc_ts"]


def test_warc_malformed_tolerated():
    assert list(parse_warc_bytes(b"not a warc at all")) == []
    assert list(parse_warc_bytes(b"WARC/1.0\r\nContent-Length: oops\r\n\r\nX")) == []
    # request records are skipped
    body = b"GET / HTTP/1.1\r\n\r\n"
    rec = (b"WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: https://x/\r\n"
           b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body)
    assert list(parse_warc_bytes(rec)) == []


def test_read_warc_to_pages_and_extract(ray_session, tmp_path):
    from web_scraper_ray.sources.warc import read_warc
    from web_scraper_ray.stages.extract_stage import extract_batch

    path = str(tmp_path / "c.warc")
    write_warc(path, RECS)
    pages = read_warc(path)
    df = pages.to_pandas()
    assert list(df.columns) == ["url", "warc_ts", "html", "text", "lang"]
    assert len(df) == 2
    # straight into the extraction kernel
    out = pages.map_batches(extract_batch, batch_format="pyarrow").to_pandas()
    assert "one café" in out.set_index("url").loc["https://a.example/p1", "text"]


def test_parse_robots_txt():
    txt = """
# comment
User-agent: *
Disallow: /private/
Disallow: /tmp/
Crawl-delay: 1.5

User-agent: specialbot
Disallow: /only-special/
"""
    prefixes, delay = parse_robots_txt(txt)
    assert prefixes == ("/private/", "/tmp/")
    assert delay == 1500
    p2, d2 = parse_robots_txt(txt, user_agent="SpecialBot")
    assert p2 == ("/only-special/",) and d2 is None
    assert parse_robots_txt("garbage ::: file") == ((), None)
    assert parse_robots_txt("User-agent: *\nDisallow:") == ((), None)


def test_rules_from_robots_txt():
    rules = RobotsRules.from_robots_txt(
        {"a.example": "User-agent: *\nDisallow: /x/\nCrawl-delay: 2",
         "b.example": "User-agent: *\nDisallow:"},
        default_delay_ms=100,
    )
    assert not rules.is_allowed("https://a.example/x/1")
    assert rules.is_allowed("https://a.example/y")
    assert rules.is_allowed("https://b.example/anything")
    assert rules.delay_ms("a.example") == 2000
    assert rules.delay_ms("b.example") == 100
