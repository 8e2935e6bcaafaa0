"""CDX(J) index source: SURT canonicalization, deterministic sorted
writer, tolerant parser, Ray reader, and the synthesized-shard
fixture used by the cdx_index driver query."""

from datetime import datetime, timedelta

import pytest

from web_scraper_ray.sources.cdx import (
    format_ts14,
    parse_cdxj_bytes,
    parse_ts14,
    read_cdx,
    surt_key,
    synthesize_cdx_shards,
    write_cdxj,
)


def test_surt_key_canonicalization():
    # host reversed + lowercased, scheme dropped, query kept
    assert surt_key("https://WWW.Example.ORG/A/b?x=1") == \
        "org,example,www)/A/b?x=1"
    # default ports dropped per scheme; explicit non-default kept
    assert surt_key("http://example.com:80/p") == "com,example)/p"
    assert surt_key("https://example.com:443/p") == "com,example)/p"
    assert surt_key("https://example.com:8443/p") == "com,example:8443)/p"
    # fragment dropped; empty path becomes "/"
    assert surt_key("https://a.b.c/#frag") == "c,b,a)/"
    assert surt_key("https://a.b.c") == "c,b,a)/"


def _records(n=6):
    base = datetime(2025, 3, 28)
    return [
        {
            "url": f"https://h{i % 3}.example.com/p/{i}",
            "fetch_ts": base + timedelta(seconds=i),
            "status": 200,
            "digest": f"d{i:032d}"[:32],
            "length": 100 + i,
            "warc_path": "crawl-00.warc.gz",
            "offset": 512 * i,
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("compress", [False, True])
def test_cdxj_round_trip_and_determinism(tmp_path, compress):
    recs = _records()
    p1, p2 = tmp_path / "a.cdxj", tmp_path / "b.cdxj"
    write_cdxj(str(p1), recs, compress=compress)
    write_cdxj(str(p2), list(reversed(recs)), compress=compress)
    # deterministic bytes: input order cannot matter (lines are sorted
    # by SURT+ts, gzip mtime pinned)
    assert p1.read_bytes() == p2.read_bytes()

    parsed = sorted(parse_cdxj_bytes(p1.read_bytes()),
                    key=lambda r: r["url"])
    want = sorted(recs, key=lambda r: r["url"])
    assert len(parsed) == len(want)
    for got, exp in zip(parsed, want):
        assert got["url"] == exp["url"]
        assert got["fetch_ts"] == exp["fetch_ts"]
        assert got["status"] == exp["status"]
        assert got["digest"] == exp["digest"]
        assert got["length"] == exp["length"]
        assert got["warc_path"] == exp["warc_path"]
        assert got["warc_offset"] == exp["offset"]
        assert got["surt"] == surt_key(exp["url"])


def test_cdxj_lines_sorted(tmp_path):
    p = tmp_path / "s.cdxj"
    write_cdxj(str(p), _records(10))
    lines = p.read_bytes().decode().splitlines()
    assert lines == sorted(lines)


def test_parser_skips_malformed():
    good = b'com,x)/p 20250328000000 {"url": "https://x.com/p", ' \
           b'"status": "200", "digest": "d", "length": "1", ' \
           b'"filename": "w", "offset": "0"}'
    noise = b"\n".join([
        b"",  # blank
        b"not a cdx line",
        b'com,x)/q BADTSTAMP {"url": "u"}',
        b'com,x)/r 20250328000000 {broken json',
        b'com,x)/s 20250328000000 {"url": "u"}',  # missing fields
        good,
    ])
    rows = list(parse_cdxj_bytes(noise))
    assert len(rows) == 1 and rows[0]["url"] == "https://x.com/p"
    assert parse_ts14(format_ts14(datetime(2025, 3, 28, 1, 2, 3))) == \
        datetime(2025, 3, 28, 1, 2, 3)
    # truncated gzip payload: skipped, not raised
    assert list(parse_cdxj_bytes(b"\x1f\x8bgarbage")) == []


def test_read_cdx_and_synthesized_shards(ray_session, tmp_path, sf_dir):
    import pyarrow.parquet as pq

    doc = f"{sf_dir}/documents.parquet"
    paths = synthesize_cdx_shards(doc, str(tmp_path / "cdx"), n_shards=3)
    assert len(paths) == 3
    out = read_cdx(paths).to_pandas()
    n_docs = pq.read_metadata(doc).num_rows
    assert len(out) == n_docs
    assert set(out["status"]) == {200}
    assert (out["surt"].str.startswith("com,example,src")).all()
    # idempotent on rerun (the _DONE stamp): same paths, same rows
    again = synthesize_cdx_shards(doc, str(tmp_path / "cdx"), n_shards=3)
    assert again == paths


def test_parser_survives_corrupt_deflate_body():
    # valid gzip header, corrupt deflate body -> zlib.error path
    import gzip as _gzip

    good = _gzip.compress(b"x", mtime=0)
    corrupt = good[:10] + b"\xff\x00\xde\xad" + good[-4:]
    assert list(parse_cdxj_bytes(corrupt)) == []


def test_whitespace_urls_round_trip(tmp_path):
    """URLs with unencoded whitespace must not shift the space-
    delimited line format: the SURT key percent-encodes them and
    every record survives the round trip."""
    base = datetime(2025, 3, 28)
    recs = [
        {"url": "https://x.com/a b/c?q=1 2", "fetch_ts": base,
         "status": 200, "digest": "d1", "length": 1,
         "warc_path": "w", "offset": 0},
        {"url": "https://x.com/tab\there", "fetch_ts": base,
         "status": 200, "digest": "d2", "length": 2,
         "warc_path": "w", "offset": 512},
    ]
    assert surt_key(recs[0]["url"]) == "com,x)/a%20b/c?q=1%202"
    p = tmp_path / "ws.cdxj"
    write_cdxj(str(p), recs)
    got = sorted(parse_cdxj_bytes(p.read_bytes()),
                 key=lambda r: r["url"])
    assert [r["url"] for r in got] == sorted(r["url"] for r in recs)
    assert all(" " not in r["surt"] and "\t" not in r["surt"]
               for r in got)
