"""WARC source — Common Crawl's native archive format as a pages table.

A crawl-tier engine should ingest the corpus format the real data ships
in: WARC/1.0 ``response`` records (warc spec ISO 28500). This is a
pure-stdlib parser for the subset Common-Crawl WARCs use —
``WARC/1.0`` header block, CRLF-separated named headers
(``WARC-Type``, ``WARC-Target-URI``, ``WARC-Date``,
``Content-Length``), an HTTP response block, then the payload —
plus a writer for deterministic test fixtures.

Ray-side: ``read_warc`` is ``read_binary_files`` (one WARC file per
row, path included) → ``flat_map``-shaped ``map_batches`` exploding
each archive into page rows matching the ``pages`` schema
(BASELINE.json input_hint: url, warc_ts, html, text='', lang='').
Real CC archives are ~1 GB gzip members; the per-file task model is
exactly how they are meant to be sharded.
"""

from __future__ import annotations

import gzip
from datetime import datetime
from typing import Iterator, Optional

import pyarrow as pa

import ray.data

CRLF = b"\r\n"


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(CRLF):
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode("latin-1")
    return headers


def parse_warc_bytes(payload: bytes) -> Iterator[dict]:
    """Yield ``{url, warc_ts, html}`` for each ``response`` record.

    Tolerant: malformed records are skipped, never raised — archive
    corruption must not kill an ingest task."""
    if payload[:2] == b"\x1f\x8b":  # gzipped archive (CC ships .warc.gz)
        try:
            payload = gzip.decompress(payload)
        except OSError:
            return
    pos = 0
    n = len(payload)
    while pos < n:
        head = payload.find(b"WARC/1.", pos)
        if head < 0:
            return
        hdr_end = payload.find(CRLF + CRLF, head)
        if hdr_end < 0:
            return
        headers = _parse_headers(payload[head:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = hdr_end + 4
            continue
        body = payload[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length

        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        if not url:
            continue
        ts = _parse_warc_date(headers.get("warc-date", ""))
        # body = HTTP response (status line + headers + CRLFCRLF + html)
        http_split = body.find(CRLF + CRLF)
        html = body[http_split + 4 :] if http_split >= 0 else body
        yield {"url": url, "warc_ts": ts, "html": html}


def _parse_warc_date(s: str) -> Optional[datetime]:
    try:
        # 2025-03-28T00:00:00Z (tz-naive like the corpus tables)
        return datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ")
    except ValueError:
        return None


def read_warc(paths) -> ray.data.Dataset:
    """WARC file(s) → pages-schema Dataset (text/lang empty — they are
    downstream products of the extraction kernel)."""
    raw = ray.data.read_binary_files(paths, include_paths=True)

    def explode(batch: pa.Table) -> pa.Table:
        urls, tss, htmls = [], [], []
        for data in batch["bytes"].to_pylist():
            for rec in parse_warc_bytes(bytes(data)):
                urls.append(rec["url"])
                tss.append(rec["warc_ts"])
                htmls.append(rec["html"])
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array([""] * len(urls), pa.string()),
                "lang": pa.array([""] * len(urls), pa.string()),
            }
        )

    return raw.map_batches(explode, batch_format="pyarrow")


def write_warc(path: str, records: list[dict], compress: bool = False) -> None:
    """Deterministic WARC writer (test fixtures; mirrors the subset the
    parser reads). ``records``: [{url, warc_ts: datetime, html: bytes}]."""
    out = bytearray()
    for rec in records:
        http = (
            b"HTTP/1.1 200 OK" + CRLF
            + b"Content-Type: text/html" + CRLF + CRLF
            + rec["html"]
        )
        ts = rec["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
        header = (
            b"WARC/1.0" + CRLF
            + b"WARC-Type: response" + CRLF
            + f"WARC-Target-URI: {rec['url']}".encode() + CRLF
            + f"WARC-Date: {ts}".encode() + CRLF
            + f"Content-Length: {len(http)}".encode() + CRLF + CRLF
        )
        out += header + http + CRLF + CRLF
    data = bytes(out)
    if compress:
        data = gzip.compress(data, mtime=0)  # deterministic bytes
    with open(path, "wb") as f:
        f.write(data)
