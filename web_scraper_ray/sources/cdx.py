"""CDX(J) source — Common Crawl's index format as a lookup table.

Alongside WARC archives (sources/warc.py), Common Crawl publishes its
index as CDXJ shards: one line per capture,

    <SURT key> <timestamp14> <JSON fields>

sorted by (SURT, timestamp), which is what makes host/prefix range
scans over a petabyte index possible without touching the archives.
This module is a pure-stdlib writer/parser for that shape plus a Ray
reader: ``read_cdx`` is ``read_binary_files`` (one shard per row) →
an exploding ``map_batches``, the same per-file task model as the
WARC reader — real CC index shards are ~1 GB gzip members and shard
exactly this way.

SURT here is the deterministic subset this engine needs (documented,
not claimed byte-equal to every canonicalizer in the wild): lowercase
host with components reversed and comma-joined, scheme dropped,
default ports dropped, fragment dropped, query kept.
"""

from __future__ import annotations

import gzip
import json
import zlib
from datetime import datetime, timedelta
from typing import Iterator, Optional
from urllib.parse import urlsplit

import pyarrow as pa

import ray.data

_DEFAULT_PORTS = {"http": "80", "https": "443"}

#: whitespace → percent-encoding inside SURT keys: the CDXJ line
#: format is space-delimited, so an unencoded space/tab in a URL path
#: would shift the field split and silently drop the record on read.
_WS_ENC = {" ": "%20", "\t": "%09", "\n": "%0A",
           "\r": "%0D", "\f": "%0C", "\v": "%0B"}


def surt_key(url: str) -> str:
    """Sort-friendly URL key: ``com,example,www)/path?q`` — host
    components reversed so every page of a host (and every host of a
    domain) is one contiguous key range in a sorted index. Whitespace
    in path/query is percent-encoded (the key must survive the
    space-delimited CDXJ line format)."""
    parts = urlsplit(url.strip())
    host = (parts.hostname or "").lower()
    key = ",".join(reversed(host.split("."))) if host else ""
    port = parts.port
    scheme = (parts.scheme or "").lower()
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        key += f":{port}"
    path = parts.path or "/"
    query = f"?{parts.query}" if parts.query else ""
    tail = path + query
    for ws, enc in _WS_ENC.items():
        if ws in tail:
            tail = tail.replace(ws, enc)
    return f"{key}){tail}"


def format_ts14(dt: datetime) -> str:
    return dt.strftime("%Y%m%d%H%M%S")


def parse_ts14(s: str) -> Optional[datetime]:
    try:
        return datetime.strptime(s, "%Y%m%d%H%M%S")
    except ValueError:
        return None


def write_cdxj(path: str, records: list[dict], compress: bool = False) -> None:
    """Deterministic CDXJ writer. ``records``: [{url, fetch_ts:
    datetime, status: int, digest: str, length: int, warc_path: str,
    offset: int}]. Lines are sorted by (SURT, timestamp) — the format's
    contract — and JSON keys are emitted in a fixed order, so equal
    inputs give equal bytes (gzip with mtime=0)."""
    lines = []
    for rec in records:
        key = surt_key(rec["url"])
        ts = format_ts14(rec["fetch_ts"])
        fields = {
            "url": rec["url"],
            "status": str(int(rec["status"])),
            "digest": rec["digest"],
            "length": str(int(rec["length"])),
            "filename": rec["warc_path"],
            "offset": str(int(rec["offset"])),
        }
        lines.append(f"{key} {ts} {json.dumps(fields, sort_keys=True)}")
    lines.sort()  # (SURT, ts14) — both lexicographic within the line
    data = ("\n".join(lines) + "\n" if lines else "").encode()
    if compress:
        data = gzip.compress(data, mtime=0)
    with open(path, "wb") as f:
        f.write(data)


def parse_cdxj_bytes(payload: bytes) -> Iterator[dict]:
    """Yield one dict per well-formed CDXJ line. Tolerant: malformed
    lines (bad JSON, missing fields, bad timestamp) are skipped, never
    raised — index corruption must not kill an ingest task."""
    if payload[:2] == b"\x1f\x8b":
        try:
            payload = gzip.decompress(payload)
        except (OSError, EOFError, zlib.error):
            # OSError: bad gzip header; EOFError: truncated stream;
            # zlib.error: valid header, corrupt deflate body
            return
    for line in payload.split(b"\n"):
        line = line.strip()
        if not line:
            continue
        head, _, blob = line.partition(b" {")
        key_ts = head.split()
        if len(key_ts) != 2 or not blob:
            continue
        ts = parse_ts14(key_ts[1].decode("latin-1"))
        if ts is None:
            continue
        try:
            fields = json.loads(b"{" + blob)
            yield {
                "surt": key_ts[0].decode("utf-8"),
                "fetch_ts": ts,
                "url": fields["url"],
                "status": int(fields["status"]),
                "digest": fields["digest"],
                "length": int(fields["length"]),
                "warc_path": fields["filename"],
                # table column is warc_offset: OFFSET is an SQL keyword
                # and the oracle twins project these columns directly
                "warc_offset": int(fields["offset"]),
            }
        except (ValueError, KeyError, UnicodeDecodeError):
            continue


def read_cdx(paths) -> ray.data.Dataset:
    """CDXJ shard file(s) → index-table Dataset (one row per capture)."""
    raw = ray.data.read_binary_files(paths, include_paths=True)

    def explode(batch: pa.Table) -> pa.Table:
        rows: dict[str, list] = {
            "surt": [], "fetch_ts": [], "url": [], "status": [],
            "digest": [], "length": [], "warc_path": [], "warc_offset": [],
        }
        for data in batch["bytes"].to_pylist():
            for rec in parse_cdxj_bytes(bytes(data)):
                for k in rows:
                    rows[k].append(rec[k])
        return pa.table({
            "surt": pa.array(rows["surt"], pa.string()),
            "fetch_ts": pa.array(rows["fetch_ts"], pa.timestamp("us")),
            "url": pa.array(rows["url"], pa.string()),
            "status": pa.array(rows["status"], pa.int64()),
            "digest": pa.array(rows["digest"], pa.string()),
            "length": pa.array(rows["length"], pa.int64()),
            "warc_path": pa.array(rows["warc_path"], pa.string()),
            "warc_offset": pa.array(rows["warc_offset"], pa.int64()),
        })

    return raw.map_batches(explode, batch_format="pyarrow")


def synthesize_cdx_shards(
    documents_parquet: str, out_dir: str, n_shards: int = 4,
    compress: bool = True,
) -> list[str]:
    """Deterministic CDXJ index shards derived from a ``documents``
    table (synthetic fixture for tests/queries — no external data):
    doc row → capture of ``https://{source}.example.com/doc/{doc_id}``
    at ``2025-03-28 00:00:00 + doc_id seconds`` with ``digest =
    md5(text)`` and ``length = n_chars``, sharded by ``doc_id %
    n_shards``. One Ray task per shard writes its file (column-pruned
    parquet scan, shard filter pushed into the read); a ``_DONE``
    stamp makes re-runs idempotent. Returns the shard paths."""
    import hashlib
    import os

    import ray

    paths = [os.path.join(out_dir, f"index-{k:05d}.cdxj.gz" if compress
                          else f"index-{k:05d}.cdxj")
             for k in range(n_shards)]
    stamp = os.path.join(out_dir, "_DONE")
    # the tag fingerprints the source CONTENT (size + mtime), not just
    # its path — regenerating the fixture in place invalidates the
    # cached shards instead of silently serving stale ones
    st = os.stat(documents_parquet)
    tag = (f"{documents_parquet}:{st.st_size}:{st.st_mtime_ns}:"
           f"{n_shards}:{compress}")
    if os.path.exists(stamp) and open(stamp).read() == tag:
        return paths
    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def write_shard(k: int, path: str) -> int:
        import numpy as np
        import pyarrow.parquet as pq

        # column-pruned read, shard mask applied in-memory (a fixture
        # synthesizer over small tables; pyarrow expressions have no
        # modulo operator to push down)
        full = pq.read_table(documents_parquet,
                             columns=["doc_id", "text", "source", "n_chars"])
        mask = (np.asarray(full.column("doc_id")) % n_shards) == k
        tbl = full.filter(mask)
        base = datetime(2025, 3, 28)
        records = []
        for doc_id, text, source, n_chars in zip(
            tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist(),
            tbl.column("source").to_pylist(), tbl.column("n_chars").to_pylist(),
        ):
            records.append({
                "url": f"https://{source}.example.com/doc/{doc_id}",
                "fetch_ts": base + timedelta(seconds=doc_id),
                "status": 200,
                "digest": hashlib.md5((text or "").encode()).hexdigest(),
                "length": n_chars,
                "warc_path": f"crawl-{doc_id % n_shards:02d}.warc.gz",
                "offset": 512 * doc_id,
            })
        # write-then-rename: a concurrent reader (second bench/pytest
        # run on the same sf dir racing a re-synthesis) must never see
        # a torn shard — the tolerant CDXJ parser would silently skip
        # truncated lines instead of erroring
        tmp = f"{path}.tmp.{os.getpid()}"
        write_cdxj(tmp, records, compress=compress)
        os.replace(tmp, path)
        return len(records)

    ray.get([write_shard.remote(k, p) for k, p in enumerate(paths)])
    with open(stamp, "w") as f:
        f.write(tag)
    return paths
