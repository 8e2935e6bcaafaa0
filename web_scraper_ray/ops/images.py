"""Image pipeline — the distributed re-expression of the reference's
image handling (SURVEY.md §2.1 S4, §2.2 K4, §2.8 D2):

* ``images_flat`` — extraction output → one row per image reference
  (``contxt/scraper.py:237-261`` shape, flattened for dedup/joins per
  SURVEY.md §1.2).
* ``ImageDownloader`` — actor-pool fetch stage (S4: shared session per
  actor, streamed GET). No network here → the downloaded bytes are a
  clearly-marked deterministic STUB derived from the url; the dedup and
  sink semantics downstream are real and byte-exact.
* ``dedup_images`` — md5(content) first-wins dedup
  (``scraper.py:462-474``), hash-partitioned on the content hash. The
  reference's dedup scope is one page's download batch; the distributed
  version offers both scopes (global, or per ``page_url`` group).
* ``write_image_files`` — the ``{md5hash}{ext}`` hash-named sink with
  the extension whitelist + ``.jpg`` fallback (``scraper.py:476-495``)
  — hash-named files are natively idempotent and parallel-safe (K4).
"""

from __future__ import annotations

import hashlib
import os
from urllib.parse import urlparse

import pandas as pd
import pyarrow as pa

import ray.data

ALLOWED_EXTS = (".jpg", ".jpeg", ".png", ".gif", ".webp", ".svg", ".avif")  # scraper.py:481


def images_flat(extracted: ray.data.Dataset) -> ray.data.Dataset:
    """Extraction records → (page_url, image_url, alt, width, height)."""

    def flatten(batch: pa.Table) -> pa.Table:
        pages, urls, alts, ws, hs = [], [], [], [], []
        for page_url, images in zip(batch["url"].to_pylist(),
                                    batch["images"].to_pylist()):
            for img in images or ():
                pages.append(page_url)
                urls.append(img["url"])
                alts.append(img.get("alt", ""))
                ws.append(img.get("width", ""))
                hs.append(img.get("height", ""))
        return pa.table(
            {
                "page_url": pa.array(pages, pa.string()),
                "image_url": pa.array(urls, pa.string()),
                "alt": pa.array(alts, pa.string()),
                "width": pa.array(ws, pa.string()),
                "height": pa.array(hs, pa.string()),
            }
        )

    return extracted.map_batches(flatten, batch_format="pyarrow")


class ImageDownloader:
    """S4 actor stage. Real deploys hold one ``requests.Session`` per
    actor (``scraper.py:459``: streamed GET, 10s timeout); offline, the
    content is a deterministic stub (blake2b of the url) so md5-dedup
    and the hash-named sink run end to end. The stub makes identical
    urls yield identical bytes — the property content dedup needs."""

    def __init__(self, timeout_s: float = 10.0, use_network: bool = False):
        # network is opt-in: requests ships with ray, so its presence
        # does not imply a reachable network — default to the stub
        self.timeout_s = timeout_s
        self.session = None
        if use_network:  # pragma: no cover - needs network
            import requests  # type: ignore

            self.session = requests.Session()

    def _fetch(self, url: str) -> bytes:
        if self.session is not None:  # pragma: no cover - needs network
            try:
                resp = self.session.get(url, stream=True, timeout=self.timeout_s)
                resp.raise_for_status()
                return resp.content
            except Exception:
                return b""
        # STUB: deterministic fake bytes (no network in this environment)
        return hashlib.blake2b(url.encode(), digest_size=32).digest() * 4

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["image_url"].to_pylist()
        contents = [self._fetch(u) for u in urls]
        md5s = [hashlib.md5(c).hexdigest() if c else "" for c in contents]
        return batch.append_column(
            "content", pa.array(contents, pa.large_binary())
        ).append_column("content_md5", pa.array(md5s, pa.string()))


def image_ext(image_url: str) -> str:
    """scraper.py:476-482 — path extension, whitelisted, .jpg fallback."""
    ext = os.path.splitext(urlparse(image_url).path)[1]
    if not ext or ext not in ALLOWED_EXTS:
        return ".jpg"
    return ext


def dedup_images(downloaded: ray.data.Dataset, scope: str = "global",
                 n_buckets: int = 32) -> ray.data.Dataset:
    """md5-first-wins dedup (D2). ``scope='page'`` reproduces the
    reference's per-page-batch scope (``scraper.py:440``); ``'global'``
    is the corpus-wide variant. Winner = lexicographically smallest
    (page_url, image_url) — the deterministic stand-in for 'first seen'."""
    key_cols = ["content_md5"] if scope == "global" else ["page_url", "content_md5"]

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = df["content_md5"].map(lambda h: int(h[:8] or "0", 16) % n_buckets)
        return df

    def first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key_cols + ["page_url", "image_url"], kind="mergesort")
        return g.drop_duplicates(subset=key_cols, keep="first").drop(columns=["bucket"])

    return (
        downloaded.map_batches(bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(first, batch_format="pandas")
    )


def write_image_files(deduped: ray.data.Dataset, out_dir: str) -> ray.data.Dataset:
    """K4 — write each unique image as ``{md5}{ext}``; returns the
    url→path map rows (the reference's ``image_map``, joined back during
    formatting via broadcast, SURVEY.md §2.5 J1)."""
    os.makedirs(out_dir, exist_ok=True)

    def write(df: pd.DataFrame) -> pd.DataFrame:
        paths = []
        for row in df.to_dict(orient="records"):
            name = f"{row['content_md5']}{image_ext(row['image_url'])}"
            path = os.path.join(out_dir, name)
            with open(path, "wb") as f:
                f.write(row["content"])
            paths.append(path)
        out = df[["image_url", "content_md5"]].copy()
        out["path"] = paths
        return out

    return deduped.map_batches(write, batch_format="pandas")


def image_pipeline(extracted: ray.data.Dataset, out_dir: str,
                   concurrency: int = 2) -> ray.data.Dataset:
    """flat_map → actor-pool download → md5 dedup → hash-named sink."""
    flat = images_flat(extracted)
    downloaded = flat.map_batches(
        ImageDownloader, batch_format="pyarrow", batch_size=64,
        concurrency=concurrency,
    )
    return write_image_files(dedup_images(downloaded), out_dir)


def image_pipeline_with_map(extracted: ray.data.Dataset, out_dir: str,
                            concurrency: int = 2):
    """Like ``image_pipeline`` but also returns the COMPLETE
    url→local-path map: duplicate urls resolve to their content's
    winner file, matching the reference's dup remapping
    (``scraper.py:467-474``). Returns ``(written_df, url_map)``."""
    flat = images_flat(extracted)
    downloaded = flat.map_batches(
        ImageDownloader, batch_format="pyarrow", batch_size=64,
        concurrency=concurrency,
    ).materialize()  # two consumers below: download exactly once
    written = write_image_files(dedup_images(downloaded), out_dir).to_pandas()
    md5_to_path = dict(zip(written["content_md5"], written["path"]))
    url_md5 = downloaded.select_columns(["image_url", "content_md5"]).to_pandas()
    url_map = {
        u: md5_to_path[m]
        for u, m in zip(url_md5["image_url"], url_md5["content_md5"])
        if m in md5_to_path
    }
    return written, url_map
