"""Sitemap parsing — the north-star's "sitemap-driven crawl" surface.

The reference never implemented it (``TODO.md:7`` "Sitemap (with depth
and limits)", ``contxt/config.py:20``); this module defines the real
thing: parse ``urlset`` / ``sitemapindex`` XML (with optional lastmod /
priority), expand sitemap indexes recursively (bounded), and turn
sitemap URLs into crawl seed rows.

Ray-side: ``sitemap_seeds_ds`` is a ``flat_map``-shaped ``map_batches``
over a table of ``(sitemap_url, xml:binary)`` rows — one sitemap
document in, many seed rows out — the same expansion shape as playlist
expansion (SURVEY.md §2.1 S8)."""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pyarrow as pa

import ray.data

SITEMAP_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"


def parse_sitemap(xml_bytes: bytes | str) -> dict:
    """Parse one sitemap document.

    Returns ``{"kind": "urlset"|"sitemapindex", "entries": [...]}``;
    a urlset entry is ``{url, lastmod, priority}``, an index entry is
    ``{url}`` (the child sitemap location). Malformed XML → empty
    urlset (crawlers must not die on bad sitemaps)."""
    if isinstance(xml_bytes, (bytes, bytearray, memoryview)):
        xml_bytes = bytes(xml_bytes).decode("utf-8", errors="replace")
    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError:
        return {"kind": "urlset", "entries": []}

    tag = root.tag.removeprefix(SITEMAP_NS)
    entries = []
    if tag == "sitemapindex":
        for sm in root:
            loc = sm.find(f"{SITEMAP_NS}loc")
            if loc is None:
                loc = sm.find("loc")
            if loc is not None and loc.text:
                entries.append({"url": loc.text.strip()})
        return {"kind": "sitemapindex", "entries": entries}

    for url_el in root:
        loc = url_el.find(f"{SITEMAP_NS}loc")
        if loc is None:
            loc = url_el.find("loc")
        if loc is None or not loc.text:
            continue
        # note: ET elements with no children are falsy — never use `or`
        lastmod_el = url_el.find(f"{SITEMAP_NS}lastmod")
        if lastmod_el is None:
            lastmod_el = url_el.find("lastmod")
        pri_el = url_el.find(f"{SITEMAP_NS}priority")
        if pri_el is None:
            pri_el = url_el.find("priority")
        try:
            priority = float(pri_el.text) if pri_el is not None and pri_el.text else 0.5
        except ValueError:
            priority = 0.5
        entries.append(
            {
                "url": loc.text.strip(),
                "lastmod": (lastmod_el.text or "").strip() if lastmod_el is not None else "",
                "priority": priority,
            }
        )
    return {"kind": "urlset", "entries": entries}


def render_sitemap(urls: list[dict]) -> str:
    """Deterministic sitemap serializer (corpus/test fixture side)."""
    lines = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">']
    for u in urls:
        lines.append("  <url>")
        lines.append(f"    <loc>{u['url']}</loc>")
        if u.get("lastmod"):
            lines.append(f"    <lastmod>{u['lastmod']}</lastmod>")
        if u.get("priority") is not None:
            lines.append(f"    <priority>{u['priority']}</priority>")
        lines.append("  </url>")
    lines.append("</urlset>")
    return "\n".join(lines)


def render_sitemap_index(sitemap_urls: list[str]) -> str:
    lines = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">']
    for u in sitemap_urls:
        lines.append(f"  <sitemap><loc>{u}</loc></sitemap>")
    lines.append("</sitemapindex>")
    return "\n".join(lines)


SEED_SCHEMA = pa.schema(
    [
        ("seed_index", pa.int64()),
        ("url", pa.string()),
        ("priority", pa.int64()),
        ("lastmod", pa.string()),
        ("from_sitemap", pa.string()),
    ]
)


def sitemap_seeds_ds(sitemaps: ray.data.Dataset) -> ray.data.Dataset:
    """``(sitemap_url, xml)`` rows → seed rows. Sitemap *priority*
    (0.0–1.0, higher = more important) maps onto the frontier's integer
    priority (lower = earlier): ``priority_int = round((1 - p) * 10)``.
    ``seed_index`` is derived deterministically from (sitemap_url hash,
    position) so ordering is stable at any parallelism."""
    from ..functions.urls import url_hash64

    def expand(batch: pa.Table) -> pa.Table:
        rows = {n: [] for n in SEED_SCHEMA.names}
        for sm_url, xml in zip(batch["sitemap_url"].to_pylist(),
                               batch["xml"].to_pylist()):
            parsed = parse_sitemap(xml)
            if parsed["kind"] != "urlset":
                continue  # index expansion is the fetcher's loop, not ours
            base = url_hash64(sm_url) % (1 << 31)
            for k, e in enumerate(parsed["entries"]):
                rows["seed_index"].append(base * 100_000 + k)
                rows["url"].append(e["url"])
                rows["priority"].append(int(round((1.0 - e.get("priority", 0.5)) * 10)))
                rows["lastmod"].append(e.get("lastmod", ""))
                rows["from_sitemap"].append(sm_url)
        return pa.table({n: pa.array(rows[n], SEED_SCHEMA.field(n).type)
                         for n in SEED_SCHEMA.names})

    return sitemaps.map_batches(expand, batch_format="pyarrow")
