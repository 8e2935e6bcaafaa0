"""Per-page extraction kernel — the single pure function applied to every
page. Reconstructs the record contract of the reference's (missing)
``Scraper._scrape`` core from its consumers (SURVEY.md §0 fact 1, §1.1):

    html bytes → {title, content_html, text, og_metadata, images, links,
                  token_count}

Pipeline per page:
1. parse HTML (stdlib DOM, ``dom.py``)
2. title  = first ``<title>`` text (consumed by ``base_formatter.py:54``)
3. images = every ``<img[src]>`` with urljoin + alt + width/height,
   extracted **pre-cleaning** so the dimension attributes survive
   (``scraper.py:237-261``; cleaning would prune width/height,
   ``scraper.py:291-297``)
4. links  = every ``<a[href]>`` urljoin'd, document order — the frontier
   expansion edge set (same extraction shape as images, SURVEY.md M13)
5. clean  = ``clean_document`` (``scraper.py:263-405``) → content_html
   (serialized cleaned doc) + og struct
6. text   = ``html_to_markdown(content_html)``
   (``markdown_formatter.py:85-129``) — the byte-identical parity column
7. token_count = ``count_tokens(content_html)`` (``scraper.py:407-426``)
"""

from __future__ import annotations

from ..dom import Node, merge_adjacent_text, parse
from ..functions.urls import resolve_link
from .clean import clean_document
from .markdown import markdown_from_doc
from .tokens import count_tokens


def extract_images(doc: Node, base_url: str) -> list[dict]:
    """scraper.py:237-261 — flat dicts (width/height as strings, only
    present keys emitted there; here always-present empty-string columns
    so the Arrow schema is fixed)."""
    images = []
    for img in doc.find_all("img"):
        src = img.get("src")
        if src:
            images.append(
                {
                    "url": resolve_link(base_url, src),
                    "alt": img.get("alt", "") or "",
                    "width": img.get("width", "") or "",
                    "height": img.get("height", "") or "",
                }
            )
    return images


def extract_links(doc: Node, base_url: str) -> list[str]:
    """Document-order absolute URLs of all ``<a href>`` (the link-
    extraction twin of ``_extract_images``, SURVEY.md M13)."""
    links = []
    for a in doc.find_all("a"):
        href = a.get("href")
        if href:
            links.append(resolve_link(base_url, href))
    return links


def extract_anchors(doc: Node, base_url: str) -> list[dict]:
    """Document-order (url, text) pairs of all ``<a href>`` — the link
    targets WITH their anchor text, emitted in the SAME kernel walk so
    the link graph and the anchor-text corpus derive from the crawl's
    one extraction pass instead of a second full-corpus DOM parse
    (ops/graph.py:edges_from_output / anchors_from_output)."""
    anchors = []
    for a in doc.find_all("a"):
        href = a.get("href")
        if href:
            anchors.append({"url": resolve_link(base_url, href),
                            "text": a.get_text()})
    return anchors


def extract_title(doc: Node) -> str:
    t = doc.find("title")
    return t.get_text(strip=True) if t is not None else ""


def extract_page(html: bytes | str, url: str) -> dict:
    """The full kernel (see module docstring). Pure and deterministic."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    doc = parse(html)
    title = extract_title(doc)
    images = extract_images(doc, url)
    anchors = extract_anchors(doc, url)
    # same traversal, same filter: links IS anchors' url column (one
    # DOM walk feeds both the frontier edge set and the anchor corpus)
    links = [a["url"] for a in anchors]
    cleaned, og = clean_document(doc)  # mutates doc in place
    content_html = cleaned.serialize()
    # Equivalent to html_to_markdown(content_html) — the reference
    # reparses the serialized soup (markdown_formatter.py:95); the only
    # tree-level effect of that round trip is adjacent-text merging +
    # empty-text dropping, applied directly here (dom.merge_adjacent_text,
    # equivalence locked by test_markdown_roundtrip_equivalence).
    merge_adjacent_text(cleaned)
    text = markdown_from_doc(cleaned)
    return {
        "url": url,
        "title": title,
        "content_html": content_html,
        "text": text,
        "og_title": og.get("og_title", ""),
        "og_description": og.get("og_description", ""),
        "og_image": og.get("og_image", ""),
        "images": images,
        "links": links,
        "anchors": anchors,
        "token_count": count_tokens(content_html),
    }
