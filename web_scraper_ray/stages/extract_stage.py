"""Ray Data stages for page extraction.

``extract_batch`` is the hot stage of the flagship pipeline: Arrow in /
Arrow out (``batch_format="pyarrow"``, zero-copy from the object store).
HTML parsing is inherently per-document, so the inner loop is per-row by
nature; everything around it (column assembly, schema) is Arrow-native
with a fixed output schema so blocks never re-infer types.

Scale notes (SURVEY.md §4):
* stateless pure function → Ray schedules it as elastic tasks; no actor
  pool needed because the kernel holds no state (regexes are compiled at
  module import, once per worker process).
* ``html`` rows are wide (KBs–MBs) → callers should pass a modest
  ``batch_size`` (default 256 here) so batch × concurrency stays well
  inside worker heap; blocks of the binary column spill naturally.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.urls import extract_host, path_prefix
from ..kernel.extract import extract_page

IMAGE_STRUCT = pa.struct(
    [("url", pa.string()), ("alt", pa.string()), ("width", pa.string()), ("height", pa.string())]
)

ANCHOR_STRUCT = pa.struct([("url", pa.string()), ("text", pa.string())])

EXTRACT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("group_key", pa.string()),  # URL path-prefix content grouping (outputs.py:102-113 analog)
        ("title", pa.string()),
        ("text", pa.large_string()),
        ("content_html", pa.large_string()),
        ("og_title", pa.string()),
        ("og_description", pa.string()),
        ("og_image", pa.string()),
        ("images", pa.list_(IMAGE_STRUCT)),
        ("links", pa.list_(pa.string())),
        # (url, text) per <a href> in document order — emitted by the
        # SAME kernel walk as links, so the link graph / anchor-text
        # corpus derive from crawl output without a second DOM parse
        ("anchors", pa.list_(ANCHOR_STRUCT)),
        ("token_count", pa.int64()),
        ("extract_ok", pa.bool_()),
        ("extract_error", pa.string()),
    ]
)


def extract_batch(batch: pa.Table) -> pa.Table:
    """pages(url, html, …) → extracted records (EXTRACT_SCHEMA).

    Per-row error containment: a kernel failure on one malformed page
    becomes an ``extract_ok=False`` row (empty content, error message),
    never an exception — a thrown exception would poison the whole
    batch and, with retries, the whole pipeline (SURVEY.md §4.1: app
    errors are a status column, not control flow)."""
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    cols: dict[str, list] = {name: [] for name in EXTRACT_SCHEMA.names}
    for url, html in zip(urls, htmls):
        try:
            rec = extract_page(html, url)
            ok, err = True, ""
        except Exception as e:  # malformed page: keep crawling
            rec = {"title": "", "text": "", "content_html": "", "og_title": "",
                   "og_description": "", "og_image": "", "images": [],
                   "links": [], "anchors": [], "token_count": 0}
            ok, err = False, f"{type(e).__name__}: {e}"[:200]
        cols["url"].append(url)
        cols["host"].append(extract_host(url))
        cols["group_key"].append(path_prefix(url))
        cols["title"].append(rec["title"])
        cols["text"].append(rec["text"])
        cols["content_html"].append(rec["content_html"])
        cols["og_title"].append(rec["og_title"])
        cols["og_description"].append(rec["og_description"])
        cols["og_image"].append(rec["og_image"])
        cols["images"].append(rec["images"])
        cols["links"].append(rec["links"])
        cols["anchors"].append(rec["anchors"])
        cols["token_count"].append(rec["token_count"])
        cols["extract_ok"].append(ok)
        cols["extract_error"].append(err)
    return pa.table(
        {name: pa.array(cols[name], EXTRACT_SCHEMA.field(name).type) for name in EXTRACT_SCHEMA.names},
        schema=EXTRACT_SCHEMA,
    )


def verify_batch(batch: pa.Table) -> pa.Table:
    """Parity stage: re-extract and compare byte-identical against the
    corpus ``text`` oracle column (BASELINE.json per-row invariant)."""
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    oracle = batch.column("text").to_pylist()
    ok = [extract_page(h, u)["text"] == t for u, h, t in zip(urls, htmls, oracle)]
    return pa.table({"url": pa.array(urls, pa.string()), "text_match": pa.array(ok, pa.bool_())})


def links_flat_batch(batch: pa.Table) -> pa.Table:
    """Extracted records → one row per out-link (the frontier expansion
    edge list; same flat_map shape as image extraction, SURVEY.md M13)."""
    urls = batch.column("url").to_pylist()
    links = batch.column("links").to_pylist()
    src, dst, pos = [], [], []
    for u, ls in zip(urls, links):
        for k, l in enumerate(ls or ()):
            src.append(u)
            dst.append(l)
            pos.append(k)
    return pa.table(
        {
            "src_url": pa.array(src, pa.string()),
            "url": pa.array(dst, pa.string()),
            "link_index": pa.array(pos, pa.int64()),
        }
    )
