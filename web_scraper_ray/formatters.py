"""Formatter registry — the user-extension surface of the reference
(``contxt/formatters/__init__.py:6-29``; SURVEY.md §2.10) re-expressed
as pure functions ``record → str`` suitable for ``map_batches``.

A formatter here is a closure over options; the per-URL record dict is
the §1.1 contract (content/content_html/title/url/og_metadata/images/
youtube_data)."""

from __future__ import annotations

from typing import Callable, Optional

import pandas as pd

from .kernel.htmlfmt import format_html
from .kernel.markdown import format_markdown
from .kernel.xmlfmt import format_xml
from .kernel.youtubefmt import format_youtube

EXTENSIONS = {"markdown": "md", "xml": "xml", "raw": "html", "youtube": "md",
              "youtube_raw": "txt"}


def get_formatter(
    format_type: str = "markdown",
    include_images: bool = False,
    image_map: Optional[dict] = None,
    youtube_format_style: str = "complete",
) -> Callable[[dict], str]:
    """formatters/__init__.py:6-29 — unknown types default to markdown."""
    if format_type == "xml":
        return lambda rec: format_xml(rec, include_images, image_map)
    if format_type == "raw":
        return lambda rec: format_html(rec, include_images, image_map)
    if format_type == "youtube":
        return lambda rec: format_youtube(rec, youtube_format_style)
    return lambda rec: format_markdown(rec, include_images, image_map)


def get_extension(format_type: str, youtube_format_style: str = "complete") -> str:
    """base/markdown/xml/html get_extension + youtube's style-dependent
    extension (youtube_formatter.py:375-380)."""
    if format_type == "youtube" and youtube_format_style == "raw":
        return "txt"
    return EXTENSIONS.get(format_type, "md")


def record_from_row(row: dict) -> dict:
    """Extraction-output row → formatter record (§1.1 contract).
    ``content`` is the legacy alias of ``content_html``
    (``contxt/scraper.py:541``)."""
    og = {}
    for k in ("og_title", "og_description", "og_image"):
        if row.get(k):
            og[k] = row[k]
    return {
        "url": row.get("url", ""),
        "title": row.get("title", ""),
        "content": row.get("content_html", ""),
        "content_html": row.get("content_html", ""),
        "og_metadata": og,
        "images": [
            dict(img) for img in (row.get("images") or [])
        ],
        "date": row.get("date", ""),
    }


class FormatStage:
    """Actor-pool ``map_batches`` stage rendering extraction records into
    a chosen output format (markdown/xml/raw-html); the distributed form
    of the reference's per-URL ``formatter.format(scraped_data)`` call
    (``contxt/cli.py:85-99``)."""

    def __init__(self, format_type: str = "markdown", include_images: bool = False,
                 image_map: Optional[dict] = None):
        self.fmt = get_formatter(format_type, include_images, image_map)
        self.format_type = format_type

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rendered = []
        for row in df.to_dict(orient="records"):
            try:
                rendered.append(self.fmt(record_from_row(row)))
            except Exception:  # adversarial page: an error document in
                # the SELECTED format, not a poisoned batch (the
                # XML/HTML renderers recurse like the reference's and
                # can hit depth limits). Rendering the formatter's own
                # empty-content error form keeps .xml/.html outputs
                # structurally valid (markdown_formatter.py:29-30,
                # xml_formatter.py:114-115, html_formatter.py:58-59).
                rendered.append(
                    self.fmt({"url": row.get("url", ""),
                              "title": row.get("title", ""),
                              "content": ""})
                )
        out = df[[c for c in ("url", "host", "group_key", "title") if c in df.columns]].copy()
        out["formatted"] = rendered
        out["format"] = self.format_type
        return out
