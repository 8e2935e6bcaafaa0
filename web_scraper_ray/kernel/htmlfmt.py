"""HTML → clean-HTML formatter — reproduces
``contxt.formatters.html_formatter.HTMLFormatter``
(`/root/reference/contxt/formatters/html_formatter.py:48-338`) on the
stdlib DOM: removal of script/style/iframe/noscript/object/embed, a
6-attribute allowlist, re-indentation with block/inline/self-closing/pre
rules, and the optional full boilerplate document (CSS + og meta +
title + source link + images section).
"""

from __future__ import annotations

import html as html_mod
import re
from typing import Optional

from ..dom import CommentNode, TextNode, parse
from .markdown import find_main_content

BLOCK_ELEMENTS = frozenset(
    # html_formatter.py:33-39
    "div p h1 h2 h3 h4 h5 h6 ul ol li table tr td th article section header "
    "footer nav aside main figure figcaption form pre blockquote hr".split()
)

SELF_CLOSING = frozenset(
    # html_formatter.py:42-46
    "img br hr meta input link area base col embed param source track wbr".split()
)

REMOVE_TAGS = ["script", "style", "iframe", "noscript", "object", "embed"]  # html_formatter.py:77
ALLOWED_ATTRS = ("href", "src", "alt", "title", "id", "class")  # html_formatter.py:82

_WS_RE = re.compile(r"\s+")


def _node_str(node) -> str:
    if isinstance(node, CommentNode):
        return f"<!--{node.text}-->"
    if isinstance(node, TextNode):
        return node.text
    return node.serialize()


def _format_node(node, output: list[str], self_closing=SELF_CLOSING,
                 block_elements=BLOCK_ELEMENTS, indent_level: int = 0,
                 in_pre: bool = False) -> None:
    """html_formatter.py:240-329 — indentation renderer."""
    if node is None or not _node_str(node).strip():
        return

    if node.name is None:  # text node (incl. comments, as in bs4)
        text = node.string
        if text and text.strip():
            if in_pre:
                output.append(text)
            else:
                text = _WS_RE.sub(" ", text).strip()
                if text:
                    output.append(" " * (indent_level * 2) + text)
        return

    is_pre = node.name == "pre"
    current_in_pre = in_pre or is_pre

    if node.name in ("script", "style", "noscript", "iframe"):
        return

    indent = " " * (indent_level * 2)
    attrs = " ".join(f'{k}="{v}"' for k, v in node.attrs.items())
    start_tag = f"{indent}<{node.name} {attrs}>" if attrs else f"{indent}<{node.name}>"

    if node.name in self_closing:
        output.append(start_tag)
        return

    if node.name in block_elements and not current_in_pre:
        output.append(start_tag)
        for child in node.children:
            _format_node(child, output, self_closing, block_elements,
                         indent_level + 1, current_in_pre)
        output.append(f"{indent}</{node.name}>")
    else:
        if node.name and not current_in_pre:
            if len(list(node.children)) == 1 and node.string:
                text = _WS_RE.sub(" ", node.string).strip()
                output.append(f"{start_tag}{text}</{node.name}>")
            else:
                output.append(start_tag)
                for child in node.children:
                    _format_node(child, output, self_closing, block_elements,
                                 indent_level + 1, current_in_pre)
                output.append(f"{indent}</{node.name}>")
        else:
            if current_in_pre:
                output.append(start_tag)
                if node.string:
                    output.append(node.string)
                else:
                    for child in node.children:
                        _format_node(child, output, self_closing, block_elements,
                                     0, current_in_pre)
                output.append(f"</{node.name}>")
            else:  # pragma: no cover - unreachable (name truthy handled above)
                output.append(start_tag)
                for child in node.children:
                    _format_node(child, output, self_closing, block_elements,
                                 indent_level + 1, current_in_pre)
                output.append(f"{indent}</{node.name}>")


def _clean_and_format(content_html: str, clean: bool = True) -> str:
    """html_formatter.py:68-98 + 209-238."""
    doc = parse(content_html)
    if clean:
        for element in doc.find_all(REMOVE_TAGS):
            element.decompose()
        for tag in doc.find_all(True):
            if tag.attrs:
                tag.attrs = {k: v for k, v in tag.attrs.items() if k in ALLOWED_ATTRS}
    main_content = find_main_content(doc)
    out: list[str] = []
    _format_node(main_content, out)
    return "\n".join(out)


_CSS = (
    # html_formatter.py:124-138 (byte-for-byte)
    '  <style>\n'
    '    body { font-family: -apple-system, BlinkMacSystemFont, "Segoe UI", Roboto, Helvetica, Arial, sans-serif; line-height: 1.6; color: #333; max-width: 800px; margin: 0 auto; padding: 20px; }\n'
    '    img { max-width: 100%; height: auto; }\n'
    '    a { color: #0366d6; text-decoration: none; }\n'
    '    a:hover { text-decoration: underline; }\n'
    '    h1, h2, h3, h4, h5, h6 { margin-top: 1.5em; margin-bottom: 0.5em; }\n'
    '    p, ul, ol { margin-bottom: 1em; }\n'
    '    code { background-color: #f6f8fa; padding: 0.2em 0.4em; border-radius: 3px; }\n'
    '    pre { background-color: #f6f8fa; padding: 16px; overflow: auto; border-radius: 3px; }\n'
    '    blockquote { margin: 0; padding-left: 1em; color: #6a737d; border-left: 0.25em solid #dfe2e5; }\n'
    '    table { border-collapse: collapse; width: 100%; }\n'
    '    table, th, td { border: 1px solid #dfe2e5; }\n'
    '    th, td { padding: 8px 12px; }\n'
    '    .source-link { margin-bottom: 20px; font-style: italic; }\n'
    '  </style>\n'
)


def format_html(
    record: dict,
    include_images: bool = False,
    image_map: Optional[dict] = None,
    clean_html: bool = True,
    add_boilerplate: bool = True,
    add_css: bool = True,
) -> str:
    """Full clean-HTML document — html_formatter.py:48-207."""
    image_map = image_map or {}
    if not record.get("content"):
        return (
            f"<!-- Error fetching content from {record.get('url', '')} -->\n"
            f"<h1>{record.get('title', '')}</h1>"
        )

    title = record.get("title", "")
    url = record.get("url", "")
    og_metadata = record.get("og_metadata") or {}
    clean_content = _clean_and_format(record["content"], clean=clean_html)

    if add_boilerplate:
        result = '<!DOCTYPE html>\n<html lang="en">\n<head>\n'
        result += '  <meta charset="UTF-8">\n'
        result += '  <meta name="viewport" content="width=device-width, initial-scale=1.0">\n'
        result += f"  <title>{html_mod.escape(title)}</title>\n"
        if og_metadata and "og_description" in og_metadata:
            desc = html_mod.escape(og_metadata["og_description"])
        else:
            desc = html_mod.escape(f"Content from {title}")
        result += f'  <meta name="description" content="{desc}">\n'
        if og_metadata:
            if "og_title" in og_metadata:
                result += f'  <meta property="og:title" content="{html_mod.escape(og_metadata["og_title"])}">\n'
            if "og_description" in og_metadata:
                result += f'  <meta property="og:description" content="{html_mod.escape(og_metadata["og_description"])}">\n'
            if "og_image" in og_metadata:
                result += f'  <meta property="og:image" content="{html_mod.escape(og_metadata["og_image"])}">\n'
        if add_css:
            result += _CSS
        result += "</head>\n<body>\n"
        result += f"  <h1>{html_mod.escape(title)}</h1>\n"
        result += (
            f'  <p class="source-link">Source: <a href="{html_mod.escape(url)}" '
            f'target="_blank">{html_mod.escape(url)}</a></p>\n'
        )
        result += clean_content
        if include_images and record.get("images"):
            result += '\n  <h2>Images</h2>\n  <div class="images">\n'
            for img in record["images"]:
                img_url = img["url"]
                img_alt = img.get("alt", "")
                src = image_map.get(img_url, img_url)
                result += '    <div class="image-container">\n'
                result += f'      <img src="{html_mod.escape(src)}" alt="{html_mod.escape(img_alt)}"'
                if img_url in image_map:
                    if img.get("width"):
                        result += f' width="{img["width"]}"'
                    if img.get("height"):
                        result += f' height="{img["height"]}"'
                result += ">\n"
                result += f'      <p class="image-caption">{html_mod.escape(img_alt)}</p>\n'
                result += "    </div>\n"
            result += "  </div>\n"
        result += "</body>\n</html>"
    else:
        result = f"<!-- Title: {title} -->\n"
        result += f"<!-- Source: {url} -->\n\n"
        result += clean_content
        if include_images and record.get("images"):
            result += "\n\n<h2>Images</h2>\n"
            for img in record["images"]:
                src = image_map.get(img["url"], img["url"])
                result += (
                    f'<img src="{html_mod.escape(src)}" '
                    f'alt="{html_mod.escape(img.get("alt", ""))}" />\n'
                )
    return result
