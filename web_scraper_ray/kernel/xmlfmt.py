"""HTML → XML formatter — reproduces
``contxt.formatters.xml_formatter.XMLFormatter``
(`/root/reference/contxt/formatters/xml_formatter.py:104-414`) on the
stdlib DOM + ElementTree, including its quirks:

* the ``[document]`` root itself is processed as an element, so the body
  wraps content in ``<_document_>`` (sanitized tag name,
  ``xml_formatter.py:244-248,350-371``);
* text is escaped with ``html.escape`` *and then again* by
  ``ET.tostring`` (double-escaping, ``xml_formatter.py:227,318-332``);
* empty non-void elements are pruned recursively and whitespace
  normalized (``xml_formatter.py:286-316``);
* ``class``→``class_attr``, ``for``→``for_attr``
  (``xml_formatter.py:383-387``).

One deliberate deviation: the reference iterates ``important_attrs`` as
a Python *set* (``xml_formatter.py:268``) whose order is
process-hash-randomized — unacceptable for a distributed engine that
must emit identical bytes on every worker. We use the same attributes in
the fixed order they are written in the reference source
(``xml_formatter.py:100-102``).
"""

from __future__ import annotations

import html as html_mod
import re
import xml.dom.minidom
import xml.etree.ElementTree as ET
from typing import Optional

from ..dom import Node, parse

TAG_MAPPING = {
    # xml_formatter.py:31-91
    "h1": "h1", "h2": "h2", "h3": "h3", "h4": "h4", "h5": "h5", "h6": "h6",
    "article": "article", "section": "section", "main": "main", "div": "div",
    "aside": "aside", "header": "header", "footer": "footer", "nav": "nav",
    "p": "p", "blockquote": "blockquote", "pre": "pre", "code": "code",
    "ul": "ul", "ol": "ol", "li": "li",
    "table": "table", "thead": "thead", "tbody": "tbody", "tfoot": "tfoot",
    "tr": "tr", "th": "th", "td": "td",
    "a": "a", "span": "span", "strong": "strong", "em": "em", "b": "b",
    "i": "i", "u": "u", "mark": "mark",
    "img": "img", "figure": "figure", "figcaption": "figcaption",
    "picture": "picture", "video": "video", "audio": "audio",
    "hr": "hr", "br": "br",
}

SKIP_TAGS = frozenset(
    # xml_formatter.py:94-97
    "script style noscript iframe svg canvas meta link input button form template".split()
)

# xml_formatter.py:100-102 — fixed order (see module docstring deviation note)
IMPORTANT_ATTRS = ("id", "class", "href", "src", "alt", "title", "aria-label", "role")

_CTRL_RE = re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]")  # xml_formatter.py:409
_SURR_RE = re.compile(r"[\uD800-\uDFFF]")  # xml_formatter.py:412
_WS_RE = re.compile(r"\s+")


def _escape_text(text: Optional[str]) -> str:
    if not text:
        return ""
    return html_mod.escape(str(text))


def _escape_attr(text: Optional[str]) -> str:
    if not text:
        return ""
    return html_mod.escape(str(text), quote=True)


def _sanitize_tag_name(name: str) -> str:
    if not name:
        return "tag"
    sanitized = re.sub(r"[^a-zA-Z0-9_-]", "_", name)
    if not re.match(r"^[a-zA-Z_]", sanitized):
        sanitized = "tag_" + sanitized
    return sanitized


def _sanitize_attr_name(name: str) -> str:
    if name == "class":
        return "class_attr"
    if name == "for":
        return "for_attr"
    sanitized = re.sub(r"[^a-zA-Z0-9_-]", "_", name)
    if not re.match(r"^[a-zA-Z_]", sanitized):
        sanitized = "attr_" + sanitized
    return sanitized


def _process_element(element, parent_xml: ET.Element, simplify_structure: bool,
                     preserve_attrs: bool) -> None:
    """xml_formatter.py:214-284 — recursive HTML→ET mapping."""
    if not isinstance(element, Node):
        # text (and comment — NavigableString in bs4) nodes
        if element.string and element.string.strip():
            safe_text = _escape_text(element.string.strip())
            if parent_xml.text is None:
                parent_xml.text = safe_text
            else:
                parent_xml.text += " " + safe_text
        return

    if element.name in SKIP_TAGS:
        return
    if element.name not in ("img", "br", "hr") and not element.get_text(strip=True):
        return

    if simplify_structure and element.name in TAG_MAPPING:
        tag_name = TAG_MAPPING[element.name]
    else:
        tag_name = _sanitize_tag_name(element.name)

    new_element = ET.SubElement(parent_xml, tag_name)

    if preserve_attrs:
        for attr, value in element.attrs.items():
            attr = _sanitize_attr_name(attr)
            if isinstance(value, list):
                value = " ".join(value)
            elif not isinstance(value, str):
                value = str(value)
            new_element.set(attr, _escape_attr(value))
    else:
        for attr in IMPORTANT_ATTRS:
            if attr in element.attrs:
                value = element.attrs[attr]
                attr = _sanitize_attr_name(attr)
                if isinstance(value, list):
                    value = " ".join(value)
                elif not isinstance(value, str):
                    value = str(value)
                new_element.set(attr, _escape_attr(value))

    for child in element.children:
        _process_element(child, new_element, simplify_structure, preserve_attrs)


def _clean_xml_structure(element: ET.Element) -> None:
    """xml_formatter.py:286-316 — prune empty elements, normalize ws."""
    children_to_remove = []
    for child in element:
        _clean_xml_structure(child)
        if (
            child.tag not in ("img", "br", "hr")
            and not child.text
            and not child.tail
            and len(child) == 0
        ):
            children_to_remove.append(child)
    for child in children_to_remove:
        element.remove(child)
    if element.text:
        element.text = _WS_RE.sub(" ", element.text).strip()
    for child in element:
        if child.tail:
            child.tail = _WS_RE.sub(" ", child.tail).strip()


def _clean_xml_string(xml_str: str) -> str:
    xml_str = _CTRL_RE.sub("", xml_str)
    return _SURR_RE.sub("", xml_str)


def format_xml(
    record: dict,
    include_images: bool = False,
    image_map: Optional[dict] = None,
    simplify_structure: bool = True,
    preserve_attrs: bool = False,
) -> str:
    """Full XML document — xml_formatter.py:104-212."""
    image_map = image_map or {}
    if not record.get("content"):
        return (
            '<?xml version="1.0" ?>\n'
            f'<error url="{_escape_attr(record.get("url", ""))}">'
            f'{_escape_text(record.get("title", ""))}</error>'
        )

    title = record.get("title", "")
    url = record.get("url", "")
    og_metadata = record.get("og_metadata") or {}

    doc = parse(record["content"])

    root = ET.Element("content")
    meta_elem = ET.SubElement(root, "metadata")
    title_elem = ET.SubElement(meta_elem, "title")
    title_elem.text = _escape_text(title)
    url_elem = ET.SubElement(meta_elem, "url")
    url_elem.text = _escape_text(url)

    if og_metadata:
        og_elem = ET.SubElement(meta_elem, "open_graph")
        if "og_title" in og_metadata:
            ET.SubElement(og_elem, "title").text = _escape_text(og_metadata["og_title"])
        if "og_description" in og_metadata:
            ET.SubElement(og_elem, "description").text = _escape_text(
                og_metadata["og_description"]
            )
        if "og_image" in og_metadata:
            ET.SubElement(og_elem, "image").text = _escape_text(og_metadata["og_image"])

    body = ET.SubElement(root, "body")
    _process_element(doc, body, simplify_structure, preserve_attrs)
    _clean_xml_structure(body)

    if include_images and record.get("images"):
        images_elem = ET.SubElement(root, "images")
        for img in record["images"]:
            image = ET.SubElement(images_elem, "image")
            if img["url"] in image_map:
                ET.SubElement(image, "path").text = _escape_text(image_map[img["url"]])
            else:
                ET.SubElement(image, "url").text = _escape_text(img["url"])
            ET.SubElement(image, "alt").text = _escape_text(img.get("alt", ""))
            dims = {
                k: img[k]
                for k in ("width", "height")
                if img.get(k)
            }
            if dims:
                dimensions = ET.SubElement(image, "dimensions")
                for key, value in dims.items():
                    dimensions.set(key, str(value))

    xml_str = ET.tostring(root, encoding="unicode")
    xml_str = _clean_xml_string(xml_str)
    try:
        dom = xml.dom.minidom.parseString(f'<?xml version="1.0" ?>\n{xml_str}')
        return dom.toprettyxml(indent="  ")
    except Exception:
        return f'<?xml version="1.0" ?>\n{xml_str}'
