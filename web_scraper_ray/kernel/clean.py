"""HTML cleaning pipeline — reproduces ``contxt.scraper.Scraper._clean_html``
(`/root/reference/contxt/scraper.py:263-405`) on the stdlib DOM.

Order of operations (as in the reference):

1. OpenGraph metadata extraction (pre-cleaning copy)  — ``scraper.py:277,324-343``
2. boilerplate element removal                         — ``scraper.py:279-285``
3. HTML comment removal                                — ``scraper.py:287-289``
4. attribute pruning to {href, src, alt}               — ``scraper.py:291-297``
5. within-document ``<li>`` dedup (first-wins)         — ``scraper.py:345-363``
6. adjacent-``<span>`` concatenation                   — ``scraper.py:365-405``
7. text-node normalization (svg strip, ws collapse)    — ``scraper.py:305-320``

Fidelity note on step 2: the reference passes CSS-ish strings like
``"[class*='menu']"`` into ``soup([...])`` which does *tag-name*
matching — those strings match no tag name, so the *effective* behavior
(reproduced here, per SURVEY.md §2.3 M6) is removal of the literal tag
list only.
"""

from __future__ import annotations

import re
from typing import Tuple

from ..dom import CommentNode, Node, parse

# scraper.py:280-284 — only the real tag names take effect (see module
# doc). frozenset: name-membership is what bs4's name-list matching
# reduces to, and set lookup beats the reference's 20-entry list scan.
BOILERPLATE_TAGS = frozenset(
    [
        "script", "style", "header", "footer", "nav", "noscript",
        "form", "button", "input", "iframe", "aside", "svg",
        "[class*='menu']", "[class*='nav']", "[class*='footer']",
        "[class*='header']", "[id*='menu']", "[id*='nav']",
        "[id*='footer']", "[id*='header']",
    ]
)

ALLOWED_ATTRS = ("href", "src", "alt")  # scraper.py:293

_SVG_RE = re.compile(r"<svg.*?</svg>\s*", re.DOTALL)  # scraper.py:315
_WS_RE = re.compile(r"\s+")  # scraper.py:317


def extract_og_metadata(doc: Node) -> dict:
    """OpenGraph metadata → dict (``scraper.py:324-343``). Only keys with
    truthy ``content`` are present, exactly like the reference."""
    metadata: dict = {}
    og_title = doc.find("meta", {"property": "og:title"})
    if og_title is not None and og_title.get("content"):
        metadata["og_title"] = og_title.get("content")
    og_description = doc.find("meta", {"property": "og:description"})
    if og_description is not None and og_description.get("content"):
        metadata["og_description"] = og_description.get("content")
    og_image = doc.find("meta", {"property": "og:image"})
    if og_image is not None and og_image.get("content"):
        metadata["og_image"] = og_image.get("content")
    return metadata


def _remove_boilerplate(doc: Node) -> None:
    for element in doc.find_all(BOILERPLATE_TAGS):
        element.decompose()


def _remove_comments(doc: Node) -> None:
    for node in doc.find_all(string=True):
        if isinstance(node, CommentNode):
            node.extract()


def _prune_attrs(doc: Node) -> None:
    for tag in doc.find_all(True):
        if tag.attrs:
            tag.attrs = {k: v for k, v in tag.attrs.items() if k in ALLOWED_ATTRS}


def deduplicate_list_items(doc: Node) -> None:
    """Two-phase ``<li>`` dedup on ``get_text(strip=True)``, first
    occurrence in document order wins (``scraper.py:345-363``)."""
    _dedup_lis(doc.find_all("li"))


def concatenate_spans(doc: Node) -> None:
    """Merge adjacent sibling ``<span>`` pairs into the *second* span and
    drop the first (``scraper.py:365-405``). Adjacency is over the raw
    child list — an intervening text node (even whitespace) breaks it,
    exactly as in the reference. Chained runs fold left-to-right because
    the merged text is written into the next span before it is visited.

    Reference shape note: ``find_all(lambda tag: tag.find('span'))`` —
    every element with a span DESCENDANT, in document order
    (scraper.py:371). A literal port rescans descendants per element
    (O(n²)); ``_concat_spans_from`` instead climbs each span's ancestor
    chain and emits the same set in one document-order pass — identical
    result, linear time."""
    _concat_spans_from(doc, doc.find_all("span"))


def normalize_text_nodes(doc: Node) -> None:
    """Strip inline ``<svg…</svg>`` remnants and collapse whitespace in
    every text node (``scraper.py:305-320``)."""
    text_nodes = list(doc.find_all(string=True))
    for node in text_nodes:
        if node.parent is not None and not isinstance(node, CommentNode):
            if node.string:
                cleaned = _SVG_RE.sub("", node.string)
                cleaned = _WS_RE.sub(" ", cleaned).strip()
                if cleaned != node.string:
                    node.replace_with(cleaned)


def _dedup_lis(lis: list[Node]) -> None:
    """The two-phase loop of :func:`deduplicate_list_items` over an
    already-collected document-order li list."""
    seen: set[str] = set()
    to_remove = []
    for li in lis:
        text = li.get_text(strip=True)
        if text in seen:
            to_remove.append(li)
        else:
            seen.add(text)
    for li in to_remove:
        li.decompose()


def _concat_spans_from(doc: Node, spans: list[Node]) -> None:
    """:func:`concatenate_spans` body over a pre-collected span list.
    Spans inside since-removed subtrees are harmless: their ancestor
    chains end at detached nodes, and the live-tree ``descendants``
    filter below drops those — identical to collecting after removal."""
    ancestor_set: set[int] = set()
    for span in spans:
        node = span.parent
        while node is not None and node.name != "[document]":
            ancestor_set.add(id(node))
            node = node.parent
    if not ancestor_set:
        return
    parents = [n for n in doc.descendants()
               if isinstance(n, Node) and id(n) in ancestor_set]
    for parent in parents:
        children = list(parent.children)
        spans_to_remove = []
        i = 0
        while i < len(children) - 1:
            current = children[i]
            next_elem = children[i + 1]
            if current.name == "span" and next_elem.name == "span":
                current_text = current.get_text(strip=True)
                next_text = next_elem.get_text(strip=True)
                if current_text and next_text:
                    merged = f"{current_text} {next_text}"
                    if next_elem.string:
                        next_elem.string = merged
                    else:
                        next_elem.clear()
                        next_elem.append(merged)
                    spans_to_remove.append(current)
            i += 1
        for span in spans_to_remove:
            span.decompose()


def clean_document(doc: Node) -> Tuple[Node, dict]:
    """Run the full cleaning pipeline in place; returns ``(doc, og)``.

    Steps 3-6 share ONE preorder walk of the post-boilerplate tree
    (the hot path runs ~1k nodes/page × 4 separate scans otherwise):
    comments, li and span elements are collected and attrs pruned in a
    single pass, then processed in the reference's order. Equivalence:
    comment extraction never changes the element set, attr pruning
    never changes text, ``get_text`` skips comments regardless, and li
    decomposition's effect on span collection is neutralized by
    ``_concat_spans_from``'s live-tree ancestor filter — so each
    step sees exactly the state the sequential pipeline would (the
    byte-parity golden gate pins this)."""
    from ..dom import TextNode

    og_metadata = extract_og_metadata(doc)
    _remove_boilerplate(doc)

    comments: list = []
    lis: list[Node] = []
    spans: list[Node] = []
    stack = list(reversed(doc.children))
    pop = stack.pop
    push = stack.extend
    while stack:
        node = pop()
        cls = node.__class__
        if cls is CommentNode:
            comments.append(node)
            continue
        if cls is TextNode:
            continue
        if node.attrs:
            node.attrs = {k: v for k, v in node.attrs.items()
                          if k in ALLOWED_ATTRS}
        name = node.name
        if name == "li":
            lis.append(node)
        elif name == "span":
            spans.append(node)
        push(reversed(node.children))

    for c in comments:
        c.extract()
    _dedup_lis(lis)
    _concat_spans_from(doc, spans)
    normalize_text_nodes(doc)
    return doc, og_metadata


def clean_html(html: str) -> Tuple[str, dict]:
    """Parse → clean → serialize. Equivalent to the reference's
    ``_clean_html`` + ``str(soup_copy)`` round trip (``scraper.py:274``
    reparses the serialized soup, which our parse-once achieves because
    the corpus HTML is produced by this same serializer)."""
    doc = parse(html)
    doc, og = clean_document(doc)
    return doc.serialize(), og
