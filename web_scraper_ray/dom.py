"""Minimal DOM on stdlib ``html.parser`` with BeautifulSoup-compatible
semantics for the subset of operations the extraction kernel needs.

The reference (``contxt``) uses ``BeautifulSoup(html, "html.parser")``
throughout (``contxt/scraper.py:274``, ``contxt/formatters/markdown_formatter.py:95``).
bs4 is not available in this environment, so this module reimplements the
needed tree model directly on :class:`html.parser.HTMLParser`:

* ``Node`` — an element with ``name``, ``attrs`` (dict), ``children``.
* ``TextNode`` / ``CommentNode`` — leaves; like bs4's ``NavigableString``
  and ``Comment``, a comment *is a* text node (``CommentNode`` subclasses
  ``TextNode``) because bs4's ``Comment`` subclasses ``NavigableString``
  and several reference code paths depend on that (e.g. the markdown
  traversal's text branch, ``markdown_formatter.py:144-149``).
* ``get_text(strip=...)`` matches bs4: concatenate descendant strings;
  with ``strip=True`` each string is stripped and empties dropped.
* ``find`` / ``find_all`` with tag-name, attr-dict (``class`` is
  whitespace-multi-valued like bs4), and predicate matching.
* ``decompose``, ``replace_with``, ``clear``/``append`` and the
  ``.string`` accessor used by the span-concatenation pass
  (``contxt/scraper.py:365-405``).
* ``serialize()`` ≈ ``str(soup)`` with bs4's "minimal" entity escaping.

Entity handling: ``convert_charrefs=True`` (the html.parser default, and
what bs4's html.parser tree builder uses) — character references decode
to text at parse time and re-escape minimally at serialization.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator, Optional, Union

# HTML void elements (no closing tag, serialized self-closed like bs4's
# html.parser builder renders them).
VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)



class TextNode:
    """A text leaf. ``name`` is ``None`` (like bs4 NavigableString)."""

    __slots__ = ("text", "parent")
    name = None

    def __init__(self, text: str, parent: Optional["Node"] = None):
        self.text = text
        self.parent = parent

    # bs4 NavigableString.string returns itself.
    @property
    def string(self) -> str:
        return self.text

    def get_text(self, separator: str = "", strip: bool = False) -> str:
        if strip:
            t = self.text.strip()
            return t
        return self.text

    def replace_with(self, replacement: Union[str, "TextNode", "Node"]) -> None:
        if self.parent is None:
            return
        if isinstance(replacement, str):
            replacement = TextNode(replacement)
        idx = self.parent.children.index(self)
        replacement.parent = self.parent
        self.parent.children[idx] = replacement

    def extract(self) -> "TextNode":
        if self.parent is not None:
            self.parent.children.remove(self)
            self.parent = None
        return self

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"TextNode({self.text!r})"


class CommentNode(TextNode):
    """An HTML comment; subclasses TextNode the way bs4's Comment
    subclasses NavigableString (see module docstring)."""

    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"CommentNode({self.text!r})"


AnyNode = Union["Node", TextNode]


class Node:
    """An element node."""

    __slots__ = ("name", "attrs", "children", "parent")

    def __init__(self, name: str, attrs: Optional[dict] = None,
                 parent: Optional["Node"] = None):
        self.name = name
        self.attrs: dict = attrs if attrs is not None else {}
        self.children: list[AnyNode] = []
        self.parent = parent

    # -- construction -----------------------------------------------------
    def append(self, child: Union[str, AnyNode]) -> None:
        if isinstance(child, str):
            child = TextNode(child)
        child.parent = self
        self.children.append(child)

    def clear(self) -> None:
        for c in self.children:
            c.parent = None
        self.children = []

    # -- bs4-compatible accessors ----------------------------------------
    def get(self, key: str, default=None):
        return self.attrs.get(key, default)

    @property
    def string(self) -> Optional[str]:
        """bs4 semantics: the single string child if the element has
        exactly one child and it is a text node, else ``None`` (one
        level of tag nesting also forwards in bs4; the kernel only
        relies on the single-text-child case, ``scraper.py:392``)."""
        if len(self.children) == 1:
            only = self.children[0]
            if isinstance(only, TextNode):
                return only.text
            if isinstance(only, Node):
                return only.string
        return None

    @string.setter
    def string(self, value: str) -> None:
        self.clear()
        self.append(TextNode(value))

    def descendants(self) -> Iterator[AnyNode]:
        """Document-order (preorder) iterator over all descendants."""
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            yield node
            if isinstance(node, Node):
                stack.extend(reversed(node.children))

    def strings(self) -> Iterator[TextNode]:
        for node in self.descendants():
            if isinstance(node, TextNode):
                yield node

    def get_text(self, separator: str = "", strip: bool = False) -> str:
        """bs4 ``get_text``: join descendant strings (comments excluded —
        bs4's ``.strings`` skips non-plain NavigableString subclasses for
        text extraction via ``_all_strings`` default types).

        Hot path (called ~35×/page by the cleaning kernel): inline
        explicit-stack preorder walk — the ``strings()`` generator
        costs ~1.4 µs/node in pure yield overhead at this call volume."""
        parts = []
        stack = list(reversed(self.children))
        pop = stack.pop
        push = stack.extend
        while stack:
            node = pop()
            cls = node.__class__
            if cls is TextNode:
                s = node.text
                if strip:
                    s = s.strip()
                    if not s:
                        continue
                parts.append(s)
            elif cls is not CommentNode:  # element: descend
                push(reversed(node.children))
        return separator.join(parts)

    # -- search -----------------------------------------------------------
    def _matches(self, node: "Node", name, attrs: Optional[dict]) -> bool:
        if name is not None:
            if callable(name):
                return bool(name(node))
            if isinstance(name, (list, tuple, set, frozenset)):
                if node.name not in name:
                    return False
            elif node.name != name:
                return False
        if attrs:
            for k, v in attrs.items():
                actual = node.attrs.get(k)
                if actual is None:
                    return False
                if k == "class":
                    # bs4: class is multi-valued, match any whitespace token
                    if v not in actual.split():
                        return False
                elif actual != v:
                    return False
        return True

    def find_all(self, name=None, attrs: Optional[dict] = None,
                 recursive: bool = True, string: Optional[bool] = None,
                 limit: Optional[int] = None) -> list:
        """Subset of bs4 find_all. ``string=True`` returns text nodes
        (including comments, like bs4 ``find_all(string=True)``).
        ``name=True`` matches every element (bs4 ``find_all(True)``).

        Hot path (~19×/page, visiting ~1k nodes each): explicit-stack
        preorder walk instead of the ``descendants()`` generator, with
        the dominant call shape — plain string tag name, no attrs —
        matched inline rather than through ``_matches``."""
        out: list = []
        if not recursive:
            for node in self.children:
                if string is not None:
                    if isinstance(node, TextNode):
                        out.append(node)
                elif isinstance(node, Node):
                    if name is True or self._matches(node, name, attrs):
                        out.append(node)
                if limit is not None and len(out) >= limit:
                    break
            return out
        want_text = string is not None
        simple = member = False
        if not want_text and name is not True and not attrs:
            if isinstance(name, str):
                simple = True
            elif isinstance(name, (list, tuple, set, frozenset)):
                member = True
        stack = list(reversed(self.children))
        pop = stack.pop
        push = stack.extend
        while stack:
            node = pop()
            if isinstance(node, TextNode):
                if want_text:
                    out.append(node)
                    if limit is not None and len(out) >= limit:
                        break
                continue
            # element
            if simple:
                if node.name == name:
                    out.append(node)
                    if limit is not None and len(out) >= limit:
                        break
            elif member:
                if node.name in name:
                    out.append(node)
                    if limit is not None and len(out) >= limit:
                        break
            elif not want_text and (
                name is True or self._matches(node, name, attrs)
            ):
                out.append(node)
                if limit is not None and len(out) >= limit:
                    break
            push(reversed(node.children))
        return out

    def find(self, name=None, attrs: Optional[dict] = None,
             recursive: bool = True):
        res = self.find_all(name, attrs, recursive=recursive, limit=1)
        return res[0] if res else None

    # -- mutation ---------------------------------------------------------
    def decompose(self) -> None:
        if self.parent is not None:
            try:
                self.parent.children.remove(self)
            except ValueError:
                pass
            self.parent = None
        self.clear()

    def replace_with(self, replacement: Union[str, AnyNode]) -> None:
        if self.parent is None:
            return
        if isinstance(replacement, str):
            replacement = TextNode(replacement)
        idx = self.parent.children.index(self)
        replacement.parent = self.parent
        self.parent.children[idx] = replacement
        self.parent = None

    # -- serialization ----------------------------------------------------
    def serialize(self) -> str:
        out: list[str] = []
        _serialize_into(self, out, root=True)
        return "".join(out)

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<Node {self.name} attrs={self.attrs} children={len(self.children)}>"


ROOT_NAME = "[document]"


def escape_text(text: str) -> str:
    """bs4 'minimal' formatter text escaping: & < >."""
    return text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def escape_attr(value: str) -> str:
    """bs4 'minimal' formatter attribute escaping: & and double quote."""
    return value.replace("&", "&amp;").replace('"', "&quot;")


def _serialize_into(node: AnyNode, out: list[str], root: bool = False) -> None:
    """Iterative serializer (explicit stack): arbitrary nesting depth
    must not hit Python's recursion limit — crawled pages are
    adversarial input."""
    # stack holds either nodes to open or ready-made closing strings
    stack: list = [(node, root)]
    while stack:
        item = stack.pop()
        if isinstance(item, str):
            out.append(item)
            continue
        cur, is_root_slot = item
        if isinstance(cur, CommentNode):
            out.append(f"<!--{cur.text}-->")
            continue
        if isinstance(cur, TextNode):
            out.append(escape_text(cur.text))
            continue
        is_root = is_root_slot and cur.name == ROOT_NAME
        if not is_root:
            # most nodes carry no attributes after cleaning — skip the
            # generator-join entirely for them (hot path)
            attrs = "" if not cur.attrs else "".join(
                f" {k}" if v is None else f' {k}="{escape_attr(v)}"'
                for k, v in cur.attrs.items()
            )
            if cur.name in VOID_ELEMENTS and not cur.children:
                out.append(f"<{cur.name}{attrs}/>")
                continue
            out.append(f"<{cur.name}{attrs}>")
            stack.append(f"</{cur.name}>")
        for child in reversed(cur.children):
            stack.append((child, False))


def merge_adjacent_text(node: Node) -> None:
    """Normalize a tree to its serialize→parse fixed point, in place.

    For trees this parser produced (lowercase names, decoded entities)
    with no script/style CDATA content, re-parsing the serialization
    changes exactly two things: runs of adjacent plain text nodes merge
    into one, and empty text nodes disappear (``handle_data`` skips
    empty data). Applying those two rewrites directly is equivalent and
    skips a full pure-Python parse — used by the extraction kernel's
    markdown step (a CommentNode is a barrier, never merged).

    Iterative (explicit worklist): depth-proof against adversarial
    nesting, like the serializer."""
    worklist: list[Node] = [node]
    while worklist:
        cur = worklist.pop()
        new_children: list[AnyNode] = []
        run: list[str] = []
        for child in cur.children:
            if type(child) is TextNode:
                run.append(child.text)
                continue
            if run:
                merged = "".join(run)
                if merged:
                    new_children.append(TextNode(merged, cur))
                run = []
            new_children.append(child)
            if isinstance(child, Node):
                worklist.append(child)
        if run:
            merged = "".join(run)
            if merged:
                new_children.append(TextNode(merged, cur))
        cur.children = new_children


class _TreeBuilder(HTMLParser):
    """Builds a Node tree. Mirrors bs4's html.parser tree builder for the
    constructs the kernel/corpus use: void elements never take children;
    an unmatched end tag is ignored; a mismatched end tag pops up to the
    nearest matching open element (html.parser itself does no implicit
    closes, and neither does bs4 on this builder)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node(ROOT_NAME)
        self.stack: list[Node] = [self.root]

    @staticmethod
    def _attr_dict(attrs) -> dict:
        # bs4's html.parser builder normalizes valueless attributes
        # (<a href>) to "" — html.parser itself yields None
        return {k: (v if v is not None else "") for k, v in attrs}

    def handle_starttag(self, tag: str, attrs) -> None:
        # attr-less tags (the majority) skip the normalizing dict build
        node = Node(tag, self._attr_dict(attrs) if attrs else None)
        self.stack[-1].append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        node = Node(tag, self._attr_dict(attrs) if attrs else None)
        self.stack[-1].append(node)

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_ELEMENTS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return
        # unmatched end tag: ignored

    def handle_data(self, data: str) -> None:
        if data:
            self.stack[-1].append(TextNode(data))

    def handle_comment(self, data: str) -> None:
        self.stack[-1].append(CommentNode(data))

    def handle_decl(self, decl: str) -> None:
        # DOCTYPE etc. — dropped (the kernel never reads it; bs4 keeps a
        # Doctype node but no reference code path consumes it).
        pass

    def error(self, message):  # pragma: no cover - py<3.10 compat hook
        pass


def parse(html: str) -> Node:
    """Parse HTML into a document root node (name ``[document]``)."""
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root
