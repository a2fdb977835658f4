"""Minimal HTML DOM on stdlib ``html.parser``.

Implements exactly the subset of tree behaviors the extraction
semantics depend on (modeled on how the reference uses BeautifulSoup's
``html.parser`` builder — see contxt/scraper.py:263-405 and
contxt/formatters/markdown_formatter.py:85-283 for the consumed API):

- document-order ``find_all`` / ``descendants``
- ``get_text(strip=...)``: concatenation of descendant text segments,
  each stripped and empty-dropped when ``strip=True``, joined by ``sep``
- single-string descent (`bs4` ``.string``): an element with exactly
  one child descends recursively until a text node
- ``decompose`` (detach subtree), attribute dict access
- void elements never take children; stray end tags pop to the nearest
  matching open tag and are otherwise ignored
- character references resolved at parse time (``convert_charrefs``)

No bs4 code is used or copied; this is a fresh implementation of the
documented html.parser tree-building contract.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Callable, Iterator

VOID_ELEMENTS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)

# Minimal serialization escaping (text nodes / attribute values).
_ESC_TEXT = {"&": "&amp;", "<": "&lt;", ">": "&gt;"}
_ESC_ATTR = {"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;"}


def _escape(s: str, table: dict) -> str:
    for k, v in table.items():
        s = s.replace(k, v)
    return s


class TextNode:
    """A text (or comment) node."""

    __slots__ = ("text", "parent", "is_comment")

    def __init__(self, text: str, is_comment: bool = False):
        self.text = text
        self.parent: Element | None = None
        self.is_comment = is_comment

    # Mirror of element API where the traversals need uniformity.
    name = None  # text nodes have no tag name

    def decompose(self) -> None:
        if self.parent is not None:
            self.parent.children.remove(self)
            self.parent = None

    def to_html(self) -> str:
        if self.is_comment:
            return f"<!--{self.text}-->"
        return _escape(self.text, _ESC_TEXT)

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        kind = "Comment" if self.is_comment else "Text"
        return f"{kind}({self.text!r})"


class Element:
    """An element node with tag name, attributes, and children."""

    __slots__ = ("name", "attrs", "children", "parent")

    def __init__(self, name: str, attrs: dict | None = None):
        self.name = name
        self.attrs: dict[str, str] = attrs or {}
        self.children: list[Element | TextNode] = []
        self.parent: Element | None = None

    # -- tree construction -------------------------------------------------
    def append(self, node: "Element | TextNode | str") -> None:
        if isinstance(node, str):
            node = TextNode(node)
        node.parent = self
        self.children.append(node)

    def clear(self) -> None:
        for c in self.children:
            c.parent = None
        self.children = []

    def decompose(self) -> None:
        if self.parent is not None:
            self.parent.children.remove(self)
            self.parent = None

    # -- queries -----------------------------------------------------------
    def get(self, attr: str, default=None):
        return self.attrs.get(attr, default)

    def classes(self) -> list[str]:
        """Whitespace-split class list (bs4 multi-valued attr analog)."""
        v = self.attrs.get("class")
        return v.split() if v else []

    def descendants(self) -> Iterator["Element | TextNode"]:
        """All descendant nodes in document order (excluding self)."""
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            yield node
            if isinstance(node, Element):
                stack.extend(reversed(node.children))

    def iter_elements(self) -> Iterator["Element"]:
        for node in self.descendants():
            if isinstance(node, Element):
                yield node

    def find_all(
        self,
        names: str | list | tuple | set | Callable | None = None,
        recursive: bool = True,
        **attr_filters,
    ) -> list["Element"]:
        """Document-order element search.

        ``names`` may be a tag name, a collection of names, or a
        predicate function. ``attr_filters`` match attribute values
        exactly, except ``class_`` which matches a class *token*
        (the bs4 convention the reference's content-root cascade
        relies on, contxt/formatters/markdown_formatter.py:103-114).
        """
        if callable(names) and not isinstance(names, (str, list, tuple, set)):
            pred = names
            name_set = None
        else:
            pred = None
            if names is None:
                name_set = None
            elif isinstance(names, str):
                name_set = {names}
            else:
                name_set = set(names)

        pool = self.iter_elements() if recursive else (c for c in self.children if isinstance(c, Element))
        out = []
        for el in pool:
            if name_set is not None and el.name not in name_set:
                continue
            if pred is not None and not pred(el):
                continue
            ok = True
            for k, want in attr_filters.items():
                if k == "class_":
                    if want not in el.classes():
                        ok = False
                        break
                else:
                    if el.attrs.get(k) != want:
                        ok = False
                        break
            if ok:
                out.append(el)
        return out

    def find(self, names=None, recursive: bool = True, **attr_filters):
        for el in self.find_all(names, recursive=recursive, **attr_filters):
            return el
        return None

    def text_nodes(self, include_comments: bool = True) -> list[TextNode]:
        return [
            n
            for n in self.descendants()
            if isinstance(n, TextNode) and (include_comments or not n.is_comment)
        ]

    def get_text(self, strip: bool = False, separator: str = "") -> str:
        """Concatenate descendant text segments (comments excluded).

        With ``strip=True`` each segment is stripped and empty segments
        are dropped before joining — the joining convention the
        reference's ``get_text(strip=True)`` calls rely on.
        """
        segs = [n.text for n in self.text_nodes(include_comments=False)]
        if strip:
            segs = [s.strip() for s in segs]
            segs = [s for s in segs if s]
        return separator.join(segs)

    def single_string_node(self) -> TextNode | None:
        """bs4 ``.string`` analog: descend through exactly-one-child
        chains until a text node; None if any level branches."""
        node: Element | TextNode = self
        while isinstance(node, Element):
            if len(node.children) != 1:
                return None
            node = node.children[0]
        return node if isinstance(node, TextNode) else None

    # -- serialization -----------------------------------------------------
    def to_html(self) -> str:
        parts: list[str] = []
        self._render(parts)
        return "".join(parts)

    def _render(self, parts: list[str]) -> None:
        if self.name == "[document]":
            for c in self.children:
                _render_node(c, parts)
            return
        attrs = "".join(
            f' {k}="{_escape(v, _ESC_ATTR)}"' if v is not None else f" {k}"
            for k, v in self.attrs.items()
        )
        if self.name in VOID_ELEMENTS:
            parts.append(f"<{self.name}{attrs}/>")
            return
        parts.append(f"<{self.name}{attrs}>")
        for c in self.children:
            _render_node(c, parts)
        parts.append(f"</{self.name}>")

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<{self.name} attrs={self.attrs} children={len(self.children)}>"


def _render_node(node, parts: list[str]) -> None:
    if isinstance(node, Element):
        node._render(parts)
    else:
        parts.append(node.to_html())


class _TreeBuilder(HTMLParser):
    """Builds an Element tree; lenient close-tag handling."""

    # Tags whose raw content html.parser delivers as CDATA-ish data.
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Element("[document]")
        self.stack: list[Element] = [self.root]

    def handle_starttag(self, tag, attrs):
        el = Element(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        el = Element(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].append(el)

    def handle_endtag(self, tag):
        # Pop to the nearest matching open tag; ignore stray closers.
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].append(TextNode(data))

    def handle_comment(self, data):
        self.stack[-1].append(TextNode(data, is_comment=True))

    def handle_entityref(self, name):  # pragma: no cover (convert_charrefs)
        self.stack[-1].append(TextNode(f"&{name};"))

    def handle_charref(self, name):  # pragma: no cover (convert_charrefs)
        self.stack[-1].append(TextNode(f"&#{name};"))


def parse_html(html: str) -> Element:
    """Parse an HTML string into a document Element (name='[document]')."""
    b = _TreeBuilder()
    b.feed(html or "")
    b.close()
    return b.root
