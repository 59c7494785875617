"""Minimal DOM over stdlib ``html.parser`` with bs4-'html.parser'-
compatible behavior for the operations the extraction pipeline needs.

The reference parses pages with ``BeautifulSoup(content, 'html.parser')``
(/root/reference/myaku/crawlers/base.py:197) — i.e. Python's stdlib
tokenizer underneath. bs4 itself is not installed here, so this module
provides the same observable semantics for the subset used by
extraction (/root/reference/myaku/utils/html.py):

- no implied end tags (unclosed <p> nests, exactly like the bs4
  html.parser builder);
- end tags pop up the open stack to the nearest matching name and are
  ignored when unmatched;
- HTML void elements never take children;
- character references are decoded into text at parse time
  (convert_charrefs) and re-escaped minimally (& < >) on text
  extraction, reproducing bs4's ``str(tag)`` + ``re.sub('<.*?>', '')``
  round-trip in ``parse_valid_child_text`` (html.py:32-75) — including
  its quirk that extracted text contains ``&amp;``-style escapes;
- comments count as NavigableStrings for the "has any text" check but
  serialize to markup that the tag-strip regex removes.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator, Optional

VOID_ELEMENTS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}

# Tags allowed inside "valid child text" (html.py:22-24).
ALLOWABLE_TEXT_TAGS = {
    "a", "b", "blockquote", "br", "em", "i", "img", "span", "strong", "sup"
}


class Text(str):
    """A text node (bs4 NavigableString analog)."""

    is_comment = False


class Comment(str):
    """A comment node — NavigableString-like for presence checks."""

    is_comment = True


class Node:
    __slots__ = ("name", "attrs", "children", "parent")

    def __init__(self, name: str, attrs=None, parent: "Node | None" = None):
        self.name = name
        self.attrs = dict(attrs or {})
        self.children: list = []
        self.parent = parent

    # -- traversal ----------------------------------------------------------

    def descendants(self) -> Iterator:
        """Depth-first, document order (bs4 Tag.descendants)."""
        for child in self.children:
            yield child
            if isinstance(child, Node):
                yield from child.descendants()

    def element_children(self) -> list["Node"]:
        return [c for c in self.children if isinstance(c, Node)]

    def classes(self) -> list[str]:
        return (self.attrs.get("class") or "").split()

    # -- find/select (document order) ---------------------------------------

    def find_all(
        self,
        name: str | None = None,
        id: str | None = None,
        class_: str | None = None,
        class_re=None,
    ) -> list["Node"]:
        out = []
        for d in self.descendants():
            if not isinstance(d, Node):
                continue
            if name is not None and d.name != name:
                continue
            if id is not None and d.attrs.get("id") != id:
                continue
            if class_ is not None and class_ not in d.classes():
                continue
            if class_re is not None and not any(
                class_re.search(c) for c in d.classes()
            ):
                continue
            out.append(d)
        return out

    def select(self, tag_name: str, classes: list[str] | None = None):
        """CSS '{tag}.{c1}.{c2}' equivalent: all classes must be present;
        empty tag_name matches any element."""
        classes = classes or []
        out = []
        for d in self.descendants():
            if not isinstance(d, Node):
                continue
            if tag_name and d.name != tag_name:
                continue
            dc = d.classes()
            if all(c in dc for c in classes):
                out.append(d)
        return out

    def __repr__(self):  # debugging aid only
        return f"<{self.name} {self.attrs}>"


class _DomParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, self._merge_attrs(attrs), self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, self._merge_attrs(attrs), self.stack[-1])
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        # Pop to nearest matching open tag; ignore unmatched (bs4 behavior).
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(Text(data))

    def handle_comment(self, data):
        self.stack[-1].children.append(Comment(data))

    @staticmethod
    def _merge_attrs(attrs):
        # html.parser gives [(name, value|None)]; duplicate attr keeps first
        # (matching bs4 html.parser builder).
        merged = {}
        for k, v in attrs:
            if k not in merged:
                merged[k] = v if v is not None else ""
        return merged


def parse_html(html_str: str) -> Node:
    p = _DomParser()
    p.feed(html_str)
    p.close()
    return p.root


def _escape_min(s: str) -> str:
    """bs4 'minimal' formatter escaping applied to text nodes."""
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def parse_valid_child_text(parent: Node) -> Optional[str]:
    """Reference ``parse_valid_child_text`` semantics (html.py:32-75).

    Returns None if any descendant element is outside the allowlist or if
    the subtree contains no string node; otherwise the concatenation of
    minimally-escaped text (the observable result of
    ``re.sub('<.*?>', '', str(parent))``)."""
    has_string = False
    for d in parent.descendants():
        if isinstance(d, Node):
            if d.name not in ALLOWABLE_TEXT_TAGS:
                return None
        else:
            has_string = True
    if not has_string:
        return None
    parts = []
    for d in parent.descendants():
        if isinstance(d, Node):
            continue
        if getattr(d, "is_comment", False):
            continue  # serializes to markup the tag regex strips
        parts.append(_escape_min(str(d)))
    return "".join(parts)
