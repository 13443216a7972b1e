"""DOM-tree main-content extraction (the Readability/boilerpipe family).

Parses HTML into a real element tree with the stdlib ``html.parser``
and segments it into text blocks at block-element boundaries, then
keeps blocks by DOM-level heuristics:

- subtree exclusion for structurally-negative tags (``nav``, ``aside``,
  ``footer``, ``header``, forms, scripts/styles),
- class/id hint words (``sidebar``, ``comment``, ``copyright``, ...)
  that mark a whole subtree boilerplate even when its text is wordy
  and link-free,
- per-block word floor and char-based link density, where anchor text
  is counted through the tree (``<a><span>x</span></a>`` counts), not
  by tag-regex.

This is the "DOM heuristics" leg of the extraction surface, next to
the expression-level block splitter in ``ops/webdoc.py`` (which stays
JVM-side but cannot see nesting, attributes containing ``>``, or
class hints). Pure Python per document — the Spark operator runs it
as an Arrow-batched ``mapInPandas`` kernel with no shuffle (each
document is independent), so the plan is a scan + one UDF stage that
scales linearly with executors at any corpus size.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# Tags whose subtree never contributes content text.
DROP_TAGS = frozenset({"script", "style", "noscript", "title", "template", "svg"})
# Structurally-boilerplate containers: their text survives parsing (so
# link-density stats stay honest) but their blocks are never kept.
NEGATIVE_TAGS = frozenset(
    {"nav", "aside", "footer", "header", "form", "button", "select", "option", "iframe"}
)
# Block-level boundaries: a new text block starts when one opens.
BLOCK_TAGS = frozenset(
    {
        "p", "div", "section", "article", "main", "body", "ul", "ol", "li",
        "table", "tr", "td", "th", "blockquote", "pre",
        "h1", "h2", "h3", "h4", "h5", "h6", "figure", "figcaption", "dl", "dt", "dd",
    }
)
# Elements that never take a closing tag (HTML5 void elements).
VOID_TAGS = frozenset(
    {"br", "img", "hr", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)

# Class/id hint words that mark a subtree boilerplate regardless of its
# text mass (the Readability "unlikely candidates" idea).
NEGATIVE_HINT_RE = re.compile(
    r"(?:^|[\s_-])(?:nav|menu|sidebar|footer|header|comment|comments|banner|"
    r"advert|ads?|promo|related|share|social|breadcrumbs?|copyright|masthead|"
    r"widget|cookie|popup|subscribe|newsletter)(?:$|[\s_-])",
    re.I,
)

# Same keep thresholds as the expression-level extractor, so the two
# legs agree on the jusText-style core rule.
MIN_BLOCK_WORDS = 4
MAX_LINK_DENSITY = 0.33


class _Node:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs):
        self.tag = tag
        self.attrs = dict(attrs)
        self.children: list = []  # str (text) or _Node


class _TreeBuilder(HTMLParser):
    """Tolerant tree builder: unmatched end tags are ignored; an end
    tag matching an open ancestor closes the intermediate elements
    (the stdlib parser does no tree repair itself)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#document", [])
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, attrs)
        self.stack[-1].children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(_Node(tag, attrs))

    def handle_endtag(self, tag):
        for depth in range(len(self.stack) - 1, 0, -1):
            if self.stack[depth].tag == tag:
                del self.stack[depth:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(html: str) -> _Node:
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


class TextBlock:
    """One block-bounded text segment with its DOM-derived features."""

    __slots__ = ("parts", "anchor_chars", "negative")

    def __init__(self, negative: bool):
        self.parts: list[str] = []
        self.anchor_chars = 0
        self.negative = negative

    @property
    def text(self) -> str:
        return " ".join(" ".join(self.parts).split())

    @property
    def link_density(self) -> float:
        t = self.text
        return self.anchor_chars / len(t) if t else 0.0

    @property
    def words(self) -> int:
        return len(self.text.split())


def _is_negative(node: _Node) -> bool:
    if node.tag in NEGATIVE_TAGS:
        return True
    hint = " ".join(
        v for k, v in node.attrs.items() if k in ("class", "id") and v
    )
    return bool(hint and NEGATIVE_HINT_RE.search(hint))


def text_blocks(root: _Node) -> list[TextBlock]:
    """Segment the tree into document-order text blocks. A block-level
    element opens a fresh block (inheriting the negative flag of its
    ancestors); inline elements accumulate into the enclosing block."""
    blocks: list[TextBlock] = []

    def open_block(negative: bool) -> TextBlock:
        b = TextBlock(negative)
        blocks.append(b)
        return b

    def walk(node: _Node, cur: TextBlock, negative: bool, in_anchor: bool):
        for child in node.children:
            if isinstance(child, str):
                collapsed = " ".join(child.split())
                if collapsed:
                    cur.parts.append(collapsed)
                    if in_anchor:
                        cur.anchor_chars += len(collapsed)
                continue
            if child.tag in DROP_TAGS:
                continue
            child_neg = negative or _is_negative(child)
            if child.tag in BLOCK_TAGS or child.tag in NEGATIVE_TAGS:
                inner = open_block(child_neg)
                walk(child, inner, child_neg, in_anchor)
                # Content after the block continues in a new block, so
                # trailing inline text never merges into the element.
                cur = open_block(negative)
            else:
                walk(child, cur, child_neg, in_anchor or child.tag == "a")

    walk(root, open_block(False), False, False)
    return [b for b in blocks if b.text]


def keep_block(b: TextBlock) -> bool:
    return (
        not b.negative
        and b.words >= MIN_BLOCK_WORDS
        and b.link_density <= MAX_LINK_DENSITY
    )


def extract_main_content(html: str) -> str:
    """Main text of an HTML document: parse, segment, score, rejoin in
    document order."""
    kept = [b.text for b in text_blocks(parse_html(html)) if keep_block(b)]
    return " ".join(kept)


# ---------------------------------------------------------------------------
# Structured-metadata extraction: the head-side complement of main-content
# extraction. A training-data pipeline wants (title, language, canonical
# URL, publication date, summary) alongside the body text — for dedup
# keys (canonical URL), temporal filtering (published), and
# language routing — without a second parse, so this walks the same
# tolerant tree.

_META_NAME_KEYS = {"description"}
_META_PROP_KEYS = {"og:title", "og:description", "article:published_time"}


def _node_text(node: _Node) -> str:
    parts: list[str] = []

    def walk(n: _Node):
        for c in n.children:
            if isinstance(c, str):
                parts.append(c)
            else:
                walk(c)

    walk(node)
    return " ".join(" ".join(parts).split())


def extract_metadata(html: str) -> dict:
    """Structured metadata of an HTML document as a flat dict (missing
    fields are None): ``title`` (<title>), ``lang`` (html[lang]),
    ``description`` (meta[name=description]), ``og_title`` /
    ``og_description`` / ``published`` (OpenGraph / article:* meta
    properties), ``canonical_url`` (link[rel=canonical]), and from the
    first JSON-LD block: ``jsonld_type`` / ``jsonld_headline``.
    Malformed JSON-LD is ignored, never fatal — crawl corpora are full
    of it."""
    import json as _json

    root = parse_html(html)
    out: dict = {
        "title": None,
        "lang": None,
        "description": None,
        "og_title": None,
        "og_description": None,
        "published": None,
        "canonical_url": None,
        "jsonld_type": None,
        "jsonld_headline": None,
    }

    def walk(node: _Node):
        for child in node.children:
            if isinstance(child, str):
                continue
            tag, attrs = child.tag, child.attrs
            if tag == "html" and out["lang"] is None and attrs.get("lang"):
                out["lang"] = attrs["lang"]
            elif tag == "title" and out["title"] is None:
                out["title"] = _node_text(child) or None
            elif tag == "meta":
                content = attrs.get("content")
                if content is None:
                    pass
                elif attrs.get("name") in _META_NAME_KEYS:
                    out.setdefault("description", None)
                    if out["description"] is None:
                        out["description"] = content
                elif attrs.get("property") in _META_PROP_KEYS:
                    key = {
                        "og:title": "og_title",
                        "og:description": "og_description",
                        "article:published_time": "published",
                    }[attrs["property"]]
                    if out[key] is None:
                        out[key] = content
            elif tag == "link":
                rels = (attrs.get("rel") or "").split()
                if "canonical" in rels and out["canonical_url"] is None:
                    out["canonical_url"] = attrs.get("href")
            elif tag == "script" and attrs.get("type") == "application/ld+json":
                if out["jsonld_type"] is None:
                    raw = "".join(c for c in child.children if isinstance(c, str))
                    try:
                        data = _json.loads(raw)
                    except (ValueError, TypeError):
                        data = None
                    if isinstance(data, list) and data:
                        data = data[0]
                    if isinstance(data, dict):
                        t = data.get("@type")
                        out["jsonld_type"] = t if isinstance(t, str) else None
                        h = data.get("headline")
                        out["jsonld_headline"] = h if isinstance(h, str) else None
            walk(child)

    walk(root)
    return out
