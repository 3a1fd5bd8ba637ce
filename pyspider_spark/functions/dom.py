"""P2 completion: arbitrary CSS-selector access over fetched HTML.

The reference exposes the whole document to handlers as a PyQuery DOM —
``response.doc('a[href]')``, ``doc('h1')``, ``doc('div.price span')``
(/root/reference/pyspider/libs/response.py:128-163, exercised all over
tests/test_response.py and tests/data_sample_handler.py). The crawl-
critical extractions (hrefs/srcs/title) stay on the JVM regex path
(functions/html.py); THIS module is the opt-in accessor for handlers that
query arbitrary selectors.

Execution shape: an Arrow-batched pandas UDF — one Python parse per
document per batch, never per-row Python UDF semantics. When lxml +
cssselect are installed the parse/select runs on them; this container has
neither, so the default engine is a clean-room stdlib implementation:
``html.parser`` builds a lightweight node tree and a small CSS subset
matcher evaluates selectors:

  - simple selectors: ``tag``, ``*``, ``.class``, ``#id``, ``[attr]``,
    ``[attr=value]`` / ``[attr="value"]``, and compounds (``a.big[href]``)
  - combinators: descendant (whitespace) and child (``>``)
  - selector groups: ``h1, h2``

That subset covers every selector the reference's own tests and sample
handlers use. The selector is parsed ONCE per column expression (it is a
literal), not per row.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

try:  # pragma: no cover - not present in this container
    import lxml.html  # type: ignore
    from lxml.cssselect import CSSSelector  # type: ignore

    _HAVE_LXML = True
except Exception:
    _HAVE_LXML = False

# elements that never take a closing tag — without this, <a> after an
# unclosed <img> would nest inside it and break child combinators
_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}

# elements a browser implicitly closes when the same tag reopens (the
# reference's own test page is a run of unclosed '<a href=..>text' lines —
# data_test_webpage.py — which lxml parses as siblings, not a nest)
_AUTO_CLOSE_SAME = {"a", "p", "li", "dt", "dd", "tr", "td", "th", "option"}


class _Node:
    __slots__ = ("tag", "attrs", "children", "parent", "texts")

    def __init__(self, tag: str, attrs: dict, parent: "_Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[_Node] = []
        self.parent = parent
        self.texts: list[str] = []  # direct text, interleaved order ignored

    def itertree(self):
        yield self
        for c in self.children:
            yield from c.itertree()

    def text(self) -> str:
        parts: list[str] = []

        def walk(n: "_Node"):
            parts.extend(n.texts)
            for c in n.children:
                walk(c)

        walk(self)
        return re.sub(r"\s+", " ", "".join(parts)).strip()


class _TreeBuilder(HTMLParser):
    """Forgiving tree builder: unknown tags are fine (the reference's
    test_response selects a custom <item> element), mis-nested close tags
    pop to the nearest matching ancestor like browsers do."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("", {}, None)
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        tag_l = tag.lower()
        if tag_l in _AUTO_CLOSE_SAME and self.cur.tag == tag_l:
            self.cur = self.cur.parent or self.cur
        node = _Node(tag.lower(), {k.lower(): (v or "") for k, v in attrs}, self.cur)
        self.cur.children.append(node)
        if tag.lower() not in _VOID:
            self.cur = node

    def handle_startendtag(self, tag, attrs):
        node = _Node(tag.lower(), {k.lower(): (v or "") for k, v in attrs}, self.cur)
        self.cur.children.append(node)

    def handle_endtag(self, tag):
        tag = tag.lower()
        n = self.cur
        while n is not None and n.tag != tag:
            n = n.parent
        if n is not None and n.parent is not None:
            self.cur = n.parent

    def handle_data(self, data):
        if data:
            self.cur.texts.append(data)


def _parse_html(html: str) -> _Node:
    tb = _TreeBuilder()
    try:
        tb.feed(html)
        tb.close()
    except Exception:
        pass  # parse what we got; a broken tail never fails the row
    return tb.root


# -- selector parsing ---------------------------------------------------------

_SIMPLE_RE = re.compile(
    r"""(?P<tag>[\w-]+|\*)?"""
    r"""(?P<rest>(?:[.#][\w-]+|\[[^\]]*\])*)$"""
)
_PART_RE = re.compile(r"""[.#][\w-]+|\[[^\]]*\]""")


def _parse_simple(s: str) -> tuple:
    m = _SIMPLE_RE.match(s)
    if not m or (not m.group("tag") and not m.group("rest")):
        raise ValueError(f"unsupported selector: {s!r}")
    tag = m.group("tag")
    tag = None if tag in (None, "*") else tag.lower()
    classes, node_id, attrs = [], None, []
    for part in _PART_RE.findall(m.group("rest") or ""):
        if part.startswith("."):
            classes.append(part[1:])
        elif part.startswith("#"):
            node_id = part[1:]
        else:  # [attr] or [attr=value]
            body = part[1:-1].strip()
            if "=" in body:
                name, _, val = body.partition("=")
                attrs.append((name.strip().lower(), val.strip().strip("'\"")))
            else:
                attrs.append((body.lower(), None))
    return (tag, node_id, tuple(classes), tuple(attrs))


def parse_selector(selector: str) -> list[list[tuple[str, tuple]]]:
    """'div.price > span, h1' → [[(' ', div.price), ('>', span)], [(' ', h1)]]
    (first combinator is always ' ' = anywhere in the tree)."""
    groups = []
    for alt in selector.split(","):
        alt = alt.strip()
        if not alt:
            continue
        toks = re.split(r"\s*(>)\s*|\s+", alt)
        chain: list[tuple[str, tuple]] = []
        comb = " "
        for tok in toks:
            if tok is None or tok == "":
                continue
            if tok == ">":
                comb = ">"
                continue
            chain.append((comb, _parse_simple(tok)))
            comb = " "
        if not chain:
            raise ValueError(f"unsupported selector: {selector!r}")
        groups.append(chain)
    if not groups:
        raise ValueError(f"unsupported selector: {selector!r}")
    return groups


def _match_simple(node: _Node, simple: tuple) -> bool:
    tag, node_id, classes, attrs = simple
    if node.tag == "":  # virtual root
        return False
    if tag is not None and node.tag != tag:
        return False
    if node_id is not None and node.attrs.get("id") != node_id:
        return False
    if classes:
        have = set((node.attrs.get("class") or "").split())
        if not all(c in have for c in classes):
            return False
    for name, val in attrs:
        if name not in node.attrs:
            return False
        if val is not None and node.attrs[name] != val:
            return False
    return True


def _chain_matches(node: _Node, chain: list) -> bool:
    """Does ``node`` match the full combinator chain ending at chain[-1]?"""
    comb, simple = chain[-1]
    if not _match_simple(node, simple):
        return False
    if len(chain) == 1:
        return True
    rest = chain[:-1]
    anc = node.parent
    if comb == ">":
        return anc is not None and _chain_matches(anc, rest)
    while anc is not None:
        if _chain_matches(anc, rest):
            return True
        anc = anc.parent
    return False


def select_nodes(root: _Node, parsed: list) -> list[_Node]:
    out, seen = [], set()
    for node in root.itertree():
        if id(node) in seen:
            continue
        for chain in parsed:
            if _chain_matches(node, chain):
                out.append(node)
                seen.add(id(node))
                break
    return out


# -- python-side API (shared by the UDFs and the tests) -----------------------

def doc_select_py(html: str, selector: str, attr: str | None = None) -> list[str]:
    """Pure-python evaluation: matched elements' text (or ``attr`` value;
    attr-less matches are skipped like PyQuery's .attr returning None)."""
    if html is None:
        return []
    parsed = parse_selector(selector)
    root = _parse_html(html)
    nodes = select_nodes(root, parsed)
    if attr is None:
        return [n.text() for n in nodes]
    return [n.attrs[attr] for n in nodes if attr in n.attrs]


# -- Spark column API ---------------------------------------------------------

def doc_select(html: Column, selector: str, attr: str | None = None) -> Column:
    """``response.doc(selector)`` analogue: array of matched elements'
    normalized text, or of ``attr`` values when ``attr`` is given.

    The selector parses once at expression-build time (invalid selectors
    fail at plan time, not per row); per batch the kernel parses each
    document once and evaluates all matches — Arrow in, Arrow out."""
    parsed = parse_selector(selector)  # fail fast on bad selectors

    if _HAVE_LXML:  # pragma: no cover - lxml absent in this container
        css = CSSSelector(selector)

        @pandas_udf("array<string>")
        def _kernel(s: pd.Series) -> pd.Series:
            def one(h):
                if h is None:
                    return []
                try:
                    doc = lxml.html.fromstring(h)
                except Exception:
                    return []
                nodes = css(doc)
                if attr is None:
                    return [
                        re.sub(r"\s+", " ", (n.text_content() or "")).strip()
                        for n in nodes
                    ]
                return [n.get(attr) for n in nodes if n.get(attr) is not None]

            return s.map(one)

        return _kernel(html)

    @pandas_udf("array<string>")
    def _kernel(s: pd.Series) -> pd.Series:
        def one(h):
            if h is None:
                return []
            nodes = select_nodes(_parse_html(h), parsed)
            if attr is None:
                return [n.text() for n in nodes]
            return [n.attrs[attr] for n in nodes if attr in n.attrs]

        return s.map(one)

    return _kernel(html)


def doc_select_first(html: Column, selector: str, attr: str | None = None) -> Column:
    """First match or NULL — the ``doc('title').text()`` shape."""
    return F.get(doc_select(html, selector, attr), 0)
