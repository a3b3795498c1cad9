"""Readability-style HTML main-content extraction on the stdlib parser.

This is the capability the north_star adds on top of the reference (which has
no HTML path): a deterministic DOM boilerplate stripper using text-density +
link-density scoring with tag/class blocklists, producing ``extracted_text``
plus character-span lineage, and table extraction from ``<table>`` markup
(HTML counterpart of the reference's coordinate table extractor,
reference services/coordinate_table_extractor.py:20-61).

Contract (frozen; golden tests compare byte-for-byte):
- blocks are emitted in document order, joined by ``"\\n\\n"``
- a block's text is its own text content with whitespace runs collapsed to a
  single space and stripped at both ends
- blocked subtrees (BLOCK_TAGS / BLOCK_CLASS_RE on class or id) emit nothing
- a block is kept iff it is a heading (h1-h6) with non-empty text, or a text
  block with >= MIN_TEXT_CHARS chars and link density <= MAX_LINK_DENSITY
- if one or more <main>/<article> containers exist, only content inside them
  is considered (earliest such container wins for nesting)
- spans record (start, end, kind) into extracted_text per emitted block,
  kind = the block's tag

State (compiled regex, tag sets) is held by :class:`HtmlMainContentExtractor`,
built once per actor in the parse stage (SURVEY.md §2.3 A1 mapping).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Any, Optional

MIN_TEXT_CHARS = 25
MAX_LINK_DENSITY = 1.0 / 3.0
BLOCK_JOIN = "\n\n"

# Subtrees that never contribute content.
BLOCK_TAGS = frozenset([
    "script", "style", "noscript", "template", "svg", "iframe", "head",
    "nav", "header", "footer", "aside", "form", "button", "select", "option",
])
# Elements that delimit text blocks.
PARA_TAGS = frozenset([
    "p", "li", "pre", "blockquote", "td", "th", "caption", "dd", "dt",
    "figcaption", "summary",
])
HEADING_TAGS = frozenset(["h1", "h2", "h3", "h4", "h5", "h6"])
CONTAINER_TAGS = frozenset(["main", "article"])
VOID_TAGS = frozenset([
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
])

BLOCK_CLASS_RE = re.compile(
    r"(?:^|[\s_-])(?:nav|menu|sidebar|side-bar|footer|header|comment|comments|"
    r"promo|ad|ads|advert|advertisement|social|share|sharing|widget|"
    r"breadcrumb|banner|cookie|popup|modal|related|pagination|pager|"
    r"disqus|masthead|meta)(?:$|[\s_-])", re.IGNORECASE)

_WS_RE = re.compile(r"\s+")


class _Node:
    __slots__ = ("tag", "blocked", "parent", "texts", "link_chars")

    def __init__(self, tag: str, blocked: bool, parent: Optional["_Node"]):
        self.tag = tag
        self.blocked = blocked
        self.parent = parent
        self.texts: list[str] = []
        self.link_chars = 0


class _PageParser(HTMLParser):
    """ONE streaming pass producing both main-content blocks and <table>
    structures (content scoring and table capture are independent state
    machines fed by the same tag events — a second parse of the document
    would double the dominant cost of the stage).

    Content side: an open-element stack; text accumulates into the nearest
    open paragraph/heading block; closing a block scores and (maybe) emits it.
    Table side: first <th> (or first) row -> headers, remaining rows padded/
    truncated to the header width; captures inside blocked subtrees too
    (tables are structural data, not boilerplate text)."""

    def __init__(self, min_text_chars: int = MIN_TEXT_CHARS,
                 max_link_density: float = MAX_LINK_DENSITY) -> None:
        super().__init__(convert_charrefs=True)
        self.min_text_chars = min_text_chars
        self.max_link_density = max_link_density
        self.stack: list[_Node] = []
        self.blocks: list[tuple[str, str]] = []  # (tag, text)
        self.block_depth = 0          # depth of blocked subtree
        self.link_depth = 0           # depth inside <a>
        self.container_seen = False   # any <main>/<article> encountered
        self.container_depth = 0
        self.blocks_in_container: list[tuple[str, str]] = []
        # table state
        self.tables: list[dict[str, Any]] = []
        self._in_table = 0
        self._trows: list[list[str]] = []
        self._trow: Optional[list[str]] = None
        self._cell: Optional[list[str]] = None
        self._caption: Optional[list[str]] = None
        self._header_row: Optional[list[str]] = None
        self._row_is_header = False

    # -- table sub-machine ---------------------------------------------------
    def _table_starttag(self, tag: str) -> None:
        if tag == "table":
            self._in_table += 1
            if self._in_table == 1:
                self._trows, self._header_row, self._caption = [], None, None
        elif self._in_table:
            if tag == "tr":
                self._trow, self._row_is_header = [], False
            elif tag in ("td", "th"):
                self._cell = []
                if tag == "th":
                    self._row_is_header = True
            elif tag == "caption":
                self._caption = []

    def _table_endtag(self, tag: str) -> None:
        if not self._in_table:
            return
        if tag in ("td", "th") and self._cell is not None and self._trow is not None:
            self._trow.append(_WS_RE.sub(" ", "".join(self._cell)).strip())
            self._cell = None
        elif tag == "tr" and self._trow is not None:
            if self._row_is_header and self._header_row is None:
                self._header_row = self._trow
            else:
                self._trows.append(self._trow)
            self._trow = None
        elif tag == "table":
            self._in_table -= 1
            if self._in_table == 0:
                headers = self._header_row
                if headers is None and self._trows:
                    headers = self._trows.pop(0)
                if headers:
                    ncol = len(headers)
                    rows = [(r + [None] * ncol)[:ncol] for r in self._trows]
                    name = (_WS_RE.sub(" ", "".join(self._caption)).strip()
                            if self._caption else f"table_{len(self.tables) + 1}")
                    self.tables.append({"table_name": name, "headers": headers,
                                        "rows": rows})

    # -- tag events ---------------------------------------------------------
    def handle_starttag(self, tag: str, attrs: list[tuple[str, Optional[str]]]) -> None:
        self._table_starttag(tag)
        if tag in VOID_TAGS:
            if tag == "br" and self.stack:
                self.stack[-1].texts.append(" ")
            return
        blocked = self.block_depth > 0 or tag in BLOCK_TAGS
        if not blocked:
            attrd = dict(attrs)
            marker = " ".join(filter(None, [attrd.get("class"), attrd.get("id")]))
            if marker and BLOCK_CLASS_RE.search(marker):
                blocked = True
        if blocked:
            self.block_depth += 1
        if tag in CONTAINER_TAGS and not blocked:
            self.container_seen = True
            self.container_depth += 1
        if tag == "a":
            self.link_depth += 1
        parent = self.stack[-1] if self.stack else None
        self.stack.append(_Node(tag, blocked, parent))

    def handle_endtag(self, tag: str) -> None:
        self._table_endtag(tag)
        if tag in VOID_TAGS:
            return
        # pop until the matching open tag (tolerates malformed nesting)
        idx = None
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i].tag == tag:
                idx = i
                break
        if idx is None:
            return
        while len(self.stack) > idx:
            self._close_node(self.stack.pop())

    def handle_data(self, data: str) -> None:
        if self._cell is not None:
            self._cell.append(data)
        elif self._caption is not None:
            self._caption.append(data)
        if self.block_depth > 0 or not data:
            return
        if self.stack:
            self.stack[-1].texts.append(data)
            if self.link_depth > 0:
                self.stack[-1].link_chars += len(data.strip())

    # -- close / emit -------------------------------------------------------
    def _close_node(self, node: _Node) -> None:
        if node.tag == "a":
            self.link_depth = max(0, self.link_depth - 1)
        if node.blocked:
            self.block_depth = max(0, self.block_depth - 1)
            return
        own = "".join(node.texts)
        if node.tag in PARA_TAGS or node.tag in HEADING_TAGS:
            text = _WS_RE.sub(" ", own).strip()
            if text:
                total = len(text)
                density = node.link_chars / total if total else 1.0
                keep = (node.tag in HEADING_TAGS
                        or (total >= self.min_text_chars
                            and density <= self.max_link_density))
                if keep:
                    target = (self.blocks_in_container
                              if self.container_depth > 0 else self.blocks)
                    target.append((node.tag, text))
            # consumed — do not propagate to the parent
        else:
            if node.parent is not None:
                node.parent.texts.append(own)
                node.parent.link_chars += node.link_chars
            if node.tag in CONTAINER_TAGS:
                self.container_depth = max(0, self.container_depth - 1)

    def close(self) -> None:  # flush any still-open elements
        super().close()
        while self.stack:
            self._close_node(self.stack.pop())


# ---------------------------------------------------------------------------
# Fast tag scanner. Python's stdlib HTMLParser dominates the whole parse
# stage (~75% of flagship wall time in profile: goahead/parse_starttag/
# updatepos bookkeeping). This scanner drives the SAME _PageParser event
# interface (handle_starttag / handle_endtag / handle_data) over one regex
# pass, reproducing the stdlib's observable event semantics (catalogued by
# direct experiment and pinned by the differential tests in
# tests/test_html_fast_scanner.py): lowercased tag names, lowercased attr
# names with unescaped values, charref-decoded text, raw script/style
# content with a case-insensitive terminator, '<'-as-text for non-tags,
# self-closing -> start+end. The stdlib's TOLERANT tag grammar is weird in
# ways not worth replicating (a tag can be named 'beta<b'; a quoted '>' can
# turn the whole candidate tag into text), so the scanner claims only CLEAN
# constructs: anything outside them raises _FallbackNeeded and extract()
# reruns the whole document through the stdlib parser. On real corpora the
# fallback is the rare path; on junk it preserves exact stdlib behavior.
# ---------------------------------------------------------------------------


class _FallbackNeeded(Exception):
    """Construct outside the fast scanner's clean-markup grammar."""

_STARTTAG_RE = re.compile(
    r'<(?P<name>[a-zA-Z][-.a-zA-Z0-9:_]*)'
    r'(?P<attrs>(?:\s+[^\s/>][^\s/=>]*(?:\s*=\s*(?:"[^"]*"|\'[^\']*\'|[^\s>]*))?)*)'
    r'\s*(?P<slash>/?)>')
_ENDTAG_RE = re.compile(r'</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)[^>]*>')
_ATTR_RE = re.compile(
    r'([^\s/>][^\s/=>]*)(?:\s*=\s*("[^"]*"|\'[^\']*\'|[^\s>]*))?')
_RAWTEXT_END = {
    "script": re.compile(r'</\s*script(?=[\s>/])', re.IGNORECASE),
    "style": re.compile(r'</\s*style(?=[\s>/])', re.IGNORECASE),
}
# stdlib comment grammar: minimal body then '--', optional whitespace, '>'
# ('<!--x-- >' closes, '<!-->' does NOT — it degrades to literal text)
_COMMENT_RE = re.compile(r"<!--.*?--\s*>", re.DOTALL)


def _fast_feed(html: str, handler: "_PageParser") -> None:
    """One-pass event scan; raises on nothing (junk degrades to text)."""
    from html import unescape

    emit_data = handler.handle_data
    pos = 0
    n = len(html)
    find = html.find
    while True:
        lt = find("<", pos)
        if lt < 0:
            if pos < n:
                text = html[pos:]
                emit_data(unescape(text) if "&" in text else text)
            return
        if lt > pos:
            text = html[pos:lt]
            emit_data(unescape(text) if "&" in text else text)
        head = html[lt + 1:lt + 2]
        if head == "!":
            if html.startswith("<!--", lt):
                m = _COMMENT_RE.match(html, lt)
                if m is not None:
                    pos = m.end()
                else:  # unterminated / degenerate: '<' degrades to text
                    emit_data("<")
                    pos = lt + 1
            elif html.startswith("<![", lt):
                # marked section ('<![CDATA[..]]>', '<![if ..]>'): stdlib
                # terminates at ']]>' not the first '>' — rare construct,
                # the stdlib fallback is cheap and keeps exact parity
                raise _FallbackNeeded(html[lt:lt + 20])
            else:  # doctype / declaration
                end = find(">", lt)
                pos = end + 1 if end >= 0 else n
        elif head == "?":
            end = find(">", lt)
            pos = end + 1 if end >= 0 else n
        elif head == "/":
            m = _ENDTAG_RE.match(html, lt)
            if m is None:
                gt = find(">", lt)
                if gt >= 0:  # stdlib: '</>' / '</ >' / '</3>' swallowed
                    pos = gt + 1
                else:  # '</' at EOF: '<' then '/' degrade to text
                    emit_data("<")
                    pos = lt + 1
            else:
                handler.handle_endtag(m.group(1).lower())
                pos = m.end()
        else:
            if not head.isalpha():
                # stdlib: '<' before a non-letter is literal text
                emit_data("<")
                pos = lt + 1
                continue
            m = _STARTTAG_RE.match(html, lt)
            if m is None:
                # '<name' followed by something the clean grammar rejects
                # (stdlib would tolerate e.g. '<' inside the tag NAME) —
                # only the stdlib parser reproduces that behavior
                raise _FallbackNeeded(html[lt:lt + 20])
            name = m.group("name").lower()
            raw_attrs = m.group("attrs")
            attrs = []
            if raw_attrs:
                for am in _ATTR_RE.finditer(raw_attrs):
                    val = am.group(2)
                    if val is not None:
                        if val[:1] in "\"'":
                            if val[-1:] != val[:1] or len(val) < 2:
                                raise _FallbackNeeded(val[:20])
                            val = val[1:-1]
                        elif '"' in val or "'" in val:
                            # unquoted value holding a quote: the stdlib can
                            # demote the entire candidate tag to text here
                            raise _FallbackNeeded(val[:20])
                        if "&" in val:
                            val = unescape(val)
                    attrs.append((am.group(1).lower(), val))
            handler.handle_starttag(name, attrs)
            pos = m.end()
            if m.group("slash"):
                handler.handle_endtag(name)
            elif name in _RAWTEXT_END:
                m2 = _RAWTEXT_END[name].search(html, pos)
                if m2 is None:  # unterminated raw text: swallow to EOF
                    if pos < n:
                        emit_data(html[pos:])
                    return
                if m2.start() > pos:
                    emit_data(html[pos:m2.start()])  # raw: no charref decode
                m3 = _ENDTAG_RE.match(html, m2.start())
                handler.handle_endtag(name)
                pos = m3.end() if m3 is not None else m2.end()


class HtmlMainContentExtractor:
    """Warmed-state extractor: compile-once config, called per document.

    Returns ``{"extracted_text", "spans", "blocks", "tables"}`` where spans
    are (start, end, kind) offsets into extracted_text.
    """

    def __init__(self, min_text_chars: int = MIN_TEXT_CHARS,
                 max_link_density: float = MAX_LINK_DENSITY):
        self.min_text_chars = min_text_chars
        self.max_link_density = max_link_density

    def extract(self, html: str) -> dict[str, Any]:
        parser = _PageParser(self.min_text_chars, self.max_link_density)
        try:
            _fast_feed(html, parser)
            parser.close()
        except Exception:
            # fallback: the battle-tested stdlib tokenizer, fresh state
            parser = _PageParser(self.min_text_chars, self.max_link_density)
            try:
                parser.feed(html)
                parser.close()
            except Exception:
                pass  # malformed markup: keep whatever was emitted
        blocks = (parser.blocks_in_container
                  if parser.container_seen and parser.blocks_in_container
                  else parser.blocks)
        pieces: list[str] = []
        spans: list[dict[str, Any]] = []
        pos = 0
        for tag, text in blocks:
            if pieces:
                pos += len(BLOCK_JOIN)
            pieces.append(text)
            spans.append({"start": pos, "end": pos + len(text), "kind": tag})
            pos += len(text)
        return {"extracted_text": BLOCK_JOIN.join(pieces), "spans": spans,
                "blocks": blocks, "tables": parser.tables}


def extract_main_content(html: str) -> dict[str, Any]:
    """One-shot convenience wrapper (tests / small scripts)."""
    return HtmlMainContentExtractor().extract(html)
