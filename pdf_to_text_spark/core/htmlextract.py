"""Deterministic HTML main-content extraction (stdlib-only).

Readability/jusText-style boilerplate strip per the north rule: build a
block segmentation from the DOM event stream, score each block by text
length and link density, keep content blocks, drop chrome. This is the
capability the reference approximates with LLM cleanup
(``/root/reference/2_OpenCV_OCR/gemini_processing.py:14-48``) —
re-specified as a deterministic local algorithm.

Frozen spec v1 (tests pin it; goldens derive from it):
- parse with html.parser; text inside script/style/noscript/template/
  svg/head is ignored
- block boundaries at the usual block-level tags; <br> is a newline
  inside the current block
- per block: raw_text (node text concatenated verbatim), link_chars
  (chars emitted while inside <a>)
- link_density = link_chars / max(1, len(collapsed_text))
- keep a heading block (h1..h6) if collapsed length ≥ 3 and
  link_density < 0.2
- keep any other block if collapsed length ≥ 25 and link_density ≤ 1/3
- output = kept blocks' RAW text (per-block strip of outer whitespace
  only), joined by "\n\n" — all further normalization happens in the
  Catalyst expression chain (functions/text.py), NOT here
- bytes entry point (round-5): strict UTF-8 → declared meta charset
  (WHATWG latin-1→cp1252 aliasing) → cp1252 → UTF-8-replace; UTF-16
  (BOM-leading) never reaches here — the frozen router sniff admits
  only '<'-leading payloads
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_SKIP_TAGS = {"script", "style", "noscript", "template", "svg", "head"}
_BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "td", "th", "tr", "table", "thead", "tbody", "section", "article",
    "main", "header", "footer", "nav", "aside", "blockquote", "pre",
    "hr", "title", "figure", "figcaption", "dl", "dt", "dd", "form",
    "body", "html",
}
_HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}
_WS = re.compile(r"\s+")

MIN_BLOCK_CHARS = 25
MIN_HEADING_CHARS = 3
MAX_LINK_DENSITY = 1.0 / 3.0
MAX_HEADING_LINK_DENSITY = 0.2


class _Block:
    __slots__ = ("parts", "link_chars", "tag")

    def __init__(self, tag: str) -> None:
        self.parts: list[str] = []
        self.link_chars = 0
        self.tag = tag

    @property
    def raw(self) -> str:
        return "".join(self.parts)


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._cur = _Block("")
        self._skip_depth = 0
        self._a_depth = 0

    def _flush(self, next_tag: str) -> None:
        if self._cur.raw.strip():
            self.blocks.append(self._cur)
        self._cur = _Block(next_tag)

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag == "a":
            self._a_depth += 1
        elif tag == "br":
            self._cur.parts.append("\n")
        elif tag in _BLOCK_TAGS:
            self._flush(tag)

    def handle_startendtag(self, tag, attrs):
        if tag == "br":
            self._cur.parts.append("\n")
        elif tag == "hr":
            self._flush("")

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        elif tag in _BLOCK_TAGS:
            self._flush("")

    def handle_data(self, data):
        if self._skip_depth or not data:
            return
        self._cur.parts.append(data)
        if self._a_depth:
            self._cur.link_chars += len(data.strip())

    def close(self):
        super().close()
        self._flush("")


def _keep(block: _Block) -> bool:
    collapsed = _WS.sub(" ", block.raw).strip()
    n = len(collapsed)
    density = block.link_chars / max(1, n)
    if block.tag in _HEADING_TAGS:
        return n >= MIN_HEADING_CHARS and density < MAX_HEADING_LINK_DENSITY
    return n >= MIN_BLOCK_CHARS and density <= MAX_LINK_DENSITY


def extract_main_content(html: str) -> str:
    """HTML string → raw main-content blocks joined by blank lines."""
    p = _Extractor()
    p.feed(html)
    p.close()
    return "\n\n".join(b.raw.strip() for b in p.blocks if _keep(b))


# ---------------------------------------------------- charset handling

_META_CHARSET_RE = re.compile(
    rb"<meta[^>]+charset\s*=\s*[\"']?\s*([A-Za-z0-9_\-]+)", re.I
)


def detect_charset(data: bytes) -> str:
    """Charset of an HTML payload that is NOT valid UTF-8: the
    ``<meta charset=…>`` / ``http-equiv`` declaration in the first 2 KB
    (both forms end in ``charset=NAME``, one regex serves), else
    windows-1252 — the de-facto web fallback that supersedes latin-1
    (WHATWG encoding spec maps ISO-8859-1 labels to it) and never
    raises on any byte."""
    m = _META_CHARSET_RE.search(data[:2048])
    if m is not None:
        import codecs

        label = m.group(1).decode("ascii", "replace").lower()
        # WHATWG: latin-1 labels mean windows-1252 on the real web
        if label in ("iso-8859-1", "latin-1", "latin1", "ascii", "us-ascii"):
            return "windows-1252"
        try:
            codecs.lookup(label)
            return label
        except LookupError:
            pass
    return "windows-1252"


def extract_main_content_bytes(data: bytes) -> str:
    """Charset-aware entry point (round-5 widening for crawl realism):
    strict UTF-8 first — the dominant modern web, and pure-ASCII pages
    are identical under every candidate — then the declared meta
    charset, then windows-1252, then UTF-8-with-replacement as the
    never-fails floor. UTF-16 pages (BOM-leading) never reach here:
    the frozen byte sniff routes only ``<``-leading payloads."""
    try:
        return extract_main_content(data.decode("utf-8"))
    except UnicodeDecodeError:
        pass
    try:
        return extract_main_content(data.decode(detect_charset(data)))
    except (UnicodeDecodeError, LookupError):
        return extract_main_content(data.decode("utf-8", errors="replace"))
