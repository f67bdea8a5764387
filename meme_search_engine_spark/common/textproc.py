"""HTML -> text extraction and tokenization.

These are the engine's analogues of the reference's per-row media
transforms: extraction replaces image-resize-for-embed
(/root/reference/src/common.rs:31-59) and tokenization replaces the
SQLite FTS5 ``unicode61 remove_diacritics 2`` tokenizer that backs the
reference's only true full-text index (/root/reference/mse.py:144-157).

Everything here is pure, deterministic, stdlib-only Python.  The exact
same functions run inside vectorized Arrow UDFs on executors *and*
inside the pytest oracle on the driver, which is what makes the
"byte-identical extracted text per url" invariant checkable.
"""

from __future__ import annotations

import re
import unicodedata
from html.parser import HTMLParser

# Tags whose text content is never part of the extracted document text:
# non-visible machinery (script/style/head) plus boilerplate page chrome
# (nav/header/footer/aside) per the Common-Crawl-style extraction contract.
_SKIP_CONTENT_TAGS = frozenset(
    {
        "script", "style", "noscript", "template", "svg", "head", "title",
        "nav", "footer", "header", "aside",
    }
)
# Tags that introduce a word boundary (block-level / line-breaking).
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5",
        "h6", "tr", "td", "th", "table", "section", "article", "nav",
        "footer", "header", "blockquote", "pre", "hr", "form", "aside",
        "main", "figure", "figcaption", "dt", "dd", "dl", "body",
    }
)

_WS_RE = re.compile(r"\s+")


class _TextExtractor(HTMLParser):
    """Collect visible text; entities are decoded by HTMLParser
    (convert_charrefs=True is the default)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._chunks: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_CONTENT_TAGS:
            self._skip_depth += 1
        if tag in _BLOCK_TAGS:
            self._chunks.append(" ")

    def handle_endtag(self, tag):
        if tag in _SKIP_CONTENT_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1
        if tag in _BLOCK_TAGS:
            self._chunks.append(" ")

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK_TAGS:
            self._chunks.append(" ")

    def handle_data(self, data):
        if self._skip_depth == 0:
            self._chunks.append(data)

    def text(self) -> str:
        return _WS_RE.sub(" ", "".join(self._chunks)).strip()


def extract_text(html: bytes | str) -> str:
    """Deterministic HTML -> visible-text extraction.

    Strips script/style/head/etc. content, decodes entities, collapses
    all whitespace runs to a single space, and strips the ends.  The
    per-row invariant (BASELINE.json input_hint): for a given url this
    must be byte-identical between the Spark UDF and the oracle —
    guaranteed because both import THIS function.
    """
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _TextExtractor()
    p.feed(html)
    p.close()
    return p.text()


def normalize_text(text: str) -> str:
    """Unicode fold: NFKD-decompose, drop combining marks (diacritics),
    drop non-ASCII remainder, lowercase.

    Models FTS5 ``unicode61 remove_diacritics 2`` (reference
    mse.py:148).  Equivalent to DuckDB ``lower(strip_accents(text))``
    for Latin-script input, which is what lets the driver's DuckDB
    oracle reproduce our tokenization in pure SQL.
    """
    decomposed = unicodedata.normalize("NFKD", text)
    stripped = decomposed.encode("ascii", "ignore").decode("ascii")
    return stripped.lower()


_TOKEN_SPLIT_RE = re.compile(r"[^a-z0-9]+")


def tokenize(text: str) -> list[str]:
    """normalize -> split on non-alphanumeric runs -> drop empties.

    SQL-equivalent (DuckDB / Spark SQL):
      ``regexp_split_to_array(lower(strip_accents(text)), '[^a-z0-9]+')``
    with empty strings filtered — used verbatim by the oracle_sql side
    of the correctness gate.
    """
    return [t for t in _TOKEN_SPLIT_RE.split(normalize_text(text)) if t]
