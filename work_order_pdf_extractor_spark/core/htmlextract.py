"""Boilerpipe-style main-content extraction for HTML payloads.

The reference has no HTML path; the north rule mandates one (main-content
extraction with boilerplate stripping via text-density + link-density block
classification — the approach published in Kohlschütter et al.,
"Boilerplate Detection using Shallow Text Features", WSDM 2010).

Deterministic, stdlib-only (html.parser). Blocks are segmented at
block-level tag boundaries; each block gets

- ``n_words``     — whitespace-token count,
- ``link_density`` — fraction of characters inside ``<a>`` elements,
- ``text_density`` — words per wrapped line of 80 chars (Kohlschütter's
  proxy for visual density).

Classification rule (fixed; the fixture generator in ``fixtures.py``
constructs pages whose ground-truth main content is exactly what this rule
recovers, so golden equality is meaningful):

    content  ⇔  link_density < 0.33  AND  n_words >= 8
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

BLOCK_TAGS = {
    "p", "div", "li", "h1", "h2", "h3", "h4", "h5", "h6", "td", "th",
    "section", "article", "header", "footer", "nav", "aside", "ul", "ol",
    "table", "tr", "blockquote", "pre", "br", "body", "html",
}
SKIP_TAGS = {"script", "style", "noscript", "template"}

LINK_DENSITY_MAX = 0.33
MIN_CONTENT_WORDS = 8


class _BlockCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self._text: list[str] = []
        self._link_chars = 0
        self._total_chars = 0
        self._a_depth = 0
        self._skip_depth = 0

    def _flush(self) -> None:
        raw = " ".join("".join(self._text).split())
        if raw:
            self.blocks.append(
                {
                    "text": raw,
                    "n_words": len(raw.split()),
                    "link_chars": self._link_chars,
                    "total_chars": self._total_chars,
                }
            )
        self._text = []
        self._link_chars = 0
        self._total_chars = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag in BLOCK_TAGS:
            self._flush()
        if tag == "a":
            self._a_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in BLOCK_TAGS:
            self._flush()
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        self._text.append(data)
        n = len(data)
        self._total_chars += n
        if self._a_depth:
            self._link_chars += n

    def close(self) -> None:  # final partial block
        super().close()
        self._flush()


def _finalize(blocks: list[dict]) -> list[dict]:
    out = []
    for b in blocks:
        ld = (b["link_chars"] / b["total_chars"]) if b["total_chars"] else 0.0
        td = b["n_words"] / max(1, -(-len(b["text"]) // 80))  # words per 80-char line
        out.append(
            {
                "text": b["text"],
                "n_words": b["n_words"],
                "link_density": ld,
                "text_density": td,
            }
        )
    return out


def segment_blocks_htmlparser(html: str) -> list[dict]:
    """Reference implementation on stdlib HTMLParser — kept as the
    differential-test twin of the fast scanner below."""
    p = _BlockCollector()
    p.feed(html)
    p.close()
    return _finalize(p.blocks)


import html as _htmlmod  # noqa: E402

_MARKUP_RE = re.compile(
    r"<!--.*?-->|<!(?:[^>]*)>|<(/?)([a-zA-Z][a-zA-Z0-9]*)(?:\s[^>]*?)?(/?)>",
    re.DOTALL,
)


def segment_blocks(html: str) -> list[dict]:
    """Segment HTML into text blocks with link/word statistics.

    Regex-scanner implementation (≈3x the stdlib-HTMLParser speed; the
    slow twin stays as :func:`segment_blocks_htmlparser` and a
    differential test keeps the two identical on the supported HTML
    subset). Semantics: block-level tags flush the current block;
    script/style/noscript/template content is skipped; link characters are
    counted inside ``<a>``; character references are resolved.
    """
    blocks: list[dict] = []
    text_parts: list[str] = []
    link_chars = 0
    total_chars = 0
    a_depth = 0
    skip_depth = 0

    def flush() -> None:
        nonlocal text_parts, link_chars, total_chars
        raw = " ".join("".join(text_parts).split())
        if raw:
            blocks.append(
                {
                    "text": raw,
                    "n_words": len(raw.split()),
                    "link_chars": link_chars,
                    "total_chars": total_chars,
                }
            )
        text_parts = []
        link_chars = 0
        total_chars = 0

    pos = 0
    for m in _MARKUP_RE.finditer(html):
        if m.start() > pos and not skip_depth:
            data = html[pos : m.start()]
            if "&" in data:
                data = _htmlmod.unescape(data)
            text_parts.append(data)
            n = len(data)
            total_chars += n
            if a_depth:
                link_chars += n
        pos = m.end()
        tag = m.group(2)
        if tag is None:  # comment / doctype
            continue
        tag = tag.lower()
        closing = m.group(1) == "/"
        if tag in SKIP_TAGS:
            skip_depth = max(0, skip_depth - 1) if closing else skip_depth + 1
            continue
        if tag in BLOCK_TAGS:
            flush()
        if tag == "a":
            a_depth = max(0, a_depth - 1) if closing else a_depth + 1
    if pos < len(html) and not skip_depth:
        data = html[pos:]
        if "&" in data:
            data = _htmlmod.unescape(data)
        text_parts.append(data)
        n = len(data)
        total_chars += n
        if a_depth:
            link_chars += n
    flush()
    return _finalize(blocks)


def classify_blocks(blocks: list[dict]) -> list[bool]:
    """Apply the fixed content rule to each block."""
    return [
        b["link_density"] < LINK_DENSITY_MAX and b["n_words"] >= MIN_CONTENT_WORDS
        for b in blocks
    ]


def extract_main_text(html: str) -> str:
    """Canonical main content: content blocks joined with '\\n'."""
    blocks = segment_blocks(html)
    keep = classify_blocks(blocks)
    return "\n".join(b["text"] for b, k in zip(blocks, keep) if k)
