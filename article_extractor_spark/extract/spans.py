"""Span codec: DOM subtree ⇄ ordered interleaved text/media spans.

The engine's primary output (and the corpus input shape mandated by
BASELINE.json ``input_hint``) is an ordered sequence of spans::

    (kind: 'text'|'media', text, media_ref, offset)

Walking the selected article DOM in document order, text runs between
media elements become one ``text`` span each; every ``img`` becomes a
``media`` span carrying its src.  The reference's golden outputs
genuinely interleave text and images (e.g. martinfowler.com
humans-and-agents expected.html has 9 inline <img> between paragraphs),
and its fixture oracle compares normalized inner text
(test_fixture_corpus.py:28-35) — span equality is the same comparison
plus media refs and ordering.
"""

from __future__ import annotations

import html as html_mod
import re
from urllib.parse import urljoin

from ..dom.node import TEXT, Node
from ..dom.parser import parse_html

_RX_WS = re.compile(r"\s+")
_RX_SPACE_BEFORE_PUNCT = re.compile(r"\s+([,.;:!?])")
_SPACE_PUNCT = ((" ,", ","), (" .", "."), (" ;", ";"),
                (" :", ":"), (" !", "!"), (" ?", "?"))


def normalize_text(text: str) -> str:
    """The reference oracle's normalization (test_fixture_corpus.py:28-35):
    unescape entities, collapse whitespace, strip space before punctuation.

    Implemented with C-level str ops instead of the two obvious regex
    passes (profiling put them at ~8% of whole-document extraction):
    ``" ".join(text.split())`` is exactly ``\\s+``→" " + strip — the
    regex-``\\s`` and ``str.isspace`` character sets are identical over
    all of Unicode (exhaustively checked in tests) — and after that
    collapse every whitespace run before punctuation is a single ASCII
    space, so six non-overlapping ``str.replace`` passes reproduce the
    ``\\s+([,.;:!?])`` sub.  Differential-pinned against the regex
    reference in tests/test_extract_units.py."""
    text = " ".join(html_mod.unescape(text).split())
    for pat, rep in _SPACE_PUNCT:
        if pat in text:
            text = text.replace(pat, rep)
    return text


def make_span(kind: str, text: str, media_ref: str, offset: int) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def dom_to_spans(root: Node) -> list[dict]:
    """Document-order span decomposition of a DOM subtree.

    Text chunks accumulate (joined with single spaces, normalized) until
    an ``img`` is reached, which flushes the pending text span and emits
    a ``media`` span with ``media_ref = src``.
    """
    spans: list[dict] = []
    pending: list[str] = []

    def flush() -> None:
        if not pending:
            return
        text = normalize_text(" ".join(pending))
        pending.clear()
        if text:
            spans.append(make_span("text", text, "", len(spans)))

    # Iterative document-order walk (deep documents must not recurse).
    stack: list[Node] = (
        [root] if root.name in (TEXT, "img") else list(reversed(root.children))
    )
    while stack:
        node = stack.pop()
        if node.name == TEXT:
            if node.text and node.text.strip():
                pending.append(node.text.strip())
            continue
        if node.name == "img":
            src = str(node.attrs.get("src", "")).strip()
            if src:
                flush()
                spans.append(make_span("media", "", src, len(spans)))
            continue
        stack.extend(reversed(node.children))
    flush()
    return spans


def html_fragment_to_spans(fragment: str, base_url: str = "") -> list[dict]:
    """Span-decompose an HTML fragment (the golden expected.html oracle).

    ``base_url`` absolutizes img srcs so golden fragments with
    page-relative srcs compare equal to pipeline output, which has been
    through URL absolutization.
    """
    doc = parse_html(fragment)
    if base_url:
        for img in doc.query("img"):
            src = img.attrs.get("src")
            if src:
                img.attrs["src"] = urljoin(base_url, str(src))
    return dom_to_spans(doc)


def spans_to_html(spans: list[dict]) -> str:
    """Render a span sequence back to an HTML article fragment.

    Text spans may carry raw HTML markup (the synthetic corpus stores
    paragraph markup in text spans); media spans render as <img>.
    """
    parts: list[str] = []
    for span in sorted(spans, key=lambda s: s["offset"]):
        if span["kind"] == "media":
            ref = span.get("media_ref") or ""
            if ref:
                parts.append(f'<img src="{ref}" />')
        else:
            text = span.get("text") or ""
            if text:
                if "<" in text:
                    parts.append(text)
                else:
                    parts.append(f"<p>{text}</p>")
    return "\n".join(parts)
