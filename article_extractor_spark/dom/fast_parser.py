"""Fast HTML tokenizer driving the same tree builder as the stdlib path.

Profiling puts ~50% of per-document extraction CPU inside stdlib
``html.parser`` tokenization (``goahead``/``parse_starttag``).  This
module re-implements ONLY the tokenizer — a tight scanning loop over
``str.find`` + two precompiled regexes — and feeds the exact same
``_TreeBuilder`` handler methods (``handle_starttag`` / ``handle_data``
/ …), so every tree-construction rule (auto-close, scope barriers,
style-in-p transparency, void elements) lives in one place
(``dom/parser.py``) regardless of tokenizer.

Fidelity contract: for any input with recoverable tag structure —
every golden fixture (28 real web pages), every synthetic template,
and a curated adversarial battery (malformed nesting, EOF truncation,
rawtext edge cases, entity soup) — the resulting tree serializes
IDENTICALLY to the stdlib-tokenized tree; this is enforced by
differential tests (tests/test_dom.py).  On pathological random tag
soup (unbalanced quotes inside half-open tags, interleaved ``</`` junk)
the two tokenizers may segment garbage differently — both still return
a tree and never raise, and the extraction pipeline's outer guard turns
any downstream surprise into a ``success=false`` row.  Set
``AES_STDLIB_PARSER=1`` to fall back to the stdlib tokenizer.

Tokenizer behaviors mirrored from stdlib HTMLParser
(convert_charrefs=True):

- charrefs decoded in text data and attribute values (``html.unescape``)
  but NOT inside script/style rawtext;
- script/style content is rawtext until the matching close tag
  (case-insensitive), unless the builder's style-in-p rule swallowed
  the start tag (``builder.in_rawtext`` reports whether rawtext mode
  actually began);
- a tag is self-closing when, after tolerant attribute tokenization,
  exactly a ``/`` remains before ``>`` (stdlib's ``end == '/>'`` rule —
  an unquoted value may legitimately end in ``/`` and is NOT
  self-closing);
- ``<!-- -->`` comments, ``<![CDATA[ ]]>`` sections, ``<!...>``
  declarations and ``<?...>`` PIs are skipped; a ``<`` that opens no
  recognizable construct is literal text.
"""

from __future__ import annotations

import re
from html import unescape

# Start tag: name + greedy quote-aware attr soup (a '>' inside a quoted
# value does not terminate the tag).
_START_RE = re.compile(
    r"<([a-zA-Z][-.:\w]*)((?:[^>'\"]|\"[^\"]*\"|'[^']*')*)>"
)

_END_RE = re.compile(r"</\s*([a-zA-Z][-.:\w]*)\s*[^>]*>")

# Tolerant attribute: name (stdlib's attrfind_tolerant char classes:
# the first name char may be '=' but not '/'), optionally =value with
# double/single/no quoting (unquoted values may contain '/').
_ATTR_RE = re.compile(
    r"([^\s/>][^\s/>=]*)(\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]*)))?"
)

_RAWTEXT_CLOSE = {
    "script": re.compile(r"</\s*script\s*>", re.IGNORECASE),
    "style": re.compile(r"</\s*style\s*>", re.IGNORECASE),
}


def _parse_attrs(soup: str) -> tuple[list[tuple[str, str | None]], bool]:
    """Tokenize the attr soup; returns (attrs, self_closing)."""
    attrs: list[tuple[str, str | None]] = []
    last_end = 0
    for m in _ATTR_RE.finditer(soup):
        name = m.group(1).lower()
        if m.group(2) is None:
            attrs.append((name, None))
        else:
            value = m.group(3)
            if value is None:
                value = m.group(4)
            if value is None:
                value = m.group(5) or ""
            if "&" in value:
                value = unescape(value)
            attrs.append((name, value))
        last_end = m.end()
    trailing = soup[last_end:].strip()
    return attrs, trailing == "/"


def feed_fast(builder, html: str) -> None:
    """Tokenize ``html`` and drive ``builder``'s HTMLParser-style hooks."""
    pos = 0
    n = len(html)
    find = html.find
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            data = html[pos:]
            builder.handle_data(unescape(data) if "&" in data else data)
            break
        if lt > pos:
            data = html[pos:lt]
            builder.handle_data(unescape(data) if "&" in data else data)
        nxt = html[lt + 1] if lt + 1 < n else ""
        if nxt == "/":
            m = _END_RE.match(html, lt)
            if m:
                builder.handle_endtag(m.group(1).lower())
                pos = m.end()
                continue
            # malformed end tag → bogus comment: skip to '>' (stdlib)
            gt = find(">", lt)
            pos = (gt + 1) if gt >= 0 else n
            continue
        if nxt == "!":
            if html.startswith("<!--", lt):
                end = find("-->", lt + 4)
                if end < 0:  # unterminated at EOF: literal text (stdlib)
                    tail = html[lt:]
                    builder.handle_data(
                        unescape(tail) if "&" in tail else tail
                    )
                    break
                pos = end + 3
                continue
            if html.startswith("<![CDATA[", lt):
                end = find("]]>", lt + 9)
                if end < 0:
                    tail = html[lt:]
                    builder.handle_data(
                        unescape(tail) if "&" in tail else tail
                    )
                    break
                pos = end + 3
                continue
            gt = find(">", lt)
            if gt < 0:
                tail = html[lt:]
                builder.handle_data(
                    unescape(tail) if "&" in tail else tail
                )
                break
            pos = gt + 1
            continue
        if nxt == "?":
            gt = find(">", lt)
            if gt < 0:
                tail = html[lt:]
                builder.handle_data(
                    unescape(tail) if "&" in tail else tail
                )
                break
            pos = gt + 1
            continue
        if not ("a" <= nxt <= "z" or "A" <= nxt <= "Z"):
            # '<' opening no construct: literal text (stdlib behavior)
            builder.handle_data("<")
            pos = lt + 1
            continue
        m = _START_RE.match(html, lt)
        if not m:
            if find(">", lt) < 0:
                # unterminated tag at EOF: literal text (stdlib close())
                tail = html[lt:]
                builder.handle_data(
                    unescape(tail) if "&" in tail else tail
                )
                break
            builder.handle_data("<")
            pos = lt + 1
            continue
        tag = m.group(1).lower()
        soup = m.group(2)
        if not soup:
            # dominant case in article markup (<p>, <h1>, <main>, …):
            # no attr soup at all — skip the tokenizer call entirely
            attrs: list[tuple[str, str | None]] = []
            self_closing = False
        else:
            attrs, self_closing = _parse_attrs(soup)
        pos = m.end()
        if self_closing:
            builder.handle_startendtag(tag, attrs)
            continue
        builder.handle_starttag(tag, attrs)
        closer = _RAWTEXT_CLOSE.get(tag)
        if closer is not None and builder.in_rawtext(tag):
            cm = closer.search(html, pos)
            if cm:
                raw = html[pos:cm.start()]
                if raw:
                    builder.handle_data(raw)  # rawtext: no charrefs
                builder.handle_endtag(tag)
                pos = cm.end()
            else:
                # no closing tag: stdlib buffers forever and close()
                # DROPS the unterminated rawtext content — element
                # stays, content gone
                pos = n
