"""Page-level structured metadata extraction (beyond-reference).

The reference's extraction surface declares ``author`` /
``date_published`` but never populates them — its server wire model
hardcodes ``byline=None`` / ``siteName=None`` (reference
server.py:399-411), and the extractor reads only og:title for the
title chain (title_extractor.py:22-44).  A training-data pipeline
wants the rest of the page's self-declared provenance: OpenGraph
tags, the canonical link, ``article:published_time``, and the JSON-LD
``Article`` block most CMSes emit.  This module extracts all of them
from the shared DOM in ONE element walk plus one ``json.loads`` per
``application/ld+json`` script.

Spark surface: ``operators.extraction.page_metadata`` (Arrow-batched,
pruned to (doc_id, html)).  Every field is best-effort: malformed
JSON-LD, missing tags, or an unparseable page yield NULLs, never an
exception (the same no-task-death contract as ``extract_document``).
"""

from __future__ import annotations

import json

from ..dom.parser import parse_html

META_FIELDS = (
    "og_title",
    "og_description",
    "og_image",
    "canonical_url",
    "published_time",
    "headline",
    "author",
)

_PROP_TO_FIELD = {
    "og:title": "og_title",
    "og:description": "og_description",
    "og:image": "og_image",
    "article:published_time": "published_time",
}

_ARTICLE_TYPES = {
    "Article",
    "NewsArticle",
    "BlogPosting",
    "ScholarlyArticle",
    "Report",
    "TechArticle",
}


def _jsonld_article(payload) -> dict | None:
    """First Article-typed object in a JSON-LD payload (handles a bare
    object, a top-level list, and the @graph envelope)."""
    if isinstance(payload, list):
        for item in payload:
            found = _jsonld_article(item)
            if found is not None:
                return found
        return None
    if not isinstance(payload, dict):
        return None
    t = payload.get("@type")
    types = t if isinstance(t, list) else [t]
    if any(isinstance(x, str) and x in _ARTICLE_TYPES for x in types):
        return payload
    graph = payload.get("@graph")
    if isinstance(graph, list):
        return _jsonld_article(graph)
    return None


def _author_name(author) -> str | None:
    """Normalize schema.org author shapes: plain string, Person object
    ({"name": ...}), or a list of either (first wins)."""
    if isinstance(author, str):
        return author or None
    if isinstance(author, dict):
        name = author.get("name")
        return name if isinstance(name, str) and name else None
    if isinstance(author, list):
        for item in author:
            name = _author_name(item)
            if name is not None:
                return name
    return None


def extract_page_metadata(html: str | bytes) -> dict:
    """Extract page-declared metadata; all fields None on any failure.

    First-wins per field (browser/crawler convention for duplicated
    meta tags).  JSON-LD fields come from the first parseable
    ``application/ld+json`` block containing an Article-typed object;
    unparseable blocks are skipped, not fatal.
    """
    try:
        doc = parse_html(html)
    except Exception:  # noqa: BLE001 - any parse failure is a null row
        return dict.fromkeys(META_FIELDS)
    return metadata_from_doc(doc)


def metadata_from_doc(doc) -> dict:
    """The metadata walk over an ALREADY-PARSED DOM — the fused hook
    ``extract_document(..., emit_metadata=True)`` calls right after
    its own parse (and before cleaning strips head/script elements),
    so a pipeline wanting spans + provenance parses each document
    ONCE instead of running two Arrow stages with a parse each."""
    out: dict = dict.fromkeys(META_FIELDS)
    jsonld_done = False
    for node in doc.iter_elements():
        name = node.name
        if name == "meta":
            prop = node.attrs.get("property") or node.attrs.get("name")
            content = node.attrs.get("content")
            if not isinstance(prop, str) or not isinstance(content, str):
                continue
            if not content:
                continue
            key = _PROP_TO_FIELD.get(prop)
            if key is not None and out[key] is None:
                out[key] = content
        elif name == "link":
            # rel is a case-insensitive space-separated token list
            # (HTML spec) — 'Canonical' and 'canonical alternate' both
            # declare the canonical link
            rel = node.attrs.get("rel")
            href = node.attrs.get("href")
            if (
                isinstance(rel, str)
                and "canonical" in rel.lower().split()
                and isinstance(href, str)
                and href
                and out["canonical_url"] is None
            ):
                out["canonical_url"] = href
        elif name == "script" and not jsonld_done:
            # MIME match mirrors browsers/structured-data parsers:
            # ASCII-case-insensitive, surrounding whitespace stripped,
            # parameters (';charset=…') ignored
            mime = str(node.attrs.get("type", ""))
            if mime.split(";", 1)[0].strip().lower() != "application/ld+json":
                continue
            raw = "".join(
                c.text for c in node.children if c.is_text()
            )
            try:
                payload = json.loads(raw)
            except Exception:  # noqa: BLE001 - malformed block: skip
                continue
            art = _jsonld_article(payload)
            if art is None:
                continue
            headline = art.get("headline")
            if isinstance(headline, str) and headline:
                out["headline"] = headline
            out["author"] = _author_name(art.get("author"))
            jsonld_done = True
    return out
