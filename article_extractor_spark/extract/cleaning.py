"""Pre-scoring document cleanup and title cascade.

Reproduces document_cleaner.py:15-51 (strip tags + ARIA roles) and
title_extractor.py:16-84 (og:title → h1 → <title> → URL path → Untitled)
from the reference; SURVEY.md §2.1 E3-E5.
"""

from __future__ import annotations

from urllib.parse import urlparse

from . import rules
from ..dom.node import Node


def remove_matching(root: Node, selector: str) -> None:
    """Detach every descendant matching ``selector`` (skips parentless)."""
    if not selector or not selector.strip():
        return
    for node in root.query(selector):
        if node.parent is not None:
            node.parent.remove_child(node)


def clean_document(doc: Node, strip_selector: str) -> Node:
    """Strip boilerplate tags and unlikely ARIA-role elements in place."""
    remove_matching(doc, strip_selector)
    remove_matching(doc, rules.ROLE_STRIP_SELECTOR)
    return doc


def normalized_host(url: str) -> str:
    """Lowercased netloc with a leading ``www.`` removed
    (reference extractor.py:148-152)."""
    host = urlparse(url).netloc.lower()
    return host[4:] if host.startswith("www.") else host


def strip_selector_for_host(host: str) -> str:
    """Host-specific keep-lists for the tag-strip pass
    (reference extractor.py:197-206, 296-301)."""
    if host == "infoworld.com":
        return rules.strip_selector_for(
            frozenset({"aside", "footer", "nav", "header"})
        )
    if host == "technologyreview.com":
        return rules.strip_selector_for(frozenset({"aside"}))
    return rules.STRIP_SELECTOR_DEFAULT


def title_from_url(url: str) -> str | None:
    """Readable title from the last URL path segment."""
    if not url:
        return None
    path = urlparse(url).path
    if not path or path == "/":
        return None
    segment = path.strip("/").split("/")[-1]
    return segment.replace("-", " ").replace("_", " ").title()


def extract_title(doc: Node, url: str = "") -> str:
    """Cascading title extraction (title_extractor.py:16-67)."""
    for meta in doc.iter_query('meta[property="og:title"]'):
        content = meta.attrs.get("content", "")
        if content:
            return str(content)

    for h1 in doc.iter_query("h1"):
        text = h1.to_text(strip=True)
        if text:
            return text
        break  # only the first h1 is consulted

    for title_node in doc.iter_query("title"):
        text = title_node.to_text(strip=True)
        if text:
            if " - " in text:
                text = text.split(" - ")[0].strip()
            return text
        break

    return title_from_url(url) or "Untitled"
