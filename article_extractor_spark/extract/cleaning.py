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
    """Strip boilerplate tags and unlikely ARIA-role elements in place.

    The two passes are fused into ONE tree walk when both selectors
    compile to their fast shapes (bare-tag set / same-attribute equality
    set — always true for the built-in selectors).  Equivalence to the
    sequential passes: both only DETACH whole subtrees, detachment of
    distinct nodes commutes, and a match inside an already-detached
    subtree is unreachable from the root either way — so the surviving
    tree is identical regardless of collection order.
    """
    from ..dom.selector import attr_eq_set, bare_tag_set

    tags = bare_tag_set(strip_selector)
    attr_eq = attr_eq_set(rules.ROLE_STRIP_SELECTOR)
    if tags is None or attr_eq is None:  # defensive: custom selector
        remove_matching(doc, strip_selector)
        remove_matching(doc, rules.ROLE_STRIP_SELECTOR)
        return doc
    role_attr, role_vals = attr_eq
    doomed: list[Node] = []
    append = doomed.append
    stack = doc.children[::-1]
    pop = stack.pop
    extend = stack.extend
    while stack:
        node = pop()
        name = node.name
        if name == "#text":
            continue
        attrs = node.attrs
        if name in tags or (
            attrs and str(attrs.get(role_attr, "")) in role_vals
        ):
            append(node)
        if node.children:
            extend(node.children[::-1])
    for node in doomed:
        if node.parent is not None:
            node.parent.remove_child(node)
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
    """Cascading title extraction (title_extractor.py:16-67).

    ONE document-order walk replaces three first-match query cascades:
    the walk records the first ``<h1>`` and first ``<title>`` and
    returns immediately on the first ``og:title`` meta with non-empty
    content (cascade priority is independent of document position, so
    nothing later can outrank it).  Match predicates are byte-identical
    to the compiled selectors the cascades used."""
    first_h1: Node | None = None
    first_title: Node | None = None
    stack = doc.children[::-1]
    pop = stack.pop
    extend = stack.extend
    while stack:
        node = pop()
        name = node.name
        if name == "#text":
            continue
        if name == "meta":
            if str(node.attrs.get("property", "")) == "og:title":
                content = node.attrs.get("content", "")
                if content:
                    return str(content)
        elif name == "h1":
            if first_h1 is None:
                first_h1 = node
        elif name == "title":
            if first_title is None:
                first_title = node
        if node.children:
            extend(node.children[::-1])

    if first_h1 is not None:
        text = first_h1.to_text(strip=True)
        if text:
            return text

    if first_title is not None:
        text = first_title.to_text(strip=True)
        if text:
            if " - " in text:
                text = text.split(" - ")[0].strip()
            return text

    return title_from_url(url) or "Untitled"
