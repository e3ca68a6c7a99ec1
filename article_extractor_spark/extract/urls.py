"""URL absolutization over a content subtree.

Reproduces url_normalizer.py:18-85 from the reference (SURVEY.md §2.1
E16): rewrite every URL-bearing attribute with ``urljoin(base, value)``,
with per-entry handling for ``srcset``.
"""

from __future__ import annotations

from functools import lru_cache
from urllib.parse import urljoin as _urljoin

from . import rules

# urljoin is a pure function and both operands repeat heavily across a
# corpus (one base per document, site-relative hrefs/srcs shared across
# pages), so a bounded memo turns the dominant cost — re-splitting the
# SAME base URL for every link — into a dict hit.  Bounded, per-worker.
urljoin = lru_cache(maxsize=16384)(_urljoin)


def absolutize_srcset(value: str, base_url: str) -> str:
    parts: list[str] = []
    for raw in str(value).split(","):
        entry = raw.strip()
        if not entry:
            continue
        if " " in entry:
            url_part, descriptor = entry.split(None, 1)
            parts.append(f"{urljoin(base_url, url_part)} {descriptor.strip()}")
        else:
            parts.append(urljoin(base_url, entry))
    return ", ".join(parts)


def _rewrite_node(element, attributes: tuple[str, ...], base_url: str) -> None:
    attrs = element.attrs
    for attribute in attributes:
        value = attrs.get(attribute)
        if not value:
            continue
        if attribute == "srcset":
            attrs[attribute] = absolutize_srcset(value, base_url)
        else:
            attrs[attribute] = urljoin(base_url, str(value))


def absolutize_urls(root, base_url: str) -> None:
    """Rewrite relative URLs to absolute, in place.

    ONE document walk with a tag→attributes dict lookup — the per-tag
    ``nodes_with_tags`` spelling walked the whole tree once per entry in
    ``URL_ATTRIBUTES`` (10 walks/document, measurable at corpus scale).
    Per-node rewrite order is identical (attributes dict lookup), and
    node visit order within a tag matches the walk order either way."""
    url_attrs = rules.URL_ATTRIBUTES
    for element in root.iter_elements():
        if not element.attrs:
            continue
        attributes = url_attrs.get(element.name)
        if attributes is not None:
            _rewrite_node(element, attributes, base_url)
    attributes = url_attrs.get(root.name)
    if attributes is not None and root.attrs:
        _rewrite_node(root, attributes, base_url)
