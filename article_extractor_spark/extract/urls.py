"""URL absolutization over a content subtree.

Reproduces url_normalizer.py:18-85 from the reference (SURVEY.md §2.1
E16): rewrite every URL-bearing attribute with ``urljoin(base, value)``,
with per-entry handling for ``srcset``.
"""

from __future__ import annotations

from urllib.parse import urljoin

from . import rules
from .sanitize import nodes_with_tags


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


def absolutize_urls(root, base_url: str) -> None:
    """Rewrite relative URLs to absolute, in place."""
    for tag, attributes in rules.URL_ATTRIBUTES.items():
        for element in nodes_with_tags(root, (tag,)):
            attrs = element.attrs
            if not attrs:
                continue
            for attribute in attributes:
                value = attrs.get(attribute)
                if not value:
                    continue
                if attribute == "srcset":
                    attrs[attribute] = absolutize_srcset(value, base_url)
                else:
                    attrs[attribute] = urljoin(base_url, str(value))
