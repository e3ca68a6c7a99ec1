"""Mini CSS selector compiler.

Covers exactly the selector grammar exercised by the reference extraction
semantics (SURVEY.md §1.1): bare tags, comma lists, ``#id``, ``.class``,
``tag.class`` compounds, ``[attr]``, ``[attr="v"]``, ``[attr^="v"]``,
``[attr*="v"]``.  No combinators (descendant matching is done by the
caller walking the tree).
"""

from __future__ import annotations

import re
from collections.abc import Callable
from functools import lru_cache
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from .node import Node

Matcher = Callable[["Node"], bool]

_PART_RE = re.compile(
    r"""
    (?P<tag>[a-zA-Z][a-zA-Z0-9-]*)
  | \#(?P<id>[\w-]+)
  | \.(?P<cls>[\w-]+)
  | \[(?P<attr>[\w-]+)(?:(?P<op>[\^\*]?=)(?P<q>["']?)(?P<val>[^"'\]]*)(?P=q))?\]
    """,
    re.VERBOSE,
)


def _class_list(node: Node) -> list[str]:
    raw = node.attrs.get("class", "")
    if isinstance(raw, (list, tuple)):
        return [str(c) for c in raw]
    return str(raw).split()


def _compile_compound(compound: str) -> Matcher:
    checks: list[Matcher] = []
    pos = 0
    compound = compound.strip()
    while pos < len(compound):
        m = _PART_RE.match(compound, pos)
        if m is None:
            # Unparseable selector part: match nothing (defensive).
            return lambda node: False
        pos = m.end()
        if m.group("tag"):
            tag = m.group("tag").lower()
            checks.append(lambda n, t=tag: n.name == t)
        elif m.group("id"):
            ident = m.group("id")
            checks.append(lambda n, v=ident: str(n.attrs.get("id", "")) == v)
        elif m.group("cls"):
            cls = m.group("cls")
            checks.append(lambda n, v=cls: v in _class_list(n))
        else:
            attr = m.group("attr")
            op = m.group("op")
            val = m.group("val")
            if op is None:
                checks.append(lambda n, a=attr: a in n.attrs)
            elif op == "=":
                checks.append(
                    lambda n, a=attr, v=val: str(n.attrs.get(a, "")) == v
                )
            elif op == "^=":
                checks.append(
                    lambda n, a=attr, v=val: str(n.attrs.get(a, "")).startswith(v)
                )
            else:  # *=
                checks.append(
                    lambda n, a=attr, v=val: v in str(n.attrs.get(a, ""))
                )

    if not checks:
        return lambda node: False
    if len(checks) == 1:
        return checks[0]

    def _all(node: Node, cs: tuple[Matcher, ...] = tuple(checks)) -> bool:
        return all(c(node) for c in cs)

    return _all


_BARE_TAG_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9-]*$")

_ATTR_EQ_RE = re.compile(r'\[([\w-]+)=(["\']?)([^"\'\]]*)\2\]$')


@lru_cache(maxsize=512)
def bare_tag_set(selector: str) -> frozenset[str] | None:
    """Lowercased tag-name set if EVERY comma compound is a bare tag
    ("aside, footer, nav, script, …" — the document-strip selector),
    else None.  Lets ``Node.query`` run ONE set-membership walk instead
    of N matcher-callable dispatches per element."""
    tags = []
    for part in selector.split(","):
        s = part.strip()
        if not s:
            continue
        if not _BARE_TAG_RE.fullmatch(s):
            return None
        tags.append(s.lower())
    return frozenset(tags) if tags else None


@lru_cache(maxsize=512)
def attr_eq_set(selector: str) -> tuple[str, frozenset[str]] | None:
    """(attr, value-set) if EVERY comma compound is a single
    ``[attr="v"]`` equality on the SAME attribute (the ARIA-role strip
    selector), else None — same one-walk trick as ``bare_tag_set``.
    Matching semantics are identical to the compiled matcher:
    ``str(node.attrs.get(attr, "")) == v``."""
    attr: str | None = None
    vals = []
    for part in selector.split(","):
        s = part.strip()
        if not s:
            continue
        m = _ATTR_EQ_RE.fullmatch(s)
        if m is None or not m.group(3):
            # empty-value equality would match attr-less nodes via the
            # "" default — keep that edge on the compiled-matcher path
            return None
        if attr is None:
            attr = m.group(1)
        elif m.group(1) != attr:
            return None
        vals.append(m.group(3))
    if attr is None:
        return None
    return attr, frozenset(vals)


@lru_cache(maxsize=512)
def bare_tag(selector: str) -> str | None:
    """Lowercased tag name if ``selector`` is a single bare tag
    ("a", "p", "img"), else None — lets ``Node.query`` take an inline
    name-comparison walk with no matcher-callable dispatch per element
    (the link-density memo and sanitizer issue thousands of bare-tag
    queries per document)."""
    s = selector.strip()
    return s.lower() if _BARE_TAG_RE.fullmatch(s) else None


@lru_cache(maxsize=512)
def compile_selector(selector: str) -> tuple[Matcher, ...]:
    """Compile a comma-separated selector list into matcher callables."""
    return tuple(
        _compile_compound(part)
        for part in selector.split(",")
        if part.strip()
    )
