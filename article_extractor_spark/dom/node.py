"""DOM node type for the extraction kernel.

A deliberately small tree node: element nodes carry ``name``/``attrs``/
``children``; text nodes are elements named ``#text`` whose payload lives
in ``text``.  The API mirrors the subset of the ``justhtml`` node surface
the reference extraction semantics consume (SURVEY.md §1.1), but the
implementation is original.
"""

from __future__ import annotations

from html import escape

from .selector import attr_eq_set, bare_tag, bare_tag_set, compile_selector

TEXT = "#text"

# Elements serialized without a closing tag.
VOID_TAGS = frozenset(
    {
        "area",
        "base",
        "br",
        "col",
        "embed",
        "hr",
        "img",
        "input",
        "link",
        "meta",
        "param",
        "source",
        "track",
        "wbr",
    }
)

# Block-ish elements: newline separation in markdown rendering.
_BLOCK_TAGS = frozenset(
    {
        "address",
        "article",
        "aside",
        "blockquote",
        "div",
        "dl",
        "dd",
        "dt",
        "fieldset",
        "figure",
        "figcaption",
        "footer",
        "form",
        "h1",
        "h2",
        "h3",
        "h4",
        "h5",
        "h6",
        "header",
        "hr",
        "li",
        "main",
        "nav",
        "ol",
        "p",
        "pre",
        "section",
        "table",
        "tr",
        "ul",
    }
)


class Node:
    """One DOM tree node (element or text)."""

    __slots__ = ("name", "attrs", "parent", "children", "text")

    def __init__(
        self,
        name: str,
        attrs: dict[str, str] | None = None,
        text: str = "",
    ) -> None:
        self.name = name
        self.attrs: dict[str, str] = attrs if attrs is not None else {}
        self.parent: Node | None = None
        self.children: list[Node] = []
        self.text = text

    # -- tree surgery -------------------------------------------------

    def append_child(self, child: Node) -> None:
        child.parent = self
        self.children.append(child)

    def remove_child(self, child: Node) -> None:
        """Detach ``child`` from this node (no-op if not a child)."""
        try:
            self.children.remove(child)
        except ValueError:
            return
        child.parent = None

    def is_text(self) -> bool:
        return self.name == TEXT

    # -- traversal ----------------------------------------------------

    def iter_elements(self):
        """Yield every descendant element (not text nodes, not self)."""
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if node.name != TEXT:
                yield node
                stack.extend(reversed(node.children))

    def query(self, selector: str) -> list[Node]:
        """Return strict descendants matching a mini-CSS selector.

        Grammar: comma-separated compounds of ``tag``, ``#id``,
        ``.class``, ``[attr]``, ``[attr="v"]``, ``[attr^="v"]``,
        ``[attr*="v"]`` — the full grammar the reference uses
        (SURVEY.md §1.1).

        Inlined iterative walk (no generator) — query() dominates the
        per-document CPU profile after parsing, and the generator resume
        cost per node was measurable at corpus scale.
        """
        out: list[Node] = []
        stack = self.children[::-1]
        pop = stack.pop
        extend = stack.extend
        append = out.append
        tag = bare_tag(selector)
        if tag is not None:
            # bare-tag fast path ("a", "p", "img" — the link-density
            # memo and sanitizer call these per candidate): inline name
            # comparison, no matcher-callable dispatch per element
            while stack:
                node = pop()
                if node.name != TEXT:
                    if node.name == tag:
                        append(node)
                    if node.children:
                        extend(node.children[::-1])
            return out
        tags = bare_tag_set(selector)
        if tags is not None:
            # all-bare-tag comma list ("aside, footer, nav, …" — the
            # strip selector runs once per document): one set-membership
            # walk instead of N matcher dispatches per element
            while stack:
                node = pop()
                if node.name != TEXT:
                    if node.name in tags:
                        append(node)
                    if node.children:
                        extend(node.children[::-1])
            return out
        attr_eq = attr_eq_set(selector)
        if attr_eq is not None:
            # same-attribute equality list ('[role="menu"], [role=…]'):
            # one attrs.get + set membership per element
            a, vals = attr_eq
            while stack:
                node = pop()
                if node.name != TEXT:
                    if node.attrs and str(node.attrs.get(a, "")) in vals:
                        append(node)
                    if node.children:
                        extend(node.children[::-1])
            return out
        matchers = compile_selector(selector)
        if len(matchers) == 1:
            m = matchers[0]
            while stack:
                node = pop()
                if node.name != TEXT:
                    if m(node):
                        append(node)
                    if node.children:
                        extend(node.children[::-1])
            return out
        while stack:
            node = pop()
            if node.name != TEXT:
                for m in matchers:
                    if m(node):
                        append(node)
                        break
                if node.children:
                    extend(node.children[::-1])
        return out

    def matches(self, selector: str) -> bool:
        matchers = compile_selector(selector)
        return any(m(self) for m in matchers)

    # -- text ---------------------------------------------------------

    def to_text(self, separator: str = " ", strip: bool = True) -> str:
        """Concatenate descendant text.

        With ``strip=True`` each text chunk is stripped and empty chunks
        dropped; chunks are joined with ``separator``.  Downstream
        comparisons collapse whitespace, so exact join behavior only
        needs to be internally consistent (the golden-fixture oracle and
        the engine both use this function).
        """
        pieces: list[str] = []
        self._collect_text(pieces)
        if strip:
            stripped = [p.strip() for p in pieces]
            return separator.join(p for p in stripped if p)
        return separator.join(pieces)

    def _collect_text(self, out: list[str]) -> None:
        # Iterative: adversarial web documents nest thousands deep and
        # must not blow the recursion limit inside an executor task.
        stack = [self]
        while stack:
            node = stack.pop()
            if node.name == TEXT:
                if node.text:
                    out.append(node.text)
            else:
                stack.extend(reversed(node.children))

    # -- serialization ------------------------------------------------

    def to_html(self, indent: int = 0) -> str:
        """Serialize this node (children only for container pseudo-roots).

        Iterative (explicit work stack) so arbitrarily deep documents
        serialize without hitting the recursion limit.
        """
        buf: list[str] = []
        # Work items: Node to open, or a literal string to emit (closer).
        stack: list[Node | str] = [self]
        while stack:
            item = stack.pop()
            if isinstance(item, str):
                buf.append(item)
                continue
            if item.name == TEXT:
                buf.append(escape(item.text, quote=False))
                continue
            if item.name == "#document":
                stack.extend(reversed(item.children))
                continue
            buf.append("<")
            buf.append(item.name)
            for key, value in item.attrs.items():
                buf.append(f' {key}="{escape(str(value), quote=True)}"')
            if item.name in VOID_TAGS:
                buf.append(" />")
                continue
            buf.append(">")
            stack.append(f"</{item.name}>")
            stack.extend(reversed(item.children))
        return "".join(buf)

    def to_markdown(self) -> str:
        """Lightweight markdown rendering (headings, links, images,
        emphasis, code blocks, list items)."""
        out = self._md().strip()
        return out

    def _md(self) -> str:
        if self.name == TEXT:
            return self.text
        inner = "".join(child._md() for child in self.children)
        name = self.name
        if name == "#document":
            return inner
        if name in {"h1", "h2", "h3", "h4", "h5", "h6"}:
            level = int(name[1])
            return f"\n\n{'#' * level} {inner.strip()}\n\n"
        if name == "p":
            return f"\n\n{inner.strip()}\n\n"
        if name == "br":
            return "\n"
        if name == "hr":
            return "\n\n---\n\n"
        if name == "a":
            href = self.attrs.get("href", "")
            label = inner.strip()
            if not label:
                return ""
            return f"[{label}]({href})" if href else label
        if name == "img":
            src = self.attrs.get("src", "")
            alt = self.attrs.get("alt", "")
            return f"![{alt}]({src})" if src else ""
        if name in {"strong", "b"}:
            return f"**{inner.strip()}**" if inner.strip() else ""
        if name in {"em", "i"}:
            return f"*{inner.strip()}*" if inner.strip() else ""
        if name == "code" and (self.parent is None or self.parent.name != "pre"):
            return f"`{inner}`"
        if name == "pre":
            return f"\n\n```\n{inner}\n```\n\n"
        if name == "li":
            return f"\n- {inner.strip()}"
        if name == "blockquote":
            quoted = "\n".join(
                f"> {line}" for line in inner.strip().splitlines() if line.strip()
            )
            return f"\n\n{quoted}\n\n"
        if name in _BLOCK_TAGS:
            return f"\n{inner}\n"
        return inner

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        if self.name == TEXT:
            return f"Text({self.text[:30]!r})"
        return f"<{self.name} attrs={self.attrs} children={len(self.children)}>"
