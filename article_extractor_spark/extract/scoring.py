"""Readability-style node scoring.

Reproduces the scoring semantics of the reference scorer
(article-extractor scorer.py:34-270 — implementation behavior, not its
docstrings: candidate score = tag score + class weight + Σ paragraph
scores over descendant <p>, with a multiplicative link-density penalty;
see SURVEY.md §2.1 E7-E13).
"""

from __future__ import annotations

from . import rules
from ..dom.node import TEXT, Node


class DocMemo:
    """Per-document memo of node text and link density.

    Keyed by node identity; one instance per document so parallel batch
    extraction never shares state (mirrors the reference's per-extraction
    ExtractionCache, cache.py:15-93).
    """

    __slots__ = ("_text", "_density", "_linked", "_psum", "_img", "_order")

    def __init__(self) -> None:
        self._text: dict[int, str] = {}
        self._density: dict[int, float] = {}
        self._linked: dict[int, int] | None = None
        self._psum: dict[int, float] | None = None
        self._img: dict[int, bool] | None = None
        self._order: list[Node] | None = None

    def prime(self, root: Node, img_pred=None, paragraphs: bool = True) -> None:
        """Fill every cache for the whole tree in ONE post-order pass.

        The lazy per-node path recomputes each node's subtree walk from
        scratch, which is O(nodes × depth) over an ancestor chain — an
        adversarial 5000-deep nest costs ~20 s of CPU for ONE document
        (a straggler a crawled corpus WILL contain).  The post-order
        fold is O(nodes + text bytes): each node's text joins its
        children's already-computed texts (associative — identical to
        the flat leaf join), linked length and paragraph-score sums
        fold the same way (integer-valued, so fold order cannot change
        the float result).  Must be called while the tree is frozen:
        the pipeline primes after clean_document and before candidate
        discovery; nothing mutates until ranking is done.

        ``img_pred`` (sanitize passes): an img-node validity predicate;
        when given, a strict-descendant "has a valid <img>" boolean is
        folded alongside so ``has_visible_content`` is O(1) per node.
        ``paragraphs=False`` skips the paragraph-score fold (sanitize
        sweeps never read it — scoring text for every <p> would be pure
        overhead on the shallow-document hot path).

        Shape: one DFS builds the document-order (pre-order) node list,
        then the fold runs over it REVERSED — reversed pre-order visits
        every descendant before its ancestor, so children's values are
        always ready without (node, done) re-push bookkeeping.  The
        element-only pre-order list is kept (``elements()``) so sweeps
        that would re-walk the tree can reuse it."""
        txt = self._text
        linked: dict[int, int] = {}
        psum: dict[int, float] = {}
        img: dict[int, bool] | None = {} if img_pred is not None else None
        order: list[Node] = []
        stack: list[Node] = [root]
        pop = stack.pop
        push = stack.extend
        add = order.append
        while stack:
            node = pop()
            add(node)
            if node.children:
                push(node.children[::-1])
        for node in reversed(order):
            key = id(node)
            if node.name == TEXT:
                txt[key] = (node.text or "").strip()
                linked[key] = 0
                psum[key] = 0.0
                if img is not None:
                    img[key] = False
                continue
            parts: list[str] = []
            lsum = 0
            ps = 0.0
            any_img = False
            for c in node.children:
                ck = id(c)
                t = txt[ck]
                if t:
                    parts.append(t)
                lsum += linked[ck]
                ps += psum[ck]
                if c.name == "a":
                    lsum += len(t)
                elif paragraphs and c.name == "p":
                    p_score = paragraph_score(c, self)
                    if p_score > 0:
                        ps += p_score
                if img is not None and not any_img:
                    if img[ck]:
                        any_img = True
                    elif c.name == "img" and img_pred(c):
                        any_img = True
            txt[key] = " ".join(parts)
            linked[key] = lsum
            psum[key] = ps
            if img is not None:
                img[key] = any_img
        self._linked = linked
        # A psum folded with paragraphs=False is all-zero, not "no
        # paragraphs scored" — leave it unprimed so candidate_score
        # falls back to the real walk rather than silently using 0.
        self._psum = psum if paragraphs else None
        self._img = img
        self._order = [n for n in order if n.name != TEXT]

    def text(self, node: Node) -> str:
        key = id(node)
        cached = self._text.get(key)
        if cached is None:
            cached = node.to_text(separator=" ", strip=True)
            self._text[key] = cached
        return cached

    def text_len(self, node: Node) -> int:
        return len(self.text(node))

    def link_density(self, node: Node) -> float:
        key = id(node)
        cached = self._density.get(key)
        if cached is not None:
            return cached
        total = self.text_len(node)
        if total == 0:
            self._density[key] = 0.0
            return 0.0
        if self._linked is not None and key in self._linked:
            linked = self._linked[key]
        else:
            linked = sum(len(self.text(a)) for a in node.query("a"))
        density = linked / total
        self._density[key] = density
        return density

    def linked_len(self, node: Node) -> int | None:
        """Primed Σ len(text) over strict-descendant <a>, or None when
        not primed (callers fall back to the query walk)."""
        if self._linked is None:
            return None
        return self._linked.get(id(node))

    def paragraph_sum(self, node: Node) -> float | None:
        """Primed Σ paragraph_score over strict-descendant <p>, or
        None when not primed (callers fall back to the query walk)."""
        if self._psum is None:
            return None
        return self._psum.get(id(node))

    def elements(self) -> list[Node] | None:
        """Primed document-order element list (root first, then every
        element descendant), or None when not primed.  Valid only while
        the tree is unchanged since ``prime``."""
        return self._order

    def desc_img_ok(self, node: Node) -> bool | None:
        """Primed "some strict-descendant <img> passes img_pred", or
        None when not primed with a predicate (callers fall back to
        the query walk)."""
        if self._img is None:
            return None
        return self._img.get(id(node))


def class_id_text(node: Node) -> str:
    """Space-joined class + id attribute text for hint matching.

    The class attribute may be a list when synthetic trees are built
    programmatically (reference scorer.py:48-49 handles the same case).
    """
    attrs = node.attrs or {}
    cls = attrs.get("class", "")
    if isinstance(cls, (list, tuple)):
        cls = " ".join(str(c) for c in cls)
    return f"{cls} {attrs.get('id', '')}"


def tag_score(tag: str) -> int:
    return rules.TAG_BASE_SCORE.get(tag.lower(), 0)


def class_weight(node: Node) -> float:
    """±25 for positive/negative hints, +10 photo, +25 readability asset
    (reference scorer.py:66-100)."""
    hints = class_id_text(node)
    if not hints.strip():
        return 0.0
    weight = 0.0
    if rules.RX_POSITIVE.search(hints):
        weight += rules.POSITIVE_WEIGHT
    if rules.RX_NEGATIVE.search(hints):
        weight += rules.NEGATIVE_WEIGHT
    if rules.RX_PHOTO.search(hints):
        weight += rules.PHOTO_WEIGHT
    if rules.RX_READABILITY_ASSET.search(hints):
        weight += rules.READABILITY_ASSET_WEIGHT
    return weight


def is_unlikely_candidate(node: Node) -> bool:
    """class/id matches an unlikely hint and no rescue hint
    (reference scorer.py:103-121)."""
    hints = class_id_text(node)
    if not hints.strip():
        return False
    if rules.RX_UNLIKELY.search(hints):
        return not rules.RX_MAYBE_OK.search(hints)
    return False


def paragraph_score(node: Node, memo: DocMemo) -> float:
    """1 + commas + min(len//100, 3) for paragraphs ≥25 chars
    (reference scorer.py:136-167)."""
    text = memo.text(node)
    n = len(text)
    if n < rules.MIN_PARAGRAPH_CHARS:
        return 0.0
    return 1.0 + len(rules.RX_COMMA.findall(text)) + min(n // 100, 3)


def candidate_score(
    node: Node,
    memo: DocMemo,
    score_memo: dict[int, float] | None = None,
) -> float:
    """Aggregate content score of a candidate container.

    tag base + class weight + Σ paragraph_score over descendant <p>,
    then ×(1 - link_density) when density exceeds 0.25
    (reference scorer.py:192-235 — the implementation, which sums
    descendant paragraphs only; its docstring describes an ancestor
    propagation that the code does not perform).
    """
    if score_memo is not None:
        cached = score_memo.get(id(node))
        if cached is not None:
            return cached

    score = float(tag_score(node.name)) + class_weight(node)
    psum = memo.paragraph_sum(node)
    if psum is not None:
        score += psum
    else:
        for p in node.query("p"):
            p_score = paragraph_score(p, memo)
            if p_score > 0:
                score += p_score

    density = memo.link_density(node)
    if density > rules.LINK_DENSITY_PENALTY_ABOVE:
        score *= 1.0 - density

    if score_memo is not None:
        score_memo[id(node)] = score
    return score
