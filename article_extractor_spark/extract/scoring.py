"""Readability-style node scoring.

Reproduces the scoring semantics of the reference scorer
(article-extractor scorer.py:34-270 — implementation behavior, not its
docstrings: candidate score = tag score + class weight + Σ paragraph
scores over descendant <p>, with a multiplicative link-density penalty;
see SURVEY.md §2.1 E7-E13).
"""

from __future__ import annotations

from . import rules
from ..dom.node import Node


class DocMemo:
    """Per-document memo of node text and link density.

    Keyed by node identity; one instance per document so parallel batch
    extraction never shares state (mirrors the reference's per-extraction
    ExtractionCache, cache.py:15-93).
    """

    __slots__ = ("_text", "_density")

    def __init__(self) -> None:
        self._text: dict[int, str] = {}
        self._density: dict[int, float] = {}

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
        linked = sum(len(self.text(a)) for a in node.query("a"))
        density = linked / total
        self._density[key] = density
        return density


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
