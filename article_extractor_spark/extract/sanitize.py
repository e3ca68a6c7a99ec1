"""Post-selection content sanitization.

Reproduces the reference's content_sanitizer.py semantics (SURVEY.md
§2.1 E17-E21, E23): empty-link removal, invalid-image removal,
boilerplate-block pruning, empty-block removal, host-specific cleanups,
and a safe-mode output pass.
"""

from __future__ import annotations

from . import rules
from .cleaning import remove_matching
from .scoring import DocMemo, is_unlikely_candidate
from ..dom.node import Node


def nodes_with_tags(root: Node, tags: tuple[str, ...]) -> list[Node]:
    """All descendants with one of ``tags``, plus the root if it matches
    (reference dom_utils.py:16-40)."""
    wanted = set(tags)
    out = [n for n in root.iter_elements() if n.name in wanted]
    if root.name in wanted:
        out.append(root)
    return out


# ------------------------------------------------------------------
# image validity (content_sanitizer.py:110-209)
# ------------------------------------------------------------------

def _url_host(src: str) -> str | None:
    if src.startswith("//"):
        rest = src[2:]
    elif "://" in src:
        rest = src.split("://", 1)[1]
    else:
        return None
    if not rest:
        return None
    host = rest.split("/", 1)[0]
    return host.split("?", 1)[0].split("#", 1)[0]


def _url_filename(src: str) -> str:
    path = src.split("?", 1)[0].split("#", 1)[0]
    return path.rsplit("/", 1)[-1]


def is_safe_data_image(src_lower: str) -> bool:
    return src_lower.startswith(rules.SAFE_DATA_IMAGE_PREFIXES)


def _plausible_image_filename(filename: str) -> bool:
    filename = filename.rsplit("/", 1)[-1]
    base, dot, ext = filename.rpartition(".")
    if not dot:
        return False
    if ext not in rules.IMAGE_EXTENSIONS:
        return False
    # tiny basenames ("t.gif") are almost always trackers
    return len(base.strip()) >= rules.MIN_IMAGE_BASENAME_CHARS


def _plausible_absolute_image(filename: str) -> bool:
    if not filename or "." not in filename:
        return True  # extension-less CDN paths are common and fine
    return _plausible_image_filename(filename)


def has_valid_image_src(node: Node) -> bool:
    src = node.attrs.get("src")
    if src is None:
        return False
    src = str(src).strip()
    if not src:
        return False
    low = src.lower()

    if low.startswith("data:"):
        return is_safe_data_image(low)

    filename = _url_filename(low)
    host = _url_host(low)
    if filename in rules.TRACKING_IMAGE_FILENAMES:
        return False
    if host and host.startswith(rules.TRACKING_HOST_PREFIXES):
        return False

    if low.startswith(("http://", "https://", "//")):
        return _plausible_absolute_image(filename)
    if low.startswith(("/", "./", "../")):
        return True
    return _plausible_image_filename(low)


def has_visible_content(node: Node, memo: DocMemo | None = None) -> bool:
    text = memo.text(node) if memo is not None else node.to_text(strip=True)
    if text:
        return True
    if node.name == "img":
        return has_valid_image_src(node)
    if memo is not None:
        primed = memo.desc_img_ok(node)
        if primed is not None:
            return primed
    return any(has_valid_image_src(img) for img in node.query("img"))


# ------------------------------------------------------------------
# boilerplate heuristic (content_sanitizer.py:221-295)
# ------------------------------------------------------------------

def _node_link_density(node: Node, memo: DocMemo | None = None) -> float:
    if memo is not None:
        text = memo.text(node)
        linked_len = memo.linked_len(node)
    else:
        text = node.to_text(separator=" ", strip=True)
        linked_len = None
    if not text:
        return 0.0
    if linked_len is None:
        linked_len = sum(
            len(a.to_text(separator=" ", strip=True))
            for a in node.query("a")
        )
    return min(1.0, linked_len / len(text))


def _hint_text(node: Node) -> str:
    attrs = node.attrs or {}
    cls = attrs.get("class", "")
    if isinstance(cls, (list, tuple)):
        cls = " ".join(str(c) for c in cls)
    return f"{cls} {attrs.get('id', '')}".strip()


def looks_like_boilerplate(node: Node, memo: DocMemo | None = None) -> bool:
    text = (
        memo.text(node)
        if memo is not None
        else node.to_text(separator=" ", strip=True)
    )
    if not text:
        return False

    density = _node_link_density(node, memo)
    n = len(text)
    hints = _hint_text(node)
    hinted = bool(rules.RX_BOILERPLATE_ATTRS.search(hints))
    strongly_hinted = bool(rules.RX_BOILERPLATE_ATTRS_STRONG.search(hints))

    # Identical truth table to the original single expression, but the
    # phrase scan (lowercase the WHOLE subtree text + substring-search
    # every boilerplate phrase — the dominant cost, and O(bytes×depth)
    # across a sweep since ancestors repeat their descendants' text) is
    # evaluated ONLY when some phrase-conjunction could still fire.
    if strongly_hinted and (n < 5000 or density > 0.08):
        return True
    if hinted and n < 2500 and density > 0.05:
        return True
    if is_unlikely_candidate(node) and (n < 1600 or density > 0.2):
        return True
    if not (
        (hinted and (density > 0.08 or n < 1200))
        or density > 0.35
        or (strongly_hinted and n < 2500)
    ):
        return False
    low = text.lower()
    return any(p in low for p in rules.BOILERPLATE_PHRASES)


# ------------------------------------------------------------------
# sanitize passes (content_sanitizer.py:43-107)
# ------------------------------------------------------------------

def _drop_failing(root: Node, tags: tuple[str, ...], keep) -> None:
    for node in nodes_with_tags(root, tags):
        if keep(node):
            continue
        if node.parent is not None:
            node.parent.remove_child(node)


def _pass_memo(root: Node) -> DocMemo:
    """Fresh fully-primed memo for ONE sanitize sweep.

    Valid because each sweep visits nodes in pre-order (ancestors before
    descendants, ``nodes_with_tags``): a removal only changes the text of
    the removed node's ANCESTORS, which were all decided before the
    removal, so primed values can never be observed stale within a
    sweep.  Sweeps mutate the tree, so each sweep re-primes — total cost
    4 × O(nodes + bytes) instead of the lazy path's O(nodes × depth)
    (a 5000-deep adversarial nest went 26 s → <0.1 s)."""
    memo = DocMemo()
    memo.prime(root, img_pred=has_valid_image_src, paragraphs=False)
    return memo


def _sweep(memo: DocMemo, root: Node, tags: tuple[str, ...], keep) -> int:
    """One removal sweep over the primed document-order element list —
    same node set and order as ``nodes_with_tags`` (the root's position
    differs but the root is never removable), without re-walking the
    tree.  Returns the number of nodes removed so the caller knows
    whether the tree (and therefore the memo) is still pristine."""
    wanted = set(tags)
    removed = 0
    for node in memo.elements():
        if node is root or node.name not in wanted or keep(node):
            continue
        if node.parent is not None:
            node.parent.remove_child(node)
            removed += 1
    return removed


def sanitize_content(root: Node, *, remove_boilerplate: bool = True) -> None:
    """Empty links → invalid images → (boilerplate blocks) → empty blocks.

    Each sweep needs a memo primed against the CURRENT tree; a sweep
    that removed nothing left the tree (hence the memo) unchanged, so
    the next sweep reuses it — on clean documents (the common case at
    corpus scale) all four sweeps share ONE O(nodes + bytes) prime."""
    memo = _pass_memo(root)
    dirty = _sweep(memo, root, ("a",), lambda n: has_visible_content(n, memo))
    dirty += _sweep(memo, root, ("img",), has_valid_image_src)
    if remove_boilerplate:
        bp_memo = _pass_memo(root) if dirty else memo
        dirty = _sweep(
            bp_memo,
            root,
            ("div", "section", "aside", "ul", "ol", "p"),
            lambda n: not looks_like_boilerplate(n, bp_memo),
        )
    else:
        bp_memo = memo
    final_memo = _pass_memo(root) if dirty else bp_memo
    _sweep(
        final_memo,
        root,
        ("li", "p", "div"),
        lambda n: has_visible_content(n, final_memo),
    )


# ------------------------------------------------------------------
# host-specific cleanup (extractor.py:162-194)
# ------------------------------------------------------------------

_HOST_CLEANUP_SELECTORS: dict[str, tuple[str, ...]] = {
    "leaddev.com": (
        ".gform_wrapper", ".gform_fields", ".ld-card", ".wp-block-pbc-card",
    ),
    "infoworld.com": (
        ".primaryNav", ".header__container", ".header__menu",
        '[id^="header-menu-"]', ".article-hero", ".author-bio",
        "aside.social-share-sticky-menu", ".suggested-content-various",
        "script", ".ad", ".advert", ".ad-bottomleaderboard", ".rightTrailAd",
        "#newsletter-end", ".newsletter", "footer.footer",
    ),
    "technologyreview.com": ('[class*="fullStory__sidebar"]',),
}


def host_specific_cleanup(root: Node, host: str) -> None:
    for selector in _HOST_CLEANUP_SELECTORS.get(host, ()):
        remove_matching(root, selector)


# ------------------------------------------------------------------
# safe-mode output pass (intent of justhtml.sanitize.sanitize_dom,
# whitelist documented at reference constants.py:227-263)
# ------------------------------------------------------------------

def _is_unsafe_url(value: str) -> bool:
    low = value.lower().strip()
    return low.startswith(rules.UNSAFE_URL_SCHEMES)


def safe_mode_clean(root: Node) -> None:
    """Drop executable/embedded subtrees, strip non-whitelisted and
    unsafe attributes in place.  Non-whitelisted structural tags are kept
    (their text must survive: the reference's golden outputs retain
    div/span wrappers) — only their attributes are reduced.

    Unlike the reference, URLs are preserved directly rather than routed
    through uuid placeholders (extractor.py:37-92): our sanitizer keeps
    safe http(s)/data-image URLs natively, so the placeholder round-trip
    is unnecessary and determinism is free.
    """
    for node in list(root.iter_elements()):
        if node.name in rules.SAFE_MODE_DROP_TAGS:
            if node.parent is not None:
                node.parent.remove_child(node)
            continue
        if not node.attrs:
            continue
        kept: dict[str, str] = {}
        for key, value in node.attrs.items():
            if key.startswith("on"):
                continue
            if key not in rules.SAFE_OUTPUT_ATTRS:
                continue
            sval = str(value)
            if key in ("href", "src", "srcset") and _is_unsafe_url(sval):
                continue
            kept[key] = sval
        node.attrs = kept
