"""Primed-memo equivalence + complexity guards.

The post-order ``DocMemo.prime`` fold and the memo-backed sanitize
sweeps must be OBSERVATIONALLY identical to the lazy per-node subtree
walks they replaced (scoring.py prime docstring; sanitize.py
``_pass_memo``).  These tests pin that equivalence on adversarial tree
shapes (nested links, tracker images, boilerplate hints, deep chains)
by diffing against the memo-free code paths, and guard the O(n)
complexity claim with a wall-clock bound a regression to O(n x depth)
cannot meet.
"""

from __future__ import annotations

import random
import time

from article_extractor_spark.dom import parse_html
from article_extractor_spark.extract.pipeline import extract_document
from article_extractor_spark.extract.sanitize import (
    _node_link_density,
    has_valid_image_src,
    has_visible_content,
    looks_like_boilerplate,
    sanitize_content,
)
from article_extractor_spark.extract.scoring import DocMemo


def _random_html(rng: random.Random, n_blocks: int = 40) -> str:
    """Adversarial corpus generator: mixes empty links, nested <a>,
    tracker + valid images, boilerplate-hinted blocks, link farms, and
    deep wrapper chains — every branch the sanitizer distinguishes."""
    frags = []
    for i in range(n_blocks):
        kind = rng.randrange(9)
        if kind == 0:
            frags.append(f"<p>plain paragraph {i} with several words of body text.</p>")
        elif kind == 1:
            frags.append(f'<a href="/x{i}"></a>')  # empty link
        elif kind == 2:
            frags.append(f'<a href="/y{i}"><img src="//tr.example/pixel.gif"></a>')
        elif kind == 3:
            frags.append(f'<p><img src="/img/photo-{i}.jpg"> caption {i}</p>')
        elif kind == 4:
            frags.append(
                f'<div class="sidebar related">'
                f'<a href="/a{i}">one</a> <a href="/b{i}">two</a> '
                f'<a href="/c{i}">three</a> tiny</div>'
            )
        elif kind == 5:
            frags.append(
                f'<div class="share-buttons">share this article {i} now</div>'
            )
        elif kind == 6:
            depth = rng.randrange(1, 12)
            frags.append(
                "<div>" * depth + f"<p>nested text {i}</p>" + "</div>" * depth
            )
        elif kind == 7:
            frags.append(f'<ul><li>item {i}a</li><li></li><li><a href="/l{i}"> </a></li></ul>')
        else:
            frags.append(f'<a href="/o{i}">outer <a href="/in{i}">inner {i}</a></a>')
    rng.shuffle(frags)
    return "<article>" + "".join(frags) + "</article>"


def _lazy_sanitize(root):
    """The pre-memo sanitize semantics, verbatim: same sweeps, memo=None
    everywhere (the fallback branches ARE the old implementation)."""
    from article_extractor_spark.extract.sanitize import _drop_failing, nodes_with_tags

    _drop_failing(root, ("a",), has_visible_content)
    _drop_failing(root, ("img",), has_valid_image_src)
    for node in nodes_with_tags(root, ("div", "section", "aside", "ul", "ol", "p")):
        if node is root or not looks_like_boilerplate(node):
            continue
        if node.parent is not None:
            node.parent.remove_child(node)
    _drop_failing(root, ("li", "p", "div"), has_visible_content)


def test_sanitize_memo_matches_lazy_on_random_trees():
    for seed in range(25):
        rng = random.Random(seed)
        html = _random_html(rng)
        a = parse_html(html)
        b = parse_html(html)
        sanitize_content(a)
        _lazy_sanitize(b)
        assert a.to_html() == b.to_html(), f"seed {seed} diverged"


def test_primed_memo_matches_lazy_node_metrics():
    rng = random.Random(99)
    root = parse_html(_random_html(rng, n_blocks=60))
    primed = DocMemo()
    primed.prime(root, img_pred=has_valid_image_src)
    lazy = DocMemo()
    nodes = [root] + list(root.iter_elements())
    for node in nodes:
        assert primed.text(node) == lazy.text(node)
        assert primed.link_density(node) == lazy.link_density(node)
        assert _node_link_density(node, primed) == _node_link_density(node)
        assert has_visible_content(node, primed) == has_visible_content(node)
        assert looks_like_boilerplate(node, primed) == looks_like_boilerplate(node)


def test_primed_linked_len_counts_nested_anchors_once_each():
    # query("a") returns BOTH outer and inner for nested links; the fold
    # must reproduce that double-count exactly (outer's text includes
    # inner's), not "fix" it.
    root = parse_html('<div><a href="/o">out <a href="/i">in</a></a></div>')
    memo = DocMemo()
    memo.prime(root)
    div = root.query("div")[0]
    lazy = sum(len(a.to_text(separator=" ", strip=True)) for a in div.query("a"))
    assert memo.linked_len(div) == lazy


def test_deep_nest_extraction_is_linear_time():
    # O(n x depth) on this input is ~25M node visits (tens of seconds);
    # the primed path does a handful of O(n) passes.  The generous bound
    # only fails if the complexity class regresses.
    html = "<div>" * 4000 + "<p>hello deep world</p>" + "</div>" * 4000
    t0 = time.monotonic()
    result = extract_document(html, url="https://example.test/deep")
    elapsed = time.monotonic() - t0
    assert result["success"]
    assert elapsed < 5.0, f"deep-nest extraction took {elapsed:.1f}s — complexity regression"


def test_deep_empty_nest_completes_fast():
    html = "<div>" * 4000 + "</div>" * 4000
    t0 = time.monotonic()
    extract_document(html, url="https://example.test/empty-deep")
    assert time.monotonic() - t0 < 5.0


def test_candidate_discovery_order_matches_lazy_fallback():
    # The reference's fallback runs one query() per tag — all divs, then
    # all sections (candidate_finder.py:78-85).  rank() is a stable sort
    # on score, so a section that precedes an equal-scoring div in
    # document order must NOT jump ahead of it.  Regression for the
    # primed single-pass bucketing (ADVICE r3).
    from article_extractor_spark.extract.candidates import discover_candidates

    body = "word " * 80  # > MIN_CANDIDATE_CHARS
    html = (
        "<body>"
        f"<section><p>{body}</p></section>"
        f"<div><p>{body}</p></div>"
        f"<section><p>{body}</p></section>"
        f"<div><p>{body}</p></div>"
        "</body>"
    )
    root = parse_html(html)
    primed = DocMemo()
    primed.prime(root)
    fast = discover_candidates(root, primed)

    root2 = parse_html(html)
    lazy = DocMemo()  # unprimed → elements() is None → query() fallback
    slow = discover_candidates(root2, lazy)

    fast_sig = [(n.name, id(n)) for n in fast]
    assert [n.name for n in fast] == [n.name for n in slow]
    # all divs precede all sections among the wrapper candidates
    names = [n.name for n in fast if n.name in ("div", "section")]
    assert names == sorted(names), f"wrapper order not div-first: {names}"
    assert len(fast_sig) == len(set(fast_sig))
