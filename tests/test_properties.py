"""Property-based tests (hypothesis) for the extraction kernel.

The reference has no property tests (SURVEY.md §5); these pin the
engine's robustness invariants: extraction never raises, outputs are
structurally valid, spans are ordered and round-trip stable, and the
kernel is deterministic.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from article_extractor_spark.extract.pipeline import (
    ExtractOptions,
    extract_document,
)

OPTS = ExtractOptions(min_word_count=5)

# HTML-ish soup: tags from a small alphabet, text chunks, entities,
# broken fragments — deliberately malformed
_tag = st.sampled_from(
    ["div", "p", "article", "main", "span", "a", "img", "script", "nav",
     "li", "ul", "table", "h1", "style", "figure"]
)
_chunk = st.one_of(
    st.text(max_size=40),
    _tag.map(lambda t: f"<{t}>"),
    _tag.map(lambda t: f"</{t}>"),
    _tag.map(lambda t: f'<{t} class="c{hash(t) % 7}">'),
    st.sampled_from(["&amp;", "&#65;", "&nbsp;", "<!--x-->", "<!DOCTYPE html>",
                     '<img src="https://h/a.jpg">', "<p", "</", ">>"]),
)
_soup = st.lists(_chunk, max_size=60).map("".join)


@given(_soup)
@settings(max_examples=150, deadline=None)
def test_extract_never_raises_and_output_is_well_formed(html):
    result = extract_document(html, url="https://example.com/x", options=OPTS)
    assert isinstance(result["success"], bool)
    assert isinstance(result["title"], str)
    assert result["word_count"] >= 0
    offsets = [s["offset"] for s in result["spans"]]
    assert offsets == sorted(offsets) == list(range(len(offsets)))
    for s in result["spans"]:
        assert s["kind"] in ("text", "media")
        if s["kind"] == "media":
            assert s["media_ref"]


@given(_soup)
@settings(max_examples=50, deadline=None)
def test_extract_is_deterministic(html):
    a = extract_document(html, url="https://example.com/x", options=OPTS)
    b = extract_document(html, url="https://example.com/x", options=OPTS)
    assert a == b


@given(st.binary(max_size=200))
@settings(max_examples=50, deadline=None)
def test_extract_accepts_arbitrary_bytes(data):
    result = extract_document(data, url="https://example.com/x", options=OPTS)
    assert isinstance(result["success"], bool)


@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=300))
@settings(max_examples=100, deadline=None)
def test_excerpt_invariants(text):
    from article_extractor_spark.extract.pipeline import _excerpt

    out = _excerpt(text)
    assert len(out) <= 204  # 200 + "..."
    # whitespace-normalized prefix relationship
    normalized = " ".join(text.split())
    if len(normalized) <= 200:
        assert out == normalized
    else:
        assert out.endswith("...")


# -- fast tokenizer equivalence on structured HTML ---------------------

_attr_name = st.sampled_from(["class", "id", "href", "src", "data-x", "role"])
_attr_val = st.text(
    alphabet=st.characters(
        blacklist_characters='"<>&', blacklist_categories=("Cs",)
    ),
    max_size=12,
)
_text_chunk = st.text(
    alphabet=st.characters(blacklist_characters="<&", blacklist_categories=("Cs",)),
    max_size=30,
)


@st.composite
def _well_formed_html(draw, depth=0):
    """Recursively composed HTML with quoted attributes and clean text —
    the structured subset on which the fast tokenizer guarantees
    byte-identical trees vs stdlib."""
    if depth >= 3:
        return draw(_text_chunk)
    n = draw(st.integers(0, 4))
    parts = []
    for _ in range(n):
        kind = draw(st.integers(0, 3))
        if kind == 0:
            parts.append(draw(_text_chunk))
        elif kind == 1:
            parts.append(draw(st.sampled_from(
                ["<br>", "<hr/>", '<img src="x.png">', "<!--c-->",
                 "&amp;", "&#65;", "&nbsp;"]
            )))
        else:
            tag = draw(st.sampled_from(
                ["div", "p", "span", "article", "ul", "li", "a", "em",
                 "h2", "table", "td", "script", "style"]
            ))
            attrs = ""
            for _ in range(draw(st.integers(0, 2))):
                attrs += f' {draw(_attr_name)}="{draw(_attr_val)}"'
            if tag in ("script", "style"):
                body = draw(_text_chunk).replace("<", "")
            else:
                body = draw(_well_formed_html(depth=depth + 1))
            parts.append(f"<{tag}{attrs}>{body}</{tag}>")
    return "".join(parts)


@given(_well_formed_html())
@settings(max_examples=150, deadline=None)
def test_fast_tokenizer_matches_stdlib_on_structured_html(html):
    from article_extractor_spark.dom.parser import (
        parse_html,
        parse_html_stdlib,
    )

    assert parse_html(html).to_html() == parse_html_stdlib(html).to_html()


# --- Data-layout operators -------------------------------------------

def _py_morton(x: int, y: int, bits: int = 10) -> int:
    return sum(
        (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1))
        for i in range(bits)
    )


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1023),
            st.integers(min_value=0, max_value=1023),
        ),
        min_size=1,
        max_size=64,
    )
)
@settings(max_examples=50, deadline=None)
def test_zorder_sql_matches_mathematical_morton(pairs):
    """The SQL Morton generator must equal the mathematical bit
    interleave for arbitrary in-domain inputs (the Spark Column tree
    is pinned to the SQL by the zorder_layout oracle test, closing the
    triangle), and distinct pairs must map to distinct keys."""
    import duckdb

    from article_extractor_spark.functions.layout import zorder_sql

    con = duckdb.connect()
    vals = ", ".join(f"({x}, {y})" for x, y in pairs)
    got = [
        r[0]
        for r in con.execute(
            f"SELECT {zorder_sql('xu', 'yh')} "
            f"FROM (VALUES {vals}) t(xu, yh)"
        ).fetchall()
    ]
    want = [_py_morton(x, y) for x, y in pairs]
    assert got == want
    assert len(set(want)) == len(set(pairs))  # injective on the domain
