"""Unit tests for the DOM kernel (parser, selector, serialization)."""

from __future__ import annotations

from article_extractor_spark.dom import parse_html


def test_basic_tree_and_query():
    doc = parse_html(
        '<html><body><div id="a" class="x y"><p>one</p><p>two</p></div></body></html>'
    )
    assert len(doc.query("p")) == 2
    assert doc.query("#a")[0].name == "div"
    assert doc.query(".y")[0].attrs["id"] == "a"
    assert doc.query("div.x")[0].attrs["id"] == "a"
    assert doc.query("p, div") and len(doc.query("p, div")) == 3


def test_attribute_selectors():
    doc = parse_html(
        '<div role="main"></div><meta property="og:title" content="T">'
        '<div id="header-menu-3"></div><div class="colArea--fullStory__wrapper x"></div>'
    )
    assert doc.query('[role="main"]')[0].name == "div"
    assert doc.query('meta[property="og:title"]')[0].attrs["content"] == "T"
    assert doc.query('[id^="header-menu-"]')[0].attrs["id"] == "header-menu-3"
    assert doc.query('[class*="fullStory__wrapper"]')[0].name == "div"


def test_auto_close_p_and_li():
    doc = parse_html("<body><p>one<p>two<ul><li>a<li>b</ul></body>")
    ps = doc.query("p")
    assert [p.to_text() for p in ps] == ["one", "two"]
    lis = doc.query("li")
    assert [li.to_text() for li in lis] == ["a", "b"]
    # lis are siblings, not nested
    assert lis[1].parent.name == "ul"


def test_div_closes_open_p():
    doc = parse_html("<body><p>text<div>inner</div></body>")
    p = doc.query("p")[0]
    assert p.to_text() == "text"
    assert not p.query("div")


def test_void_and_startend_tags():
    doc = parse_html('<p>a<br>b<img src="/x.jpg">c</p><hr/>')
    p = doc.query("p")[0]
    assert p.to_text() == "a b c"
    assert doc.query("img")[0].attrs["src"] == "/x.jpg"


def test_stray_end_tags_ignored():
    doc = parse_html("<div>a</span></div></div><p>b</p>")
    assert doc.query("div")[0].to_text() == "a"
    assert doc.query("p")[0].to_text() == "b"


def test_entities_decoded():
    doc = parse_html("<p>a &amp; b &lt;c&gt; &#8212; d</p>")
    assert doc.query("p")[0].to_text() == "a & b <c> — d"


def test_script_style_cdata():
    doc = parse_html(
        "<head><script>if (a < b) { x = '<p>no</p>'; }</script>"
        "<style>p { color: red; }</style></head><body><p>real</p></body>"
    )
    assert len(doc.query("p")) == 1
    script = doc.query("script")[0]
    assert "<p>no</p>" in script.to_text(strip=False)


def test_style_inside_p_is_transparent():
    # Matches the reference DOM behavior the infoworld golden fixture
    # depends on: style-in-p leaks its CSS as visible text.
    doc = parse_html("<body><p>before<style>.x { color: red }</style></p></body>")
    assert ".x { color: red }" in doc.query("p")[0].to_text()
    assert not doc.query("style")


def test_remove_child():
    doc = parse_html("<div><span>a</span><span>b</span></div>")
    div = doc.query("div")[0]
    span_a = div.query("span")[0]
    div.remove_child(span_a)
    assert div.to_text() == "b"
    assert span_a.parent is None


def test_bytes_input_with_fallback():
    assert parse_html("<p>héllo</p>".encode()).query("p")[0].to_text() == "héllo"
    latin = "<p>caf\xe9</p>".encode("latin-1")
    assert parse_html(latin).query("p")[0].to_text() == "café"


def test_to_html_roundtrip():
    doc = parse_html('<div class="c"><p>a &amp; b</p><img src="/i.png"></div>')
    html = doc.query("div")[0].to_html()
    assert html.startswith('<div class="c">')
    assert "&amp; b" in html
    reparsed = parse_html(html)
    assert reparsed.query("p")[0].to_text() == "a & b"
    assert reparsed.query("img")[0].attrs["src"] == "/i.png"


def test_to_markdown_basics():
    doc = parse_html(
        '<div><h2>Head</h2><p>Body <a href="/x">link</a> and <strong>bold</strong>.</p>'
        "<pre>code()</pre><ul><li>one</li></ul></div>"
    )
    md = doc.query("div")[0].to_markdown()
    assert "## Head" in md
    assert "[link](/x)" in md
    assert "**bold**" in md
    assert "```\ncode()\n```" in md
    assert "- one" in md


def test_table_structure():
    doc = parse_html(
        "<table><tr><td>a<td>b<tr><td>c</table>"
    )
    rows = doc.query("tr")
    assert len(rows) == 2
    assert [td.to_text() for td in doc.query("td")] == ["a", "b", "c"]


def test_duplicate_attrs_first_wins():
    doc = parse_html('<div class="first" class="second">x</div>')
    assert doc.query("div")[0].attrs["class"] == "first"
