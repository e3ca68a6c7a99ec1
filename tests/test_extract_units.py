"""Per-operator unit tests for the extraction semantics (SURVEY.md §2.1),
mirroring the reference's unit-test strategy (SURVEY.md §5 tier 1)."""

from __future__ import annotations

from article_extractor_spark.dom import parse_html
from article_extractor_spark.extract import rules
from article_extractor_spark.extract.cleaning import (
    clean_document,
    extract_title,
    normalized_host,
    strip_selector_for_host,
    title_from_url,
)
from article_extractor_spark.extract.pipeline import ExtractOptions, _excerpt, extract_document
from article_extractor_spark.extract.sanitize import (
    has_valid_image_src,
    looks_like_boilerplate,
    sanitize_content,
)
from article_extractor_spark.extract.scoring import (
    DocMemo,
    candidate_score,
    class_weight,
    is_unlikely_candidate,
    paragraph_score,
    tag_score,
)
from article_extractor_spark.extract.spans import (
    dom_to_spans,
    html_fragment_to_spans,
    normalize_text,
    spans_to_html,
)
from article_extractor_spark.extract.urls import absolutize_srcset, absolutize_urls


def node_of(html: str, selector: str):
    return parse_html(html).query(selector)[0]


# --- E9 tag scores ---------------------------------------------------

def test_tag_scores():
    assert tag_score("div") == 5
    assert tag_score("ARTICLE") == 5
    assert tag_score("pre") == 3
    assert tag_score("ul") == -3
    assert tag_score("h2") == -5
    assert tag_score("p") == 0
    assert tag_score("unknown") == 0


# --- E8 class weight -------------------------------------------------

def test_class_weight_positive_negative():
    assert class_weight(node_of('<div class="article-content">x</div>', "div")) == 25
    assert class_weight(node_of('<div class="sidebar">x</div>', "div")) == -25
    # positive + negative cancel
    assert class_weight(node_of('<div class="content sidebar">x</div>', "div")) == 0
    assert class_weight(node_of('<div id="photo-box">x</div>', "div")) == 10


def test_class_weight_asset():
    # entry-content-asset: positive ("entry"/"content") +25, asset +25
    weight = class_weight(node_of('<div class="entry-content-asset">x</div>', "div"))
    assert weight == 50


def test_class_weight_empty():
    assert class_weight(node_of("<div>x</div>", "div")) == 0


# --- E7 unlikely candidates -----------------------------------------

def test_unlikely_candidate():
    assert is_unlikely_candidate(node_of('<div class="comment">x</div>', "div"))
    assert is_unlikely_candidate(node_of('<div id="newsletter-box">x</div>', "div"))
    # rescued by OK hints
    assert not is_unlikely_candidate(
        node_of('<div class="comment article">x</div>', "div")
    )
    assert not is_unlikely_candidate(node_of("<div>x</div>", "div"))


# --- E10 paragraph scoring -------------------------------------------

def test_paragraph_score_short_is_zero():
    memo = DocMemo()
    assert paragraph_score(node_of("<p>short</p>", "p"), memo) == 0.0


def test_paragraph_score_commas_and_length():
    memo = DocMemo()
    text = "word, " * 30  # 180 chars, 30 commas
    p = node_of(f"<p>{text}</p>", "p")
    score = paragraph_score(p, memo)
    # 1 base + 29 commas (text stripped: trailing ", " partially) + length bonus
    assert score >= 1 + 29 + 1


# --- E11/E12 candidate scoring + link density ------------------------

def test_candidate_score_link_density_penalty():
    memo = DocMemo()
    body_text = "This is a long sentence, with commas, for scoring. " * 4
    clean = node_of(f'<div><p>{body_text}</p></div>', "div")
    linked = node_of(
        f'<div><p>{body_text}</p><a href="/">{"link text " * 40}</a></div>', "div"
    )
    assert candidate_score(clean, memo) > candidate_score(linked, DocMemo())


def test_link_density():
    memo = DocMemo()
    div = node_of('<div><a href="/">half</a> half</div>', "div")
    assert abs(memo.link_density(div) - 4 / 9) < 1e-9


# --- E3 cleaning ------------------------------------------------------

def test_clean_document_strips_boilerplate_tags_and_roles():
    doc = parse_html(
        "<body><nav>n</nav><script>s</script><aside>a</aside>"
        '<div role="dialog">d</div><main><p>keep</p></main></body>'
    )
    clean_document(doc, rules.STRIP_SELECTOR_DEFAULT)
    assert not doc.query("nav") and not doc.query("script") and not doc.query("aside")
    assert not doc.query('[role="dialog"]')
    assert doc.query("p")[0].to_text() == "keep"


def test_host_strip_selector_overrides():
    assert "aside" not in strip_selector_for_host("technologyreview.com")
    assert "footer" in strip_selector_for_host("technologyreview.com")
    for kept in ("aside", "footer", "nav", "header"):
        assert kept not in strip_selector_for_host("infoworld.com")
    assert "aside" in strip_selector_for_host("example.com")


# --- E5 title cascade -------------------------------------------------

def test_title_cascade():
    og = parse_html(
        '<head><meta property="og:title" content="OG Title"><title>T</title></head>'
        "<body><h1>H1</h1></body>"
    )
    assert extract_title(og) == "OG Title"

    h1 = parse_html("<head><title>T - Site</title></head><body><h1>The H1</h1></body>")
    assert extract_title(h1) == "The H1"

    title_only = parse_html("<head><title>Real Title - Site Name</title></head><body></body>")
    assert extract_title(title_only) == "Real Title"

    empty = parse_html("<body></body>")
    assert extract_title(empty, "https://x.com/my-great_post") == "My Great Post"
    assert extract_title(empty, "") == "Untitled"
    assert extract_title(empty, "https://x.com/") == "Untitled"


def test_title_from_url():
    assert title_from_url("https://a.com/posts/hello-world") == "Hello World"
    assert title_from_url("https://a.com/") is None


def test_normalized_host():
    assert normalized_host("https://www.Example.COM/x") == "example.com"
    assert normalized_host("http://sub.site.org/p") == "sub.site.org"


# --- E18 image validity ----------------------------------------------

def test_image_validity_rules():
    def img(src: str):
        return node_of(f'<div><img src="{src}"></div>', "img")

    assert has_valid_image_src(img("https://a.com/photo.jpg"))
    assert has_valid_image_src(img("/images/pic.png"))
    assert has_valid_image_src(img("./rel/pic.webp"))
    assert has_valid_image_src(img("https://cdn.a.com/abc123"))  # no extension: ok
    assert not has_valid_image_src(img("https://a.com/pixel.gif"))
    assert not has_valid_image_src(img("https://tracking.a.com/img.jpg"))
    assert not has_valid_image_src(img("t.gif"))  # tiny basename
    assert has_valid_image_src(img("bg.jpg"))
    assert not has_valid_image_src(img("data:text/html,<script>"))
    assert has_valid_image_src(img("data:image/png;base64,iVBOR"))
    assert not has_valid_image_src(node_of("<div><img alt='x'></div>", "img"))


# --- E17/E19/E20 sanitize ---------------------------------------------

def test_sanitize_removes_empty_links_and_blocks():
    doc = parse_html(
        '<div id="root"><p>Real content here with words.</p>'
        '<a href="/empty"></a><p></p><li></li>'
        '<img src="pixel.gif"><div>  </div></div>'
    )
    root = doc.query("#root")[0]
    sanitize_content(root)
    assert not root.query("a")
    assert not root.query("img")
    assert len(root.query("p")) == 1


def test_sanitize_keeps_link_with_valid_image():
    doc = parse_html(
        '<div id="root"><p>Text content, enough for a paragraph.</p>'
        '<a href="/x"><img src="/photo.jpg"></a></div>'
    )
    root = doc.query("#root")[0]
    sanitize_content(root)
    assert root.query("a") and root.query("img")


def test_boilerplate_heuristic():
    newsletter = node_of(
        '<div class="newsletter"><p>Subscribe to our free newsletter today!</p>'
        '<a href="/sub">Sign up</a></div>',
        ".newsletter",
    )
    assert looks_like_boilerplate(newsletter)

    article_body = node_of(
        f'<div class="story"><p>{"Sentence with words. " * 100}</p></div>', ".story"
    )
    assert not looks_like_boilerplate(article_body)


# --- E16 URL absolutization -------------------------------------------

def test_absolutize_urls():
    doc = parse_html(
        '<div><a href="/rel">x</a><img src="../i.png" srcset="a.jpg 1x, b.jpg 2x">'
        '<iframe src="//cdn.com/f"></iframe></div>'
    )
    div = doc.query("div")[0]
    absolutize_urls(div, "https://site.com/articles/post/")
    assert div.query("a")[0].attrs["href"] == "https://site.com/rel"
    assert div.query("img")[0].attrs["src"] == "https://site.com/articles/i.png"
    assert (
        div.query("img")[0].attrs["srcset"]
        == "https://site.com/articles/post/a.jpg 1x, https://site.com/articles/post/b.jpg 2x"
    )
    assert div.query("iframe")[0].attrs["src"] == "https://cdn.com/f"


def test_absolutize_srcset_no_descriptor():
    assert (
        absolutize_srcset("/a.jpg, /b.jpg 2x", "https://s.com/")
        == "https://s.com/a.jpg, https://s.com/b.jpg 2x"
    )


# --- E24 span codec ---------------------------------------------------

def test_dom_to_spans_interleaving():
    doc = parse_html(
        "<article><p>First paragraph text.</p>"
        '<img src="https://a.com/one.jpg">'
        "<p>Second paragraph text.</p>"
        '<figure><img src="https://a.com/two.jpg"><figcaption>Caption.</figcaption></figure>'
        "<p>Tail.</p></article>"
    )
    spans = dom_to_spans(doc.query("article")[0])
    kinds = [s["kind"] for s in spans]
    assert kinds == ["text", "media", "text", "media", "text"]
    assert spans[1]["media_ref"] == "https://a.com/one.jpg"
    assert spans[2]["text"] == "Second paragraph text."
    assert spans[4]["text"] == "Caption. Tail."
    assert [s["offset"] for s in spans] == [0, 1, 2, 3, 4]


def test_imgs_without_src_skipped_in_spans():
    doc = parse_html("<div><p>Some text.</p><img alt='x'><p>More.</p></div>")
    spans = dom_to_spans(doc.query("div")[0])
    assert [s["kind"] for s in spans] == ["text"]
    assert spans[0]["text"] == "Some text. More."


def test_normalize_text():
    assert normalize_text("a  \n b &amp; c ,  d .") == "a b & c, d."
    assert normalize_text("  x  !") == "x!"


def test_normalize_text_matches_regex_reference():
    """The str-op fast path must be bit-identical to the original
    two-regex normalization (unescape → \\s+ collapse+strip → strip
    space before punctuation) — hypothesis + adversarial battery,
    plus the exhaustive regex-\\s == str.isspace charset claim the
    fast path's correctness rests on."""
    import html as html_mod
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    rx_ws = re.compile(r"\s+")
    rx_p = re.compile(r"\s+([,.;:!?])")

    def reference(t: str) -> str:
        t = html_mod.unescape(t)
        t = rx_ws.sub(" ", t).strip()
        return rx_p.sub(r"\1", t)

    battery = [
        "", " ", "\t\n\r\f\v", "\xa0  　",
        "a\xa0b", "&nbsp;,", "&#10;.", "a &amp;&amp; b ,,  ..",
        " , . ; : ! ? ", "x , ,", "a  .  b  !", "&#x2003;!",
        "no punct at all", "&bogus; &amp;", "\x1c\x1d\x1e\x1f!",
    ]
    for t in battery:
        assert normalize_text(t) == reference(t), repr(t)

    @settings(max_examples=300, deadline=None)
    @given(
        st.text(
            alphabet=st.sampled_from(
                list(" \t\n\xa0 abc&;#,.:!?<>123nbsped")
            ),
            max_size=40,
        )
    )
    def prop(t):
        assert normalize_text(t) == reference(t), repr(t)

    prop()

    rx_s = re.compile(r"\s")
    assert all(
        bool(rx_s.match(chr(i))) == chr(i).isspace()
        for i in range(0x110000)
    )


def test_spans_roundtrip_through_html():
    spans = [
        {"kind": "text", "text": "Hello world, this is text.", "media_ref": "", "offset": 0},
        {"kind": "media", "text": "", "media_ref": "https://a.com/x.jpg", "offset": 1},
        {"kind": "text", "text": "After image.", "media_ref": "", "offset": 2},
    ]
    html = spans_to_html(spans)
    back = html_fragment_to_spans(html)
    assert [(s["kind"], s["text"], s["media_ref"]) for s in back] == [
        (s["kind"], s["text"], s["media_ref"]) for s in spans
    ]


# --- E26-E29 pipeline-level behavior ----------------------------------

def test_extract_simple_article():
    html = (
        "<html><head><title>My Post - Blog</title></head><body>"
        "<nav>Home About Contact</nav>"
        '<main><article class="post-content">'
        + "".join(
            f"<p>Paragraph {i} has plenty of words, commas, and sentence structure "
            f"to score well in readability heuristics, naturally.</p>"
            for i in range(8)
        )
        + '<img src="https://pics.com/photo.jpg"></article></main>'
        "<footer>Copyright</footer></body></html>"
    )
    result = extract_document(html, url="https://blog.com/my-post")
    assert result["success"]
    assert result["title"] == "My Post"
    kinds = [s["kind"] for s in result["spans"]]
    assert kinds == ["text", "media"]
    assert "Paragraph 0" in result["spans"][0]["text"]
    assert "Home About" not in result["spans"][0]["text"]
    assert result["word_count"] > 100
    assert result["excerpt"]


def test_extract_failure_on_empty():
    result = extract_document("", url="https://x.com/a")
    assert not result["success"]
    assert result["spans"] == []
    assert result["error"]


def test_extract_never_raises_on_garbage():
    for garbage in ["<<<>>>", "<div", "\x00\x01", "a" * 10, "<html>" * 50]:
        result = extract_document(garbage, url="https://x.com/g")
        assert isinstance(result["success"], bool)


def test_min_word_count_warning():
    html = (
        "<body><main><article><p>"
        + "Short article, but long enough for candidacy threshold. " * 12
        + "</p></article></main></body>"
    )
    result = extract_document(html, url="", options=ExtractOptions(min_word_count=150))
    assert result["success"]
    assert result["word_count"] < 150
    assert any("minimum word count" in w for w in result["warnings"])


def test_excerpt_word_boundary():
    text = "word " * 100
    out = _excerpt(text)
    assert out.endswith("...")
    assert len(out) <= 204


def test_bytes_input():
    html = (
        "<body><main><p>"
        + "Unicode café content with enough words to pass thresholds, truly. " * 12
        + "</p></main></body>"
    ).encode("utf-8")
    result = extract_document(html, url="https://x.com/b")
    assert result["success"]
    assert "café" in result["spans"][0]["text"]


def test_extract_options_api_parity():
    """Option-surface parity with the reference ExtractionOptions
    (types.py:34-42): the declared-but-algorithm-inert knobs exist and
    participate in cache identity (extraction_cache.py:40-52)."""
    from article_extractor_spark.extract.pipeline import ExtractOptions

    o = ExtractOptions()
    assert o.min_word_count == 150  # server default (server.py:360-366)
    assert o.min_char_threshold == 500
    assert o.include_images is True
    assert o.include_code_blocks is True
    key_a = o.cache_key_fields()
    key_b = ExtractOptions(include_images=False).cache_key_fields()
    assert key_a != key_b  # include_* distinguishes cached responses

    r = extract_document(
        "<body><main><p>"
        + "Words words, more words, for thresholds to pass easily. " * 10
        + "</p></main></body>",
        options=ExtractOptions(min_word_count=10),
    )
    assert r["success"]
    assert r["author"] is None and r["date_published"] is None
    assert r["language"] is None


def test_compute_floor_width_is_sized_by_bytes():
    """The respread width carries >=2 MB compressed per task, clamped
    to [cores, cores*_WAVES]; tables under the 16 MB minimum skip the
    table-level floor entirely (test-scale tables hold seconds of CPU;
    the fixed shuffle + task-launch cost dominates — measured +0.84 s
    at 128 tasks vs +0.27 s at 32 on a sub-second query), and an
    unknown size keeps the conservative full fan for the known-heavy
    CPU-bound operator stages (extraction/pdf/dispatch)."""
    from article_extractor_spark.operators.parallelism import _WAVES, _width

    cores = 32
    # test-scale table: 3 byte-tasks, 7 row-tasks -> under cores/2, off
    assert _width(cores, 6 << 20, 50_000) == 0
    assert _width(cores, 0, 0) == 0
    # compressible text: 6 MB hides 500k rows -> rows win, 62 tasks
    assert _width(cores, 6 << 20, 500_000) == 62
    # embeddings-like: bytes win (25 tasks) -> clamp up to cores
    assert _width(cores, 52 << 20, 100_000) == cores
    assert _width(cores, 100 << 20, None) == 50  # 50 tasks, in range
    assert _width(cores, 10 << 30, None) == cores * _WAVES  # clamp down
    assert _width(cores, None, None) == cores * _WAVES  # unknown -> full fan


def test_table_extraction_grid_semantics():
    """Table extractor edge cases the synthetic corpus can't reach:
    nested tables stay separate (nearest-ancestor scoping), colspan
    advances col_idx (invalid/absent colspan counts as 1), implicit
    cell closes parse, th flags headers, garbage yields no rows."""
    from article_extractor_spark.operators.tables import (
        extract_tables_rows,
    )

    html = """
    <table>
      <tr><th colspan="2">a</th><th>b</th></tr>
      <tr><td>c</td><td colspan="zzz">d</td>
          <td><table><tr><td>inner</td></tr></table>outer</td></tr>
    </table>
    <table><tr><td>second</td></tr></table>
    """
    rows = extract_tables_rows(html, 7)
    # table order: outer (0), nested (1), second (2) — document order
    # of <table> starts
    by_table = {}
    for r in rows:
        by_table.setdefault(r[1], []).append(r)
    assert set(by_table) == {0, 1, 2}
    outer = by_table[0]
    # header row: 'a' at col 0 (span 2), 'b' at col 2
    assert (7, 0, 0, 0, True, "a") in outer
    assert (7, 0, 0, 2, True, "b") in outer
    # body row: c@0, d@1 (invalid colspan -> 1), nested-holder@2
    assert (7, 0, 1, 0, False, "c") in outer
    assert (7, 0, 1, 1, False, "d") in outer
    holder = [r for r in outer if r[2] == 1 and r[3] == 2]
    assert len(holder) == 1 and "outer" in holder[0][5]
    # the nested table's cell belongs to table 1, not the outer grid
    assert by_table[1] == [(7, 1, 0, 0, False, "inner")]
    assert by_table[2] == [(7, 2, 0, 0, False, "second")]

    # implicit closes (HTML-spec auto-closing): <tr><td>a<td>b</tr>
    implicit = extract_tables_rows(
        "<table><tr><td>a<td>b<tr><td>c</table>", 1
    )
    assert [(r[2], r[3], r[5]) for r in implicit] == [
        (0, 0, "a"), (0, 1, "b"), (1, 0, "c"),
    ]

    # crash-freedom on garbage
    assert extract_tables_rows("<table><tr><td", 2) in ([], [(2, 0, 0, 0, False, "")])
    assert extract_tables_rows("\x00\xff not html", 3) == []
