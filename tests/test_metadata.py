"""Page-metadata extraction kernel (extract/metadata.py).

The Spark surface + analytic oracle live in queries.page_metadata;
these pin the kernel's shape-handling corners directly.
"""

from article_extractor_spark.extract.metadata import (
    META_FIELDS,
    extract_page_metadata,
)


def test_full_page_all_fields():
    html = (
        "<html><head>"
        '<meta property="og:title" content="T1"/>'
        '<meta property="og:description" content="D1"/>'
        '<meta property="og:image" content="http://x/i.jpg"/>'
        '<link rel="canonical" href="http://x/c"/>'
        '<meta property="article:published_time" content="2026-01-02T12:00:00Z"/>'
        '<script type="application/ld+json">'
        '{"@type":"NewsArticle","headline":"H1",'
        '"author":{"@type":"Person","name":"A1"}}</script>'
        "</head><body><p>x</p></body></html>"
    )
    m = extract_page_metadata(html)
    assert m == {
        "og_title": "T1",
        "og_description": "D1",
        "og_image": "http://x/i.jpg",
        "canonical_url": "http://x/c",
        "published_time": "2026-01-02T12:00:00Z",
        "headline": "H1",
        "author": "A1",
    }


def test_first_wins_on_duplicate_meta():
    html = (
        '<head><meta property="og:title" content="FIRST"/>'
        '<meta property="og:title" content="SECOND"/></head>'
    )
    assert extract_page_metadata(html)["og_title"] == "FIRST"


def test_author_shapes():
    # bare string
    h = (
        '<script type="application/ld+json">'
        '{"@type":"Article","author":"Plain"}</script>'
    )
    assert extract_page_metadata(h)["author"] == "Plain"
    # list of Person objects: first wins
    h = (
        '<script type="application/ld+json">'
        '{"@type":"Article","author":[{"name":"P1"},{"name":"P2"}]}'
        "</script>"
    )
    assert extract_page_metadata(h)["author"] == "P1"


def test_graph_envelope_and_type_list():
    h = (
        '<script type="application/ld+json">'
        '{"@context":"https://schema.org","@graph":['
        '{"@type":"WebSite","name":"S"},'
        '{"@type":["BlogPosting","CreativeWork"],"headline":"G1"}]}'
        "</script>"
    )
    assert extract_page_metadata(h)["headline"] == "G1"


def test_malformed_jsonld_skipped_next_block_wins():
    h = (
        '<script type="application/ld+json">{broken</script>'
        '<script type="application/ld+json">'
        '{"@type":"Article","headline":"OK"}</script>'
    )
    assert extract_page_metadata(h)["headline"] == "OK"


def test_non_article_jsonld_ignored():
    h = (
        '<script type="application/ld+json">'
        '{"@type":"Organization","name":"Corp"}</script>'
    )
    m = extract_page_metadata(h)
    assert m["headline"] is None and m["author"] is None


def test_empty_and_garbage_inputs():
    assert extract_page_metadata("") == dict.fromkeys(META_FIELDS)
    assert extract_page_metadata("<p>no meta</p>") == dict.fromkeys(
        META_FIELDS
    )
    assert extract_page_metadata(b"\x00\xff\xfe") == dict.fromkeys(
        META_FIELDS
    )


def test_empty_content_ignored():
    h = (
        '<meta property="og:title" content=""/>'
        '<meta property="og:title" content="REAL"/>'
    )
    assert extract_page_metadata(h)["og_title"] == "REAL"


def test_meta_name_fallback():
    # some CMSes emit name= instead of property= for og tags
    h = '<meta name="og:description" content="ND"/>'
    assert extract_page_metadata(h)["og_description"] == "ND"


def test_canonical_rel_token_list_case_insensitive():
    h = '<link rel="Canonical alternate" href="http://x/c"/>'
    assert extract_page_metadata(h)["canonical_url"] == "http://x/c"
    # substring of another token must NOT match
    h = '<link rel="canonicalish" href="http://x/n"/>'
    assert extract_page_metadata(h)["canonical_url"] is None


def test_jsonld_mime_variants():
    for mime in (
        "application/ld+json ",
        " Application/LD+JSON",
        "application/ld+json;charset=utf-8",
    ):
        h = (
            f'<script type="{mime}">'
            '{"@type":"Article","headline":"V"}</script>'
        )
        assert extract_page_metadata(h)["headline"] == "V", mime
    # a DIFFERENT mime must not be parsed
    h = (
        '<script type="application/json">'
        '{"@type":"Article","headline":"NO"}</script>'
    )
    assert extract_page_metadata(h)["headline"] is None


def test_meta_field_names_pinned_to_operator_schema():
    # operators/extraction.py mirrors META_FIELDS without importing the
    # kernel at module load; this pin keeps the two from drifting
    from article_extractor_spark.operators.extraction import (
        _META_FIELD_NAMES,
    )

    assert tuple(_META_FIELD_NAMES) == tuple(META_FIELDS)


def test_fused_emit_metadata_matches_standalone_kernel():
    from article_extractor_spark.extract.pipeline import (
        ExtractOptions,
        extract_document,
    )

    html = (
        "<html><head>"
        '<meta property="og:title" content="T9"/>'
        '<link rel="canonical" href="http://x/c9"/>'
        '<script type="application/ld+json">'
        '{"@type":"Article","headline":"H9","author":"A9"}</script>'
        "</head><body><article><p>"
        + ("word " * 200)
        + "</p></article></body></html>"
    )
    fused = extract_document(
        html, "", ExtractOptions(min_word_count=10, emit_metadata=True)
    )
    assert fused["success"]
    assert fused["page_meta"] == extract_page_metadata(html)
    # the head is CLEANED out of the extraction output, so the fused
    # read must have happened before clean_document — og content must
    # not appear in the spans
    assert all("T9" not in (s.get("text") or "") for s in fused["spans"])
    # disabled → None, and absent from the algorithm (cache key stable)
    off = extract_document(html, "", ExtractOptions(min_word_count=10))
    assert off["page_meta"] is None
    assert (
        ExtractOptions(min_word_count=10, emit_metadata=True).cache_key_fields()
        == ExtractOptions(min_word_count=10).cache_key_fields()
    )


def test_fused_metadata_on_thin_and_empty_docs():
    from article_extractor_spark.extract.pipeline import (
        ExtractOptions,
        extract_document,
    )

    # head-only fragment: extraction falls back to the document root
    # (success + min-word warning) and the provenance rides along
    html = '<head><meta property="og:title" content="Ghost"/></head>'
    r = extract_document(html, "", ExtractOptions(emit_metadata=True))
    assert r["success"] and r["warnings"]
    assert r["page_meta"]["og_title"] == "Ghost"
    # empty doc: a real failure row still carries the (all-None)
    # metadata struct — attached, not missing
    r = extract_document("", "", ExtractOptions(emit_metadata=True))
    assert not r["success"]
    assert r["page_meta"] == dict.fromkeys(META_FIELDS)
