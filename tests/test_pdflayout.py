"""PDF text+layout parser tests.

Two independent lines of evidence (the lesson from the golden-corpus
circularity fix, VERDICT r2 item 3, applied from day one here):

1. HAND-WRITTEN PDF byte fixtures — literal bytes in this file, never
   produced by the module's own writer — so a writer/parser bug pair
   cannot cancel out.
2. Writer→parser round-trips (including the Spark operator) for the
   synthetic-corpus shape, whose end-to-end oracle lives in
   ``pdf_extract`` (queries.py).
"""

from __future__ import annotations

import zlib

from article_extractor_spark.extract.pdflayout import (
    body_lines,
    build_article_pdf,
    parse_pdf,
    pdf_escape,
)


def _fixture_pdf(content: bytes, *, flate: bool = False, extra: bytes = b"") -> bytes:
    """Assemble a one-page PDF around a raw content stream, by hand
    (no shared code with build_article_pdf beyond the PDF spec)."""
    filt = b""
    if flate:
        content = zlib.compress(content)
        filt = b" /Filter /FlateDecode"
    return (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R "
        + extra
        + b"/Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(content)).encode() + filt
        + b" >>\nstream\n" + content + b"\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF"
    )


def test_reading_order_beats_stream_order():
    # stream emits bottom block first; reading order must flip them
    content = (
        b"BT 72 100 Td (bottom line) Tj ET\n"
        b"BT 72 700 Td (top line) Tj ET\n"
        b"BT 300 700 Td (top right) Tj ET\n"
    )
    r = parse_pdf(_fixture_pdf(content))
    assert r["ok"] and r["n_pages"] == 1
    assert [s[1] for s in r["spans"]] == [
        "top line", "top right", "bottom line",
    ]
    assert [s[3] for s in r["spans"]] == [0, 1, 2]


def test_string_escapes_octal_and_continuation():
    content = (
        b"BT 72 700 Td "
        b"(par\\(en\\) back\\\\slash octal:\\101 tab:\\t cont:a\\\nb) Tj ET"
    )
    r = parse_pdf(_fixture_pdf(content))
    assert r["spans"][0][1] == (
        "par(en) back\\slash octal:A tab:\t cont:ab"
    )


def test_hex_string_and_tj_kerning():
    content = (
        b"BT 72 700 Td <48656C6C6F> Tj ET\n"
        b"BT 72 600 Td [(He) 120 (l) -30 (lo)] TJ ET"
    )
    r = parse_pdf(_fixture_pdf(content))
    assert [s[1] for s in r["spans"]] == ["Hello", "Hello"]


def test_line_advance_operators_build_lines():
    content = (
        b"BT 14 TL 72 700 Td (l1) Tj T* (l2) Tj 0 -14 TD (l3) Tj "
        b"T* (l4) Tj (l5)' ET"
    )
    r = parse_pdf(_fixture_pdf(content))
    assert r["spans"][0][1] == "l1\nl2\nl3\nl4\nl5"


def test_tm_sets_absolute_position():
    content = (
        b"BT 1 0 0 1 72 100 Tm (low) Tj ET\n"
        b"BT 1 0 0 1 72 710 Tm (high) Tj ET"
    )
    r = parse_pdf(_fixture_pdf(content))
    assert [s[1] for s in r["spans"]] == ["high", "low"]


def test_flate_decode_stream():
    content = b"BT 72 700 Td (compressed hello) Tj ET"
    r = parse_pdf(_fixture_pdf(content, flate=True))
    assert r["ok"] and r["spans"][0][1] == "compressed hello"


def test_image_xobject_ordered_by_ctm_position():
    content = (
        b"BT 72 100 Td (below image) Tj ET\n"
        b"q 100 0 0 50 72 400 cm /ImA Do Q\n"
        b"BT 72 700 Td (above image) Tj ET"
    )
    extra = (
        b"/Resources << /XObject << /ImA 9 0 R >> >> "
    )
    pdf = _fixture_pdf(content, extra=extra) + (
        b"\n9 0 obj << /Type /XObject /Subtype /Image /Width 1 "
        b"/Height 1 /Length 1 >>\nstream\nX\nendstream endobj\n"
    )
    r = parse_pdf(pdf)
    kinds = [(s[0], s[1] or s[2]) for s in r["spans"]]
    assert kinds == [
        ("text", "above image"), ("media", "ImA"), ("text", "below image"),
    ]


def test_multi_page_kids_order_and_offsets():
    # Kids list order (5 then 3) must override object-number order
    c2 = b"BT 72 700 Td (page two) Tj ET"
    c1 = b"BT 72 700 Td (page one) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [5 0 R 3 0 R] /Count 2 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(c2)).encode() + b" >>\nstream\n"
        + c2 + b"\nendstream endobj\n"
        b"5 0 obj << /Type /Page /Parent 2 0 R /Contents 6 0 R >> endobj\n"
        b"6 0 obj << /Length " + str(len(c1)).encode() + b" >>\nstream\n"
        + c1 + b"\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF"
    )
    r = parse_pdf(pdf)
    assert r["n_pages"] == 2
    assert [(s[1], s[3]) for s in r["spans"]] == [
        ("page one", 0), ("page two", 1),
    ]


def test_indirect_length_reference():
    content = b"BT 72 700 Td (via ref) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length 7 0 R >>\nstream\n" + content
        + b"\nendstream endobj\n"
        b"7 0 obj " + str(len(content)).encode() + b" endobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF"
    )
    r = parse_pdf(pdf)
    assert r["ok"] and r["spans"][0][1] == "via ref"


def test_malformed_inputs_become_failure_rows():
    assert parse_pdf(b"") == {
        "ok": False, "error": "PdfError: not a PDF (bad magic)",
        "n_pages": 0, "spans": [],
    }
    assert not parse_pdf(b"GIF89a...")["ok"]
    assert not parse_pdf(b"%PDF-1.4\n1 0 obj << >> endobj")["ok"]
    # corrupt flate stream
    bad = _fixture_pdf(b"BT (x) Tj ET").replace(
        b"/Length", b"/Filter /FlateDecode /Length"
    )
    assert not parse_pdf(bad)["ok"]


def test_writer_escape_round_trip():
    tricky = "a(b)c\\d\ne\tf (nested (parens)) end"
    assert "\\(" in pdf_escape(tricky)
    pdf = build_article_pdf("t1", tricky)
    r = parse_pdf(pdf)
    assert r["ok"]
    body = next(s[1] for s in r["spans"] if s[3] == 1)
    assert body == "\n".join(body_lines(tricky))


def test_writer_round_trip_both_codecs():
    text = "word " * 40  # 200 chars → 4 body lines
    for compress in (False, True):
        r = parse_pdf(build_article_pdf(3, text.strip(), compress=compress))
        assert r["ok"] and r["n_pages"] == 1
        assert [s[0] for s in r["spans"]] == [
            "text", "text", "media", "text",
        ]
        assert r["spans"][0][1] == "Doc 3"
        assert r["spans"][2][2] == "Im0"
        assert r["spans"][3][1] == "Page 1 of doc 3"


def test_spark_operator_spans_and_failure_rows(spark):
    from pyspark.sql import functions as F

    from article_extractor_spark.operators.pdf import (
        documents_as_pdf,
        extract_pdf_articles,
    )

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (3, "x " * 100)], "doc_id long, text string"
    )
    good = extract_pdf_articles(documents_as_pdf(docs))
    rows = {r["doc_id"]: r for r in good.collect()}
    assert rows[0]["success"] and rows[3]["success"]
    assert rows[0]["title"] == "Doc 0"
    # doc 0: 2 (title) + 3 (body) + 5 (footer)
    assert rows[0]["word_count"] == 10
    assert [s["kind"] for s in rows[0]["spans"]] == [
        "text", "text", "media", "text",
    ]
    # doc 3 is the FlateDecode arm (doc_id % 3 == 0) and wraps lines
    assert rows[3]["spans"][1]["text"].count("\n") == 3  # 199 chars → 4 lines

    bad = spark.createDataFrame(
        [(9, bytearray(b"not a pdf"))], "doc_id long, payload binary"
    )
    row = extract_pdf_articles(bad).collect()[0]
    assert not row["success"] and "bad magic" in row["error"]
    assert row["n_spans"] == 0

    # input pruning: a giant unused column must not reach the Arrow
    # stage (the select projects it away before mapInArrow)
    wide = bad.withColumn("giant_unused", F.lit("x"))
    plan = (
        extract_pdf_articles(wide)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "giant_unused" not in plan


def test_indirect_length_with_nonzero_generation():
    """'/Length 12 3 R' (nonzero generation) must NOT be read as a
    direct length of 12 — the stream is cut at endstream instead
    (ADVICE r3: the old lookahead only excluded generation 0)."""
    content = b"BT 72 700 Td (gen three ref) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length 12 3 R >>\nstream\n" + content
        + b"\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF"
    )
    r = parse_pdf(pdf)
    assert r["ok"] and r["spans"][0][1] == "gen three ref"


def test_unicode_text_round_trips_via_utf16_text_strings():
    """Non-latin-1 text (CJK, emoji, mixed) round-trips writer→parser
    via the PDF text-string convention (UTF-16BE + BOM, §7.9.2.2) —
    the format fuzzer found the writer used to crash on it."""
    text = "東京 data 数据 naïve café 🚀 mixed ascii tail"
    for compress in (False, True):
        r = parse_pdf(build_article_pdf(7, text, compress=compress))
        assert r["ok"], r["error"]
        body = r["spans"][1][1]
        assert body.replace("\n", "") == text
    # latin-1-only text must NOT grow a BOM (byte-for-byte unchanged)
    assert pdf_escape("plain ascii") == "plain ascii"
    # a hex text string with BOM decodes the same way
    from article_extractor_spark.extract.pdflayout import (
        _decode_text_string,
    )
    assert _decode_text_string(
        "\xfe\xff" + "東".encode("utf-16-be").decode("latin-1")
    ) == "東"
    # damaged UTF-16 (odd byte count) stays raw instead of raising
    assert _decode_text_string("\xfe\xff\x00") == "\xfe\xff\x00"


def test_latin1_text_starting_with_accidental_bom_round_trips():
    """Latin-1 text that *begins* with U+00FE U+00FF used to be emitted
    raw, where its first two bytes read back as a UTF-16BE BOM and the
    parser decoded the tail as CJK garbage ('þÿhell' → '桥汬').  The
    writer now routes BOM-prefixed strings through the UTF-16BE arm."""
    from article_extractor_spark.extract.pdflayout import _lex_string

    for s in ("\xfe\xffhell", "\xfe\xff", "\xfe\xffodd!", "\xfe\xff\xfe\xff"):
        lit = ("(" + pdf_escape(s) + ")").encode("latin-1")
        out, _ = _lex_string(lit, 0)
        assert out == s, (s, out)
    # full writer→parser round trip of a body with the accidental BOM
    r = parse_pdf(build_article_pdf(11, "\xfe\xff leading bom body"))
    assert r["ok"], r["error"]
    assert r["spans"][1][1].replace("\n", "") == "\xfe\xff leading bom body"
