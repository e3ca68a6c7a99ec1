"""The contract gate: per-document span-sequence equality on the
reference's golden fixture corpus (28 cases × 12 hosts).

Mirrors the reference's own corpus test (test_fixture_corpus.py:80-97)
but compares the north-rule invariant — ordered (kind, text, media_ref)
span tuples — instead of only normalized inner text.
"""

from __future__ import annotations

import pytest

from article_extractor_spark.extract import extract_document, html_fragment_to_spans

from conftest import GOLDEN_CASES


def span_tuples(spans: list[dict]) -> list[tuple]:
    return [(s["kind"], s["text"], s["media_ref"]) for s in spans]


def test_corpus_has_expected_minimum_size():
    # Corpus-size floor mirrors reference test_fixture_corpus.py:67-71.
    assert len(GOLDEN_CASES) >= 27


@pytest.mark.parametrize("case", GOLDEN_CASES, ids=lambda c: c.name)
def test_golden_span_equality(case):
    raw = case.raw_path.read_text(encoding="utf-8")
    expected_html = case.expected_path.read_text(encoding="utf-8")

    result = extract_document(raw, url=case.url)
    assert result["success"], f"extraction failed: {result['error']}"

    expected = html_fragment_to_spans(expected_html, base_url=case.url)
    assert span_tuples(result["spans"]) == span_tuples(expected)

    # spans are dense, 0-based, document-ordered
    assert [s["offset"] for s in result["spans"]] == list(
        range(len(result["spans"]))
    )


@pytest.mark.parametrize("case", GOLDEN_CASES, ids=lambda c: c.name)
def test_golden_title_nonempty(case):
    raw = case.raw_path.read_text(encoding="utf-8")
    result = extract_document(raw, url=case.url)
    assert result["title"].strip()
    assert result["word_count"] > 0
