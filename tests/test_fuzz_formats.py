"""Crash-freedom fuzzing for the binary-format parsers (PDF, WARC).

Same contract the DOM fuzzer (test_fuzz_extraction.py) pins for HTML:
at corpus scale a damaged payload must become a failure ROW, never a
task death.  ``parse_pdf`` promises ``ok=False`` + diagnostic for
malformed input; ``parse_warc`` promises ``ok=False`` records when
framing breaks.  These tests drive both parsers over seeded byte-level
mutations of valid writer-built payloads (truncation, bit flips,
splices, deletions, duplicated regions) plus pure-garbage blobs,
asserting the result SHAPE and that no exception ever escapes.

The mutations deliberately target framing-sensitive regions: PDF xref
keywords, /Length values, stream delimiters; WARC version lines and
Content-Length headers — the bytes whose corruption exercises every
recovery branch.
"""

from __future__ import annotations

import random
import zlib

from article_extractor_spark.extract.pdflayout import (
    build_article_pdf,
    parse_pdf,
)
from article_extractor_spark.sources.warc import build_warc, parse_warc

N_BASE = 60          # distinct valid base payloads per format
N_MUT_PER_BASE = 24  # seeded mutations of each base
N_GARBAGE = 400      # pure-random blobs per format

_WORDS = (
    "committee report annual findings debate vote article content "
    "body text paragraph détails naïve café 東京 数据 stream endstream "
    "obj endobj WARC/1.0 Content-Length"
).split()


def _text_for(rng: random.Random) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(rng.randint(5, 120)))


def _mutate(rng: random.Random, data: bytes) -> bytes:
    """One seeded structural mutation of a byte payload."""
    if not data:
        return data
    op = rng.randrange(7)
    n = len(data)
    if op == 0:  # truncate at an arbitrary point
        return data[: rng.randrange(n)]
    if op == 1:  # flip 1-8 random bytes
        b = bytearray(data)
        for _ in range(rng.randint(1, 8)):
            i = rng.randrange(n)
            b[i] ^= rng.randint(1, 255)
        return bytes(b)
    if op == 2:  # delete a random slice
        i = rng.randrange(n)
        j = min(n, i + rng.randint(1, max(1, n // 4)))
        return data[:i] + data[j:]
    if op == 3:  # duplicate a random slice in place
        i = rng.randrange(n)
        j = min(n, i + rng.randint(1, 64))
        return data[:j] + data[i:j] + data[j:]
    if op == 4:  # splice random bytes into the middle
        i = rng.randrange(n)
        blob = bytes(rng.randrange(256) for _ in range(rng.randint(1, 48)))
        return data[:i] + blob + data[i:]
    if op == 5:  # corrupt a framing-sensitive token, if present
        for tok in (
            b"Content-Length", b"/Length", b"stream", b"WARC/1.0",
            b"endobj", b"\r\n\r\n",
        ):
            at = data.find(tok)
            if at >= 0:
                b = bytearray(data)
                b[at + rng.randrange(len(tok))] ^= 0xFF
                return bytes(b)
        return data[::-1]
    # op == 6: swap two random regions
    i, j = sorted((rng.randrange(n), rng.randrange(n)))
    k = rng.randint(1, 32)
    return data[:i] + data[j : j + k] + data[i + k : j] + data[i : i + k] + data[j + k :]


def _garbage(rng: random.Random, prefix: bytes = b"") -> bytes:
    return prefix + bytes(
        rng.randrange(256) for _ in range(rng.randint(0, 600))
    )


def _assert_pdf_contract(data: bytes) -> None:
    r = parse_pdf(data)  # must not raise, whatever the bytes
    assert set(r) >= {"ok", "error", "n_pages", "spans"}
    assert isinstance(r["ok"], bool)
    if not r["ok"]:
        assert r["error"]
    for s in r["spans"]:
        kind, text, media_ref, offset = s
        assert kind in ("text", "media")
        assert isinstance(offset, int)


def _assert_warc_contract(data: bytes) -> None:
    records = parse_warc(data)  # must not raise, whatever the bytes
    assert isinstance(records, list)
    for rec in records:
        assert set(rec) >= {
            "ok", "uri", "warc_type", "http_status", "content_type",
            "body", "error",
        }
        if not rec["ok"]:
            assert rec["error"]


def test_pdf_parser_never_crashes_on_mutated_payloads():
    rng = random.Random(0xBEEF)
    for base_i in range(N_BASE):
        pdf = build_article_pdf(
            base_i, _text_for(rng), compress=base_i % 3 == 0
        )
        _assert_pdf_contract(pdf)
        for _ in range(N_MUT_PER_BASE):
            mutated = pdf
            for _ in range(rng.randint(1, 3)):
                mutated = _mutate(rng, mutated)
            _assert_pdf_contract(mutated)


def test_pdf_parser_never_crashes_on_garbage():
    rng = random.Random(0xF00D)
    for i in range(N_GARBAGE):
        # half with a valid magic so parsing proceeds past the gate
        prefix = b"%PDF-1.4\n" if i % 2 else b""
        _assert_pdf_contract(_garbage(rng, prefix))


def test_pdf_parser_adversarial_structures():
    """Hand-aimed nasties: huge /Length, deflate bombs of garbage,
    self-referential pages, unterminated dict/stream tokens."""
    cases = [
        b"%PDF-1.4\n1 0 obj << /Length 99999999999999999999 >>\n"
        b"stream\nhi\nendstream endobj\ntrailer << /Root 1 0 R >>",
        b"%PDF-1.4\n1 0 obj << /Type /Pages /Kids [1 0 R] /Count 1 >>"
        b" endobj\n2 0 obj << /Type /Catalog /Pages 1 0 R >> endobj\n",
        b"%PDF-1.4\n3 0 obj << /Type /Page /Parent 3 0 R /Contents 3 0 R"
        b" >> endobj\n",
        b"%PDF-1.4\n4 0 obj << /Filter /FlateDecode /Length 20 >>\n"
        b"stream\n" + b"\x78\x9c" + b"\xff" * 18
        + b"\nendstream endobj\n",
        b"%PDF-1.4\n5 0 obj << /Type /Page /Contents 6 0 R >> endobj\n"
        b"6 0 obj << /Length 5 >>\nstream\nBT (x  endstream endobj\n",
        b"%PDF-1.4\n" + b"<<" * 4000,
        b"%PDF-1.4\n7 0 obj << /Type /Page /Contents 8 0 R >> endobj\n"
        b"8 0 obj << >>\nstream\nBT /F1 1e400 Tf 1e400 1e400 Td (x) Tj"
        b" ET\nendstream endobj\n",
    ]
    # a real deflate stream whose expansion is large (bomb-shaped but
    # bounded): parser must survive it, not die
    bomb = zlib.compress(b"A" * 5_000_000, 9)
    cases.append(
        b"%PDF-1.4\n9 0 obj << /Type /Catalog /Pages 10 0 R >> endobj\n"
        b"10 0 obj << /Type /Pages /Kids [11 0 R] /Count 1 >> endobj\n"
        b"11 0 obj << /Type /Page /Contents 12 0 R >> endobj\n"
        b"12 0 obj << /Filter /FlateDecode /Length "
        + str(len(bomb)).encode() + b" >>\nstream\n" + bomb
        + b"\nendstream endobj\n"
    )
    for data in cases:
        _assert_pdf_contract(data)


def test_warc_parser_never_crashes_on_mutated_payloads():
    rng = random.Random(0xCAFE)
    for base_i in range(N_BASE):
        docs = [
            (
                f"https://ex.org/{base_i}/{k}",
                f"<html><body>{_text_for(rng)}</body></html>".encode(),
                200 if k % 3 else 404,
            )
            for k in range(rng.randint(1, 4))
        ]
        warc = build_warc(docs, per_record_gzip=base_i % 2 == 0)
        _assert_warc_contract(warc)
        for _ in range(N_MUT_PER_BASE):
            mutated = warc
            for _ in range(rng.randint(1, 3)):
                mutated = _mutate(rng, mutated)
            _assert_warc_contract(mutated)


def test_warc_parser_never_crashes_on_garbage():
    rng = random.Random(0xDEAD)
    for i in range(N_GARBAGE):
        prefix = b"WARC/1.0\r\n" if i % 2 else b""
        if i % 4 == 3:
            prefix = b"\x1f\x8b"  # gzip magic, bogus member
        _assert_warc_contract(_garbage(rng, prefix))


def test_warc_parser_adversarial_framing():
    cases = [
        # Content-Length far beyond the buffer
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999999999"
        b"\r\n\r\nshort",
        # negative / non-numeric / missing lengths
        b"WARC/1.0\r\nContent-Length: -5\r\n\r\nbody\r\n\r\n",
        b"WARC/1.0\r\nContent-Length: 1e9\r\n\r\nbody\r\n\r\n",
        b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n",
        # huge header block with no terminator
        b"WARC/1.0\r\n" + b"X-A: b\r\n" * 5000,
        # zero-length record followed by garbage
        b"WARC/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n\xff\xfe\xfd",
        # nested WARC magic inside a correctly framed body
        b"WARC/1.0\r\nContent-Length: 30\r\n\r\n"
        b"WARC/1.0\r\nContent-Length: 99\r\n\r\n\r\n",
    ]
    for data in cases:
        _assert_warc_contract(data)
