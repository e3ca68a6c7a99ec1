"""WARC source tests: hand-framed records (parser-independent of the
module's own writer) + writer round-trips + the Spark expansion."""

from __future__ import annotations

import gzip

from article_extractor_spark.sources.warc import (
    build_warc,
    build_warc_record,
    parse_warc,
    read_warc_records,
)


def _hand_record(uri: bytes, http: bytes, warc_type: bytes = b"response"):
    """Frame a record by hand — no shared code with build_warc_record."""
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + warc_type + b"\r\n"
        b"WARC-Target-URI: " + uri + b"\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n"
        b"\r\n" + http + b"\r\n\r\n"
    )


HTTP_OK = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
    b"Content-Length: 5\r\n\r\nhello"
)


def test_hand_framed_plain_records():
    blob = _hand_record(b"https://a/1", HTTP_OK) + _hand_record(
        b"https://a/2",
        b"HTTP/1.1 404 Not Found\r\n\r\ngone",
    )
    recs = parse_warc(blob)
    assert [r["ok"] for r in recs] == [True, True]
    assert recs[0]["uri"] == "https://a/1"
    assert recs[0]["http_status"] == 200
    assert recs[0]["content_type"] == "text/plain"
    assert recs[0]["body"] == b"hello"
    assert recs[1]["http_status"] == 404
    assert recs[1]["body"] == b"gone"


def test_body_containing_warc_magic_is_framed_by_length():
    # Content-Length framing must not be fooled by WARC/1.0 in a body
    evil = b"WARC/1.0\r\nlook like a record\r\n\r\n"
    http = b"HTTP/1.1 200 OK\r\n\r\n" + evil
    blob = _hand_record(b"https://a/e", http) + _hand_record(
        b"https://a/f", HTTP_OK
    )
    recs = parse_warc(blob)
    assert len(recs) == 2 and all(r["ok"] for r in recs)
    assert recs[0]["body"] == evil


def test_gzip_member_walk():
    members = [
        gzip.compress(_hand_record(b"https://g/1", HTTP_OK), mtime=0),
        gzip.compress(
            _hand_record(b"https://g/2", HTTP_OK), mtime=0
        ),
    ]
    recs = parse_warc(b"".join(members))
    assert [r["uri"] for r in recs] == ["https://g/1", "https://g/2"]


def test_corrupt_trailing_gzip_member_keeps_decoded_records():
    """A truncated/corrupt tail member (interrupted crawl) must not
    discard the records already decoded — good records survive and the
    damage becomes one failure row at the end."""
    blob = (
        gzip.compress(_hand_record(b"https://g/1", HTTP_OK), mtime=0)
        + gzip.compress(_hand_record(b"https://g/2", HTTP_OK), mtime=0)
        + b"\x1f\x8b\x08CORRUPT_TAIL"
    )
    recs = parse_warc(blob)
    assert [r["ok"] for r in recs] == [True, True, False]
    assert [r["uri"] for r in recs[:2]] == ["https://g/1", "https://g/2"]
    assert recs[-1]["error"].startswith("bad gzip")


def test_non_response_record_keeps_raw_payload():
    rec = _hand_record(b"https://a/req", b"GET / HTTP/1.1\r\n\r\n",
                       warc_type=b"request")
    recs = parse_warc(rec)
    assert recs[0]["warc_type"] == "request"
    assert recs[0]["http_status"] is None
    assert recs[0]["body"] == b"GET / HTTP/1.1\r\n\r\n"


def test_malformed_blobs_yield_failure_rows():
    assert parse_warc(b"not warc at all")[0]["error"].startswith(
        "missing WARC/1.0"
    )
    truncated = _hand_record(b"https://a/t", HTTP_OK)[:-20]
    recs = parse_warc(truncated)
    assert recs[-1]["ok"] is False
    no_len = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nxxx"
    assert parse_warc(no_len)[0]["error"].startswith("missing/invalid")
    assert parse_warc(b"\x1f\x8bgarbage")[0]["error"].startswith(
        "bad gzip"
    )


def test_writer_parser_round_trip_both_layouts():
    records = [
        (f"https://h/{i}", f"body {i}".encode(), 200 + i) for i in range(5)
    ]
    for gz in (False, True):
        recs = parse_warc(build_warc(records, per_record_gzip=gz))
        assert [(r["uri"], r["body"], r["http_status"]) for r in recs] == [
            (u, b, s) for u, b, s in records
        ]


def test_build_warc_record_frames_cleanly():
    # two writer records back-to-back parse as exactly two
    blob = build_warc_record("https://w/1", b"x" * 100) + build_warc_record(
        "https://w/2", b""
    )
    recs = parse_warc(blob)
    assert len(recs) == 2
    assert recs[0]["body"] == b"x" * 100 and recs[1]["body"] == b""


def test_spark_expansion_one_to_many(spark):
    from article_extractor_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    blob = build_warc(
        [("https://s/1", b"aaa", 200), ("https://s/2", b"bb", 404)],
        per_record_gzip=True,
    )
    df = spark.createDataFrame(
        [("arc0", bytearray(blob)), ("arc1", bytearray(b"junk"))],
        "archive_id string, payload binary",
    )
    rows = read_warc_records(df).collect()
    by_arc = {}
    for r in rows:
        by_arc.setdefault(r["archive_id"], []).append(r)
    assert len(by_arc["arc0"]) == 2
    assert [r["record_idx"] for r in sorted(
        by_arc["arc0"], key=lambda r: r["record_idx"]
    )] == [0, 1]
    assert by_arc["arc0"][0]["ok"] and by_arc["arc0"][1]["ok"]
    assert len(by_arc["arc1"]) == 1 and not by_arc["arc1"][0]["ok"]
