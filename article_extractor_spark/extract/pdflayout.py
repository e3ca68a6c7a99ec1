"""PDF text + layout parsing (the north rule's "PDF/layout parse" arm).

The reference engine only *skips* PDFs (discovery.py:825 lists ``.pdf``
in its non-HTML extension filter); a training-data pipeline at corpus
scale instead wants to EXTRACT them.  This module is a from-scratch,
pure-stdlib PDF text extractor sized for that job:

- object scanner (no xref needed — tolerant parsers scan ``N 0 obj``
  directly, which also survives the truncated/garbage tails common in
  crawled PDFs), ``/Length``-driven stream extraction, ``/FlateDecode``
  via zlib;
- a content-stream lexer + interpreter covering the text operators
  (``BT/ET Tf TL Td TD Tm T* Tj ' " TJ``) with full literal-string
  escape handling (nested parens, octal, line continuations, hex
  strings), and the graphics operators needed to position images
  (``q/Q cm`` with a real CTM stack, ``Do`` resolved through the page's
  ``/Resources /XObject`` map);
- a LAYOUT pass: shows are grouped into blocks (one per ``BT..ET``,
  lines split on line-advance operators) and blocks — text and image
  alike — are re-ordered into reading order by position
  (top-to-bottom, then left-to-right), NOT stream order.  A PDF's
  content stream is free to emit the footer first; reading order is a
  geometry problem, and solving it is what "layout parse" means.

The output is the engine's interleaved span model (kind/text/media_ref/
offset) — a PDF page becomes the same ordered text+media span sequence
an HTML document does, so every downstream operator (dedup, quality,
token counts, markdown sink) consumes PDFs unchanged.

Everything here is per-document pure Python with no Spark imports; the
distributed operator wrapping it lives in ``operators.pdf`` (one
vectorized Arrow stage, zero shuffles).
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field

PDF_MAGIC = b"%PDF-"

# ---------------------------------------------------------------------------
# Writer (synthetic corpora + tests; also a usable minimal PDF emitter)
# ---------------------------------------------------------------------------

_ESCAPE = {ord("\\"): "\\\\", ord("("): "\\(", ord(")"): "\\)",
           10: "\\n", 13: "\\r", 9: "\\t", 8: "\\b", 12: "\\f"}


def pdf_escape(s: str) -> str:
    """Escape a literal string for a PDF ``( )`` string object.

    Text confined to latin-1 is emitted as raw bytes; anything wider
    becomes a UTF-16BE text string with a leading BOM (PDF 32000-1
    §7.9.2.2 — the spec's own convention for non-PDFDocEncoding text),
    so the writer is total over unicode instead of dying inside an
    Arrow batch on the first CJK character (found by the format
    fuzzer).  ``_lex_string`` reverses the convention.

    Latin-1 text that itself BEGINS with U+00FE U+00FF must also take
    the UTF-16BE arm: emitted raw, its first two bytes are an
    accidental BOM and ``_decode_text_string`` would misread the rest
    as UTF-16BE (round-trip corruption, found by review)."""
    if not s.isascii():  # C-level gate: ASCII text skips the probe
        try:
            s.encode("latin-1")
        except UnicodeEncodeError:
            s = "\xfe\xff" + s.encode("utf-16-be").decode("latin-1")
        else:
            if s.startswith("\xfe\xff"):
                s = "\xfe\xff" + s.encode("utf-16-be").decode("latin-1")
    return s.translate(_ESCAPE)


BODY_LINE_CHARS = 64
BODY_X, BODY_TOP_Y, BODY_LEADING = 72, 700, 14
TITLE_Y, IMAGE_Y, FOOTER_Y = 742, 560, 40
IMAGE_NAME = "Im0"
_IMAGE_BYTES = b"\x00\x7f\xbf\xff"  # 2x2 8-bit gray


def body_lines(text: str, width: int = BODY_LINE_CHARS) -> list[str]:
    """Fixed-width body chunking (deterministic + SQL-reconstructible:
    line i is ``substr(text, i*width+1, width)``)."""
    return [text[i : i + width] for i in range(0, len(text), width)]


def build_article_pdf(doc_id, text: str, *, compress: bool = False) -> bytes:
    """One-page PDF for a synthetic document: title, body, an image
    XObject, and a footer.

    The content stream deliberately emits blocks OUT of reading order
    (footer → image → title → body) so a parser that trusts stream
    order fails span-sequence equality — round-tripping through
    ``parse_pdf`` is evidence the layout sort actually runs.  The title
    uses ``TJ`` (array show), the body ``Td``/``TD``/``T*`` line
    advances, the image a ``q cm Do Q`` placement — one of each
    operator family the interpreter claims to support.
    """
    ops = [
        f"BT /F1 9 Tf {BODY_X} {FOOTER_Y} Td "
        f"(Page 1 of doc {doc_id}) Tj ET",
        f"q 150 0 0 100 {BODY_X} {IMAGE_Y} cm /{IMAGE_NAME} Do Q",
        f"BT /F1 18 Tf {BODY_X} {TITLE_Y} Td [(Doc ) ({doc_id})] TJ ET",
    ]
    lines = body_lines(text)
    if lines:
        shows = [f"({pdf_escape(lines[0])}) Tj"]
        for i, ln in enumerate(lines[1:]):
            adv = f"0 -{BODY_LEADING} TD" if i == 0 else "T*"
            shows.append(f"{adv} ({pdf_escape(ln)}) Tj")
        ops.append(
            f"BT /F1 11 Tf {BODY_X} {BODY_TOP_Y} Td "
            + " ".join(shows)
            + " ET"
        )
    content = "\n".join(ops).encode("latin-1")
    filt = ""
    if compress:
        content = zlib.compress(content)
        filt = " /Filter /FlateDecode"

    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 5 0 R >> "
            b"/XObject << /" + IMAGE_NAME.encode() + b" 6 0 R >> >> "
            b"/Contents 4 0 R >>"
        ),
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}

    def emit(num: int, body: bytes, stream: bytes | None = None) -> None:
        offsets[num] = len(out)
        out.extend(f"{num} 0 obj\n".encode())
        out.extend(body)
        if stream is not None:
            out.extend(b"\nstream\n")
            out.extend(stream)
            out.extend(b"\nendstream")
        out.extend(b"\nendobj\n")

    for num in (1, 2, 3):
        emit(num, objs[num])
    emit(4, f"<< /Length {len(content)}{filt} >>".encode(), content)
    emit(5, objs[5])
    emit(
        6,
        (
            b"<< /Type /XObject /Subtype /Image /Width 2 /Height 2 "
            b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length "
            + str(len(_IMAGE_BYTES)).encode()
            + b" >>"
        ),
        _IMAGE_BYTES,
    )
    xref_at = len(out)
    out.extend(b"xref\n0 7\n0000000000 65535 f \n")
    for num in range(1, 7):
        out.extend(f"{offsets[num]:010d} 00000 n \n".encode())
    out.extend(
        f"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n{xref_at}\n"
        "%%EOF\n".encode()
    )
    return bytes(out)


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
# (?!\d) pins the match to the WHOLE number — without it the engine
# backtracks on "/Length 12 0 R" to match "1" with the lookahead
# satisfied, silently truncating the stream to 1 byte.  The indirect
# lookahead accepts ANY generation number ("12 3 R"), not just 0
# (ADVICE r3) — a nonzero-gen indirect /Length must fall through to
# the endstream scan, not be read as a direct integer.
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)")
_LENGTH_REF_RE = re.compile(rb"/Length\s+(\d+)\s+\d+\s+R")
_STREAM_RE = re.compile(rb"stream\r?\n")
_NUM_REF_RE = re.compile(rb"(\d+)\s+0\s+R")
_NAME_REF_RE = re.compile(rb"/([^\s/\[\]()<>{}%]+)\s+(\d+)\s+0\s+R")


@dataclass
class _Obj:
    dict_bytes: bytes
    stream: bytes | None = None


@dataclass
class _Block:
    kind: str  # "text" | "media"
    x: float
    y: float
    order: int  # stream order, the layout-sort tiebreak
    lines: list[str] = field(default_factory=list)
    media_ref: str = ""


class PdfError(ValueError):
    pass


def _scan_objects(data: bytes) -> dict[int, _Obj]:
    """Scan ``N 0 obj`` bodies without the xref table.  Streams are cut
    by ``/Length`` when it is a direct integer (resolving a one-hop
    ``/Length N 0 R`` indirect after a first pass), falling back to the
    next ``endstream`` for malformed lengths — the tolerant-reader
    behavior crawled PDFs need.  The scan pointer advances PAST each
    stream payload, so binary stream bytes (compressed data can contain
    ``N 0 obj`` by chance) are never misread as object headers."""
    objs: dict[int, _Obj] = {}
    pending_len: list[tuple[int, int, int]] = []  # (num, ref, stream_at)
    pos = 0
    while True:
        m = _OBJ_RE.search(data, pos)
        if not m:
            break
        num = int(m.group(1))
        end = data.find(b"endobj", m.end())
        if end < 0:
            end = len(data)
        sm = _STREAM_RE.search(data, m.end(), end)
        if not sm:
            objs[num] = _Obj(data[m.end() : end].strip())
            pos = end + 6
            continue
        dict_bytes = data[m.end() : sm.start()].strip()
        stream_at = sm.end()
        lm = _LENGTH_RE.search(dict_bytes)
        rm = _LENGTH_REF_RE.search(dict_bytes)
        if lm:
            n = int(lm.group(1))
            stream = data[stream_at : stream_at + n]
            stream_end = stream_at + n
        elif rm:
            pending_len.append((num, int(rm.group(1)), stream_at))
            # length unknown until the ref resolves — skip the scan
            # pointer to the next endstream so payload bytes are not
            # rescanned as object headers; keep the endstream-cut
            # content as the fallback for an unresolvable ref (the
            # fixup pass below re-cuts by the resolved length)
            tail = data.find(b"endstream", stream_at)
            stream_end = tail if tail >= 0 else len(data)
            stream = data[stream_at:stream_end].rstrip(b"\r\n")
        else:
            tail = data.find(b"endstream", stream_at)
            stream_end = tail if tail >= 0 else len(data)
            stream = data[stream_at:stream_end].rstrip(b"\r\n")
        objs[num] = _Obj(dict_bytes, stream)
        end = data.find(b"endobj", stream_end)
        pos = (end + 6) if end >= 0 else len(data)
    for num, ref, stream_at in pending_len:
        ref_obj = objs.get(ref)
        try:
            n = int(ref_obj.dict_bytes.strip()) if ref_obj else None
        except ValueError:
            n = None
        if n is None:
            continue  # unresolvable ref → keep the endstream-cut stream
        objs[num] = _Obj(objs[num].dict_bytes, data[stream_at : stream_at + n])
    return objs


def _decode_stream(obj: _Obj) -> bytes:
    if b"/FlateDecode" in obj.dict_bytes:
        try:
            return zlib.decompress(obj.stream or b"")
        except zlib.error as exc:  # corrupt deflate → parse error
            raise PdfError(f"bad FlateDecode stream: {exc}") from exc
    return obj.stream or b""


def _bracketed_region(data: bytes, key: bytes) -> bytes:
    """The ``<< .. >>`` (or ``[ .. ]``) value region following ``key``,
    honoring nesting; empty if the key is absent."""
    at = data.find(key)
    if at < 0:
        return b""
    i = at + len(key)
    while i < len(data) and data[i : i + 1] in b"\x00\t\n\x0c\r ":
        i += 1
    if data[i : i + 2] == b"<<":
        open_tok, close_tok = b"<<", b">>"
    elif data[i : i + 1] == b"[":
        open_tok, close_tok = b"[", b"]"
    else:
        # bare value (e.g. "/Contents 4 0 R"): up to the next name/end
        m = _NUM_REF_RE.match(data, i)
        return m.group() if m else b""
    depth, start = 0, i
    step = len(open_tok)
    while i < len(data):
        if data[i : i + step] == open_tok:
            depth += 1
            i += step
        elif data[i : i + step] == close_tok:
            depth -= 1
            i += step
            if depth == 0:
                return data[start:i]
        else:
            i += 1
    return data[start:]


def _xobject_map(page_dict: bytes, objs: dict[int, _Obj]) -> dict[str, int]:
    """name → object number for the page's XObjects."""
    res = _bracketed_region(page_dict, b"/Resources")
    region = _bracketed_region(res, b"/XObject")
    return {
        name.decode("latin-1"): int(num)
        for name, num in _NAME_REF_RE.findall(region)
    }


def _page_order(objs: dict[int, _Obj]) -> list[int]:
    """Page object numbers in document order: /Kids of the Pages node
    when present (the authoritative order), else scan order."""
    pages = [
        n for n, o in objs.items()
        if re.search(rb"/Type\s*/Page\b(?!s)", o.dict_bytes)
    ]
    for o in objs.values():
        if re.search(rb"/Type\s*/Pages\b", o.dict_bytes):
            kids_region = _bracketed_region(o.dict_bytes, b"/Kids")
            kids = [int(n) for n in _NUM_REF_RE.findall(kids_region)]
            ordered = [n for n in kids if n in pages]
            if ordered:
                return ordered
    return sorted(pages)


# --- content-stream lexer ---------------------------------------------------

_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_NAME_RE = re.compile(rb"/[^\s/\[\]()<>{}%]*")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")

_STR_ESC = {
    ord("n"): "\n", ord("r"): "\r", ord("t"): "\t",
    ord("b"): "\b", ord("f"): "\f",
    ord("("): "(", ord(")"): ")", ord("\\"): "\\",
}


def _decode_text_string(raw: str) -> str:
    """PDF text-string convention (32000-1 §7.9.2.2): a string whose
    bytes begin with the UTF-16BE BOM is UTF-16BE text; anything else
    is kept byte-for-byte (latin-1 view).  Damaged UTF-16 (odd length,
    lone surrogate — the fuzzer produces both) falls back to the raw
    byte view rather than raising."""
    if raw.startswith("\xfe\xff"):
        try:
            return raw[2:].encode("latin-1").decode("utf-16-be")
        except UnicodeError:
            pass
    return raw


def _lex_string(data: bytes, i: int) -> tuple[str, int]:
    """Literal string starting at ``(``; returns (text, next index).
    Handles nested parens, the escape set, octal escapes, and
    line-continuation backslashes (PDF 32000-1 §7.3.4.2)."""
    i += 1  # past '('
    depth, out = 1, []
    while i < len(data):
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= len(data):
                break
            e = data[i]
            if 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_digits = chr(e)
                i += 1
                for _ in range(2):
                    if i < len(data) and 0x30 <= data[i] <= 0x37:
                        oct_digits += chr(data[i])
                        i += 1
                out.append(chr(int(oct_digits, 8) & 0xFF))
                continue
            if e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < len(data) and data[i] == 0x0A:
                    i += 1
                continue
            out.append(_STR_ESC.get(e, chr(e)))
            i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append("(")
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return _decode_text_string("".join(out)), i + 1
            out.append(")")
            i += 1
        else:
            out.append(chr(c))
            i += 1
    raise PdfError("unterminated string")


def _lex_content(data: bytes):
    """Yield (kind, value) tokens: num, str, name, arr ('['/']'), op."""
    i, n = 0, len(data)
    while i < n:
        c = data[i : i + 1]
        if c in b"\x00\t\n\x0c\r ":
            i += 1
        elif c == b"%":  # comment to EOL
            j = data.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c == b"(":
            s, i = _lex_string(data, i)
            yield ("str", s)
        elif c == b"<" and data[i : i + 2] != b"<<":
            j = data.find(b">", i)  # hex string
            hx = re.sub(rb"\s", b"", data[i + 1 : j if j >= 0 else n])
            if len(hx) % 2:
                hx += b"0"
            yield (
                "str",
                _decode_text_string(
                    bytes.fromhex(hx.decode("latin-1")).decode("latin-1")
                ),
            )
            i = (j + 1) if j >= 0 else n
        elif data[i : i + 2] in (b"<<", b">>"):
            i += 2  # inline dicts carry no layout info here
        elif c == b"[":
            yield ("arr", "[")
            i += 1
        elif c == b"]":
            yield ("arr", "]")
            i += 1
        elif c == b"/":
            m = _NAME_RE.match(data, i)
            yield ("name", m.group()[1:].decode("latin-1"))
            i = m.end()
        else:
            m = _NUM_RE.match(data, i)
            if m:
                yield ("num", float(m.group()))
                i = m.end()
                continue
            m = _OP_RE.match(data, i)
            if m:
                yield ("op", m.group().decode("latin-1"))
                i = m.end()
            else:
                i += 1  # unknown byte: skip (tolerant)


def _mat_mul(a, b):
    """PDF 6-tuple affine multiply: result = a × b."""
    a0, a1, a2, a3, a4, a5 = a
    b0, b1, b2, b3, b4, b5 = b
    return (
        a0 * b0 + a1 * b2,
        a0 * b1 + a1 * b3,
        a2 * b0 + a3 * b2,
        a2 * b1 + a3 * b3,
        a4 * b0 + a5 * b2 + b4,
        a4 * b1 + a5 * b3 + b5,
    )


_ID = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def _interpret_page(
    content: bytes,
    xobjects: dict[str, int],
    objs: dict[int, _Obj],
) -> list[_Block]:
    """Run the content stream; return positioned text/media blocks."""
    blocks: list[_Block] = []
    ctm, ctm_stack = _ID, []
    tm = tlm = _ID  # text matrix / text line matrix
    leading = 0.0
    cur: _Block | None = None
    cur_line: list[str] = []
    stack: list = []  # operand stack: ("num"|"str"|"name", v) or list
    arr: list | None = None

    def device_pos(m) -> tuple[float, float]:
        d = _mat_mul(m, ctm)
        return d[4], d[5]

    def flush_line() -> None:
        nonlocal cur_line
        if cur is not None and cur_line:
            cur.lines.append("".join(cur_line))
        cur_line = []

    def show(text: str) -> None:
        if cur is None:
            return
        if not cur.lines and not cur_line:
            cur.x, cur.y = device_pos(tm)
        cur_line.append(text)

    def newline(tx: float, ty: float) -> None:
        nonlocal tlm, tm
        flush_line()
        tlm = _mat_mul((1.0, 0.0, 0.0, 1.0, tx, ty), tlm)
        tm = tlm

    def last_nums(k: int) -> list[float] | None:
        vals = [
            v for item in stack[-k:]
            if isinstance(item, tuple)
            for t, v in [item]
            if t == "num"
        ]
        return vals if len(vals) == k else None

    for kind, val in _lex_content(content):
        if kind == "arr":
            if val == "[":
                arr = []
            else:
                stack.append(arr if arr is not None else [])
                arr = None
            continue
        if arr is not None:
            if kind in ("num", "str"):
                arr.append((kind, val))
            continue
        if kind != "op":
            stack.append((kind, val))
            continue
        op = val
        if op == "q":
            ctm_stack.append(ctm)
        elif op == "Q":
            ctm = ctm_stack.pop() if ctm_stack else _ID
        elif op == "cm":
            nums = last_nums(6)
            if nums:
                ctm = _mat_mul(tuple(nums), ctm)
        elif op == "BT":
            tm = tlm = _ID
            cur = _Block("text", 0.0, 0.0, len(blocks))
            cur_line = []
        elif op == "ET":
            flush_line()
            if cur is not None and cur.lines:
                blocks.append(cur)
            cur = None
        elif op == "TL":
            nums = last_nums(1)
            if nums:
                leading = nums[0]
        elif op == "Td":
            nums = last_nums(2)
            if nums:
                newline(nums[0], nums[1])
        elif op == "TD":
            nums = last_nums(2)
            if nums:
                leading = -nums[1]
                newline(nums[0], nums[1])
        elif op == "Tm":
            nums = last_nums(6)
            if nums:
                flush_line()
                tm = tlm = tuple(nums)
        elif op == "T*":
            newline(0.0, -leading)
        elif op == "Tj":
            if stack and isinstance(stack[-1], tuple) \
                    and stack[-1][0] == "str":
                show(stack[-1][1])
        elif op in ("'", '"'):
            if stack and isinstance(stack[-1], tuple) \
                    and stack[-1][0] == "str":
                newline(0.0, -leading)  # " word/char spacing ignored
                show(stack[-1][1])
        elif op == "TJ":
            if stack and isinstance(stack[-1], list):
                show("".join(v for t, v in stack[-1] if t == "str"))
        elif op == "Do":
            if stack and isinstance(stack[-1], tuple) \
                    and stack[-1][0] == "name":
                ref = xobjects.get(stack[-1][1])
                obj = objs.get(ref) if ref is not None else None
                if obj is not None and b"/Image" in obj.dict_bytes:
                    blocks.append(
                        _Block(
                            "media", ctm[4], ctm[5], len(blocks),
                            media_ref=stack[-1][1],
                        )
                    )
        stack = []  # operands are consumed by their operator
    return blocks


def parse_pdf(data: bytes) -> dict:
    """Parse a PDF into the interleaved span model.

    Returns ``{"ok", "error", "n_pages", "spans"}`` where spans is a
    list of ``(kind, text, media_ref, offset)`` in READING order
    (per page: top-to-bottom by block start position, left-to-right,
    stream order as the final tiebreak; pages in /Kids order).  Text
    block → one span, its lines joined with newlines; image placement →
    one media span carrying the XObject name.  Malformed input returns
    ``ok=False`` with a diagnostic instead of raising — at corpus scale
    a bad document must become a row, not a task death.
    """
    try:
        if not data or not data.startswith(PDF_MAGIC):
            raise PdfError("not a PDF (bad magic)")
        objs = _scan_objects(data)
        pages = _page_order(objs)
        if not pages:
            raise PdfError("no page objects")
        spans: list[tuple[str, str, str, int]] = []
        offset = 0
        for page_num in pages:
            page = objs[page_num]
            content_refs = [
                int(n)
                for n in _NUM_REF_RE.findall(
                    _bracketed_region(page.dict_bytes, b"/Contents")
                )
            ]
            content = b"\n".join(
                _decode_stream(objs[n]) for n in content_refs if n in objs
            )
            blocks = _interpret_page(
                content, _xobject_map(page.dict_bytes, objs), objs
            )
            blocks.sort(key=lambda b: (-b.y, b.x, b.order))
            for b in blocks:
                if b.kind == "text":
                    spans.append(("text", "\n".join(b.lines), "", offset))
                else:
                    spans.append(("media", "", b.media_ref, offset))
                offset += 1
        return {
            "ok": True,
            "error": None,
            "n_pages": len(pages),
            "spans": spans,
        }
    except (PdfError, ValueError, IndexError, KeyError) as exc:
        return {
            "ok": False,
            "error": f"{type(exc).__name__}: {exc}",
            "n_pages": 0,
            "spans": [],
        }
