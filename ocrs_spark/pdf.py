"""Minimal from-spec PDF text codec (ISO 32000 subset).

Writer: single-page documents with Helvetica Tj show-ops, a
FlateDecode-compressed content stream, and an honest xref table (real
byte offsets). Parser: walks indirect objects, slices each stream by
its /Length entry, inflates FlateDecode, and tokenizes the content
stream with a literal-string state machine (escape sequences, octal
codes, balanced nested parentheses) collecting Tj and TJ show
operators in order.

This is the "PDF parse" leg of the extraction surface: the layout
analysis itself is the OCR pipeline's (`kernels/layout.py`); this
codec turns born-digital PDF spans into text spans without rasterizing.
Like the PNG/JPEG/WebP codecs, it is written from the public spec —
the reference engine has no PDF path to copy.
"""

from __future__ import annotations

import re
import zlib

class PdfParseError(ValueError):
    """Malformed or unsupported PDF payload (a ValueError like the
    image codecs' UnsupportedImageError, so the pipeline's broad
    quarantine catch handles it uniformly)."""


_ESCAPES = {
    ord("n"): b"\n",
    ord("r"): b"\r",
    ord("t"): b"\t",
    ord("b"): b"\b",
    ord("f"): b"\f",
    ord("("): b"(",
    ord(")"): b")",
    ord("\\"): b"\\",
}


def _escape_string(s: bytes) -> bytes:
    out = bytearray()
    for ch in s:
        if ch in (0x28, 0x29, 0x5C):  # ( ) backslash
            out.append(0x5C)
            out.append(ch)
        elif 32 <= ch <= 126:
            out.append(ch)
        else:
            out += b"\\%03o" % ch
    return bytes(out)


def _page_content(lines: list[str], compress: bool) -> tuple[bytes, bytes]:
    ops = [b"BT /F1 12 Tf 72 720 Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append(b"0 -14 Td")
        ops.append(b"(" + _escape_string(line.encode("latin-1")) + b") Tj")
    ops.append(b"ET")
    content = b" ".join(ops)
    filt = b""
    if compress:
        content = zlib.compress(content, 6)
        filt = b" /Filter /FlateDecode"
    return content, filt


def encode_pdf(
    lines: list[str],
    compress: bool = True,
    pages: list[list[str]] | None = None,
) -> bytes:
    """PDF showing each line as one Tj operator. ``lines`` makes a
    single page; pass ``pages`` (a list of line-lists) for a multi-page
    document — extraction order is page order, matching the parser's
    stream order."""
    if pages is None:
        pages = [lines]
    return _assemble([_page_content(p, compress) for p in pages])


def _columns_content(
    columns: list[list[str]],
    xs: tuple[int, ...],
    top: int,
    dy: int,
    compress: bool,
) -> tuple[bytes, bytes]:
    """Content stream for a multi-column page whose show operators are
    EMITTED row-interleaved and right-to-left — stream order is
    deliberately not reading order, so linear Tj collection produces
    scrambled text and only a position-aware parser recovers the
    document. Even columns position with Tm, odd columns with a fresh
    BT + Td, so fixtures exercise both text-positioning operators."""
    ops = [b"BT /F1 12 Tf"]
    n_rows = max((len(c) for c in columns), default=0)
    for row in range(n_rows):
        for ci in reversed(range(len(columns))):
            if row >= len(columns[ci]):
                continue
            x, y = xs[ci], top - dy * row
            s = _escape_string(columns[ci][row].encode("latin-1"))
            if ci % 2 == 0:
                ops.append(b"1 0 0 1 %d %d Tm (%s) Tj" % (x, y, s))
            else:
                ops.append(b"ET BT /F1 12 Tf %d %d Td (%s) Tj" % (x, y, s))
    ops.append(b"ET")
    content = b" ".join(ops)
    filt = b""
    if compress:
        content = zlib.compress(content, 6)
        filt = b" /Filter /FlateDecode"
    return content, filt


def encode_pdf_columns(
    columns: list[list[str]],
    xs: tuple[int, ...] = (72, 320),
    top: int = 720,
    dy: int = 14,
    compress: bool = True,
) -> bytes:
    """Single-page PDF laying ``columns`` (lists of line strings) out
    side-by-side at the given x origins. See ``_columns_content`` for
    the adversarial emission order."""
    if len(columns) > len(xs):
        raise ValueError("more columns than x origins")
    return _assemble([_columns_content(columns, xs, top, dy, compress)])


def _assemble(content_pairs: list[tuple[bytes, bytes]]) -> bytes:
    """Wrap per-page (content, filter-entry) pairs into a complete PDF
    document with an honest xref table."""
    n_pages = len(content_pairs)
    # Object layout: 1 catalog, 2 pages root, then per page (page obj,
    # content stream), font last.
    font_num = 2 + 2 * n_pages + 1
    kids = b" ".join(b"%d 0 R" % (3 + 2 * i) for i in range(n_pages))
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n_pages),
    ]
    for i, (content, filt) in enumerate(content_pairs):
        objects.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents %d 0 R /Resources << /Font << /F1 %d 0 R >> >> >>"
            % (3 + 2 * i + 1, font_num)
        )
        objects.append(
            b"<< /Length %d%s >>\nstream\n%s\nendstream"
            % (len(content), filt, content)
        )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_at)
    )
    return bytes(out)


_LENGTH_RE = re.compile(rb"/Length\s+(\d+)")
_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_STREAM_KW_RE = re.compile(rb"stream(\r\n|\n|\r)")
_IMAGE_SUBTYPE_RE = re.compile(rb"/Subtype\s*/Image\b")


def _iter_objects(data: bytes) -> list[tuple[int, bytes, bytes | None]]:
    """(object number, dictionary bytes, stream bytes or None) for every
    indirect object, in file order. Stream bodies are sliced by their
    /Length entry, so binary payloads containing 'endobj' or 'N 0 obj'
    never desync the walk."""
    out: list[tuple[int, bytes, bytes | None]] = []
    i = 0
    while True:
        m = _OBJ_HEAD_RE.search(data, i)
        if not m:
            return out
        num = int(m.group(1))
        body_start = m.end()
        end = data.find(b"endobj", body_start)
        if end == -1:
            raise PdfParseError("object without endobj")
        sm = _STREAM_KW_RE.search(data, body_start, end)
        if sm is None:
            out.append((num, data[body_start:end], None))
            i = end + 6
            continue
        d = data[body_start : sm.start()]
        lm = _LENGTH_RE.search(d)
        if not lm:
            raise PdfParseError("stream object without /Length")
        n = int(lm.group(1))
        s_start = sm.end()
        body = data[s_start : s_start + n]
        if len(body) != n:
            raise PdfParseError("stream truncated before /Length bytes")
        end = data.find(b"endobj", s_start + n)
        if end == -1:
            raise PdfParseError("stream object without endobj")
        out.append((num, d, body))
        i = end + 6


def _inflate(dict_bytes: bytes, body: bytes) -> bytes:
    if b"/FlateDecode" in dict_bytes:
        try:
            return zlib.decompress(body)
        except zlib.error as exc:
            raise PdfParseError(f"bad Flate stream: {exc}") from exc
    if b"/Filter" in dict_bytes:
        raise PdfParseError("unsupported stream filter")
    return body


def _content_streams(data: bytes) -> list[bytes]:
    """Every non-image stream body, inflated if Flate. Image XObjects
    are skipped — their pixel payloads are not content streams (and a
    DCTDecode image would otherwise trip the unsupported-filter check
    on a document whose text is perfectly extractable)."""
    if not data.startswith(b"%PDF-"):
        raise PdfParseError("not a PDF (missing %PDF- header)")
    streams = []
    for _num, d, body in _iter_objects(data):
        if body is None or _IMAGE_SUBTYPE_RE.search(d):
            continue
        streams.append(_inflate(d, body))
    if not streams:
        # Even a blank page carries an (empty) content stream object; a
        # PDF with none is a truncated or hollowed-out payload.
        raise PdfParseError("no stream objects found")
    return streams


def _parse_literal_string(content: bytes, i: int) -> tuple[bytes, int]:
    """Parse a PDF literal string starting at content[i] == '('.
    Handles escapes, octal codes, escaped newlines, and balanced
    unescaped parentheses. Returns (string, index past ')')."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(content)
    while i < n:
        ch = content[i]
        if ch == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = content[i]
            if e in _ESCAPES:
                out += _ESCAPES[e]
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_digits = bytearray()
                while i < n and len(oct_digits) < 3 and 0x30 <= content[i] <= 0x37:
                    oct_digits.append(content[i])
                    i += 1
                out.append(int(oct_digits, 8) & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation: swallow EOL
                i += 1
                if e == 0x0D and i < n and content[i] == 0x0A:
                    i += 1
            else:  # unknown escape: the char stands for itself
                out.append(e)
                i += 1
        elif ch == 0x28:  # nested (
            depth += 1
            out.append(ch)
            i += 1
        elif ch == 0x29:  # )
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(ch)
            i += 1
        else:
            out.append(ch)
            i += 1
    raise PdfParseError("unterminated literal string")


def _shows_from_content(content: bytes) -> list[bytes]:
    """Collect Tj / TJ show operations, in order."""
    shows = []
    pending: list[bytes] = []
    array: list[bytes] | None = None
    i, n = 0, len(content)
    while i < n:
        ch = content[i]
        if ch == 0x28:  # (
            s, i = _parse_literal_string(content, i)
            if array is not None:
                array.append(s)
            else:
                pending.append(s)
            continue
        if ch == 0x5B:  # [
            array = []
            i += 1
            continue
        if ch == 0x5D:  # ]
            i += 1
            continue
        if 0x41 <= ch <= 0x7A and (0x41 <= ch <= 0x5A or 0x61 <= ch <= 0x7A):
            j = i
            while j < n and (
                0x41 <= content[j] <= 0x5A or 0x61 <= content[j] <= 0x7A
            ):
                j += 1
            op = content[i:j]
            if op == b"Tj" and pending:
                shows.append(pending[-1])
                pending = []
            elif op == b"TJ" and array is not None:
                shows.append(b"".join(array))
                array = None
            i = j
            continue
        i += 1
    return shows


def extract_pdf_text(data: bytes) -> list[str]:
    """All text show operations across the document's content streams,
    in stream order — one list entry per Tj/TJ."""
    shows: list[bytes] = []
    for stream in _content_streams(data):
        shows.extend(_shows_from_content(stream))
    return [s.decode("latin-1") for s in shows]


# ---------------------------------------------------------------------------
# Positional extraction + layout analysis ("PDF/layout parse"): track the
# text-positioning operators through each content stream, emit (x, y, text)
# runs, then recover reading order by clustering x origins into columns —
# the born-digital analogue of the OCR pipeline's line/column analysis
# (`kernels/layout.py`), needed because PDF show order is arbitrary.

_DIGITS = frozenset(b"0123456789.")
_NUM_START = frozenset(b"0123456789.+-")
_NAME_DELIMS = frozenset(b" \t\r\n/[]()<>{}%")


def _typed_runs_from_content(
    content: bytes,
) -> list[tuple[str, float, float, bytes]]:
    """('text', x, y, string) and ('image', x, y, xobject-name) runs in
    emission order. Text position is the line-matrix translation at show
    time (Td/TD/Tm/TL/T*/BT tracked; intra-line advances from glyph
    widths and TJ kern numbers are ignored — runs on one line that share
    a start carry the same x, which the layout pass resolves by emission
    order within (column, line)). Image position is the CTM translation
    at the Do operator, with cm composition and the q/Q graphics-state
    stack tracked; text runs are NOT ctm-transformed (ocrs_spark's
    writer never wraps BT in a cm, and mixed real-world pages that do
    still order correctly as long as text and images share the space)."""
    runs: list[tuple[str, float, float, bytes]] = []
    stack: list[float] = []
    array: list[bytes] | None = None
    strings: list[bytes] = []
    lx = ly = leading = 0.0
    ctm = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]
    gstack: list[list[float]] = []
    last_name = b""
    i, n = 0, len(content)
    while i < n:
        ch = content[i]
        if ch == 0x28:  # (
            s, i = _parse_literal_string(content, i)
            if array is not None:
                array.append(s)
            else:
                strings = [s]
            continue
        if ch == 0x5B:  # [
            array = []
            i += 1
            continue
        if ch == 0x5D:  # ]
            i += 1
            continue
        if ch == 0x2F:  # /name: remember it (Do's operand), skip past
            i += 1
            j = i
            while j < n and content[j] not in _NAME_DELIMS:
                j += 1
            last_name = content[i:j]
            i = j
            continue
        if ch in _NUM_START:
            j = i + 1
            while j < n and content[j] in _DIGITS:
                j += 1
            try:
                stack.append(float(content[i:j]))
            except ValueError as exc:
                raise PdfParseError(f"bad numeric operand: {content[i:j]!r}") from exc
            i = j
            continue
        if 0x41 <= ch <= 0x5A or 0x61 <= ch <= 0x7A or ch in (0x2A, 0x27, 0x22):
            j = i
            while j < n and (
                0x41 <= content[j] <= 0x5A
                or 0x61 <= content[j] <= 0x7A
                or content[j] in (0x2A, 0x27, 0x22)
            ):
                j += 1
            op = content[i:j]
            if op == b"BT":
                lx = ly = leading = 0.0
            elif op == b"Td" and len(stack) >= 2:
                lx += stack[-2]
                ly += stack[-1]
            elif op == b"TD" and len(stack) >= 2:
                leading = -stack[-1]
                lx += stack[-2]
                ly += stack[-1]
            elif op == b"Tm" and len(stack) >= 6:
                lx, ly = stack[-2], stack[-1]
            elif op == b"TL" and stack:
                leading = stack[-1]
            elif op == b"T*":
                ly -= leading
            elif op == b"Tj" and strings:
                runs.append(("text", lx, ly, strings[-1]))
            elif op == b"'" and strings:
                ly -= leading
                runs.append(("text", lx, ly, strings[-1]))
            elif op == b"TJ" and array is not None:
                runs.append(("text", lx, ly, b"".join(array)))
                array = None
            elif op == b"q":
                gstack.append(list(ctm))
            elif op == b"Q":
                if gstack:
                    ctm = gstack.pop()
            elif op == b"cm" and len(stack) >= 6:
                a, b, c, d, e, f = stack[-6:]
                A, B, C, D, E, F_ = ctm
                ctm = [
                    a * A + b * C,
                    a * B + b * D,
                    c * A + d * C,
                    c * B + d * D,
                    e * A + f * C + E,
                    e * B + f * D + F_,
                ]
            elif op == b"Do" and last_name:
                runs.append(("image", ctm[4], ctm[5], last_name))
            # Operands belong to exactly one operator: clear even on
            # ops we don't model (Tf, Tc, rg, ...) so stray numbers
            # never leak into the next operator's operand window.
            stack = []
            strings = []
            i = j
            continue
        i += 1
    return runs


def _runs_from_content(content: bytes) -> list[tuple[float, float, bytes]]:
    """(x, y, text) per text show operator (image placements dropped)."""
    return [
        (x, y, s) for kind, x, y, s in _typed_runs_from_content(content)
        if kind == "text"
    ]


def extract_pdf_runs(data: bytes) -> list[list[tuple[float, float, bytes]]]:
    """Positioned text runs, one list per content stream (= per page;
    pages reuse the same coordinate space, so layout is per-page)."""
    return [_runs_from_content(s) for s in _content_streams(data)]


def reading_order(
    runs: list[tuple[float, float, bytes]], col_gap: float = 50.0
) -> list[str]:
    """Order runs for reading: cluster x origins into columns wherever
    consecutive sorted origins gap by more than ``col_gap`` (chain
    clustering, so ragged indents within a column stay together),
    then emit columns left-to-right, lines top-to-bottom, ties
    left-to-right. A single-column page degenerates to sort-by-y."""
    if not runs:
        return []
    xs = sorted({r[0] for r in runs})
    col_of: dict[float, int] = {xs[0]: 0}
    col = 0
    for prev, x in zip(xs, xs[1:]):
        if x - prev > col_gap:
            col += 1
        col_of[x] = col
    ordered = sorted(
        range(len(runs)),
        key=lambda k: (col_of[runs[k][0]], -runs[k][1], runs[k][0], k),
    )
    return [runs[k][2].decode("latin-1") for k in ordered]


def extract_pdf_text_layout(data: bytes, col_gap: float = 50.0) -> list[str]:
    """Layout-aware text extraction: per-page positioned runs reordered
    into reading order, pages concatenated in document order."""
    out: list[str] = []
    for page_runs in extract_pdf_runs(data):
        out.extend(reading_order(page_runs, col_gap))
    return out


# ---------------------------------------------------------------------------
# Mixed text + image documents: the interleaved-payload case where a
# born-digital page carries both text operators AND embedded raster
# scans (image XObjects). The writer emits real /XObject /Image objects
# (FlateDecode raw RGB or DCTDecode JPEG — the two dominant encodings
# in scanned-PDF corpora); the extractor returns text and image spans
# together in positional reading order, so the OCR pipeline can route
# the rasters through the detection/recognition models and weave the
# recognized text back between the born-digital spans by offset.

_WIDTH_RE = re.compile(rb"/Width\s+(\d+)")
_HEIGHT_RE = re.compile(rb"/Height\s+(\d+)")
_XOBJ_DICT_RE = re.compile(rb"/XObject\s*<<(.*?)>>", re.S)
_XOBJ_ENTRY_RE = re.compile(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R")


def encode_pdf_mixed(
    segments: list[tuple],
    compress: bool = True,
    top: int = 720,
    dy: int = 14,
) -> bytes:
    """Single-page PDF interleaving text and image segments top-down.

    ``segments`` entries:
      ("text", [line, ...])                         — Tj show ops
      ("image", payload, width, height, "flate")    — payload = raw RGB24
      ("image", payload, width, height, "dct")      — payload = JPEG bytes

    Each image becomes a real Image XObject placed with ``q w 0 0 h x y
    cm /ImN Do Q`` at a y strictly below the preceding segment, so
    positional extraction recovers the segment order."""
    ops: list[bytes] = []
    images: list[tuple[bytes, bytes, int, int]] = []  # (data, filter, w, h)
    y = top
    for seg in segments:
        if seg[0] == "text":
            ops.append(b"BT /F1 12 Tf 72 %d Td" % y)
            lines = seg[1] if seg[1] else [""]
            for i, line in enumerate(lines):
                if i:
                    ops.append(b"0 -%d Td" % dy)
                ops.append(b"(" + _escape_string(line.encode("latin-1")) + b") Tj")
            ops.append(b"ET")
            y -= dy * len(lines)
        elif seg[0] == "image":
            _, payload, w, h, filt = seg
            if filt == "flate":
                if len(payload) != w * h * 3:
                    raise ValueError("flate image payload is not w*h*3 RGB bytes")
                data, fname = zlib.compress(payload, 6), b"/FlateDecode"
            elif filt == "dct":
                data, fname = payload, b"/DCTDecode"
            else:
                raise ValueError(f"unknown image filter {filt!r}")
            # Display at half scale: placement box != pixel dims, so the
            # extractor must read /Width //Height from the XObject dict,
            # not from the cm operands.
            dw, dh = max(w // 2, 1), max(h // 2, 1)
            y -= dh
            ops.append(
                b"q %d 0 0 %d 72 %d cm /Im%d Do Q" % (dw, dh, y, len(images))
            )
            images.append((data, fname, w, h))
            y -= dy
        else:
            raise ValueError(f"unknown segment kind {seg[0]!r}")
    content = b" ".join(ops)
    cfilt = b""
    if compress:
        content = zlib.compress(content, 6)
        cfilt = b" /Filter /FlateDecode"

    # Object layout: 1 catalog, 2 pages root, 3 page, 4 content stream,
    # 5..4+k image XObjects, font last.
    font_num = 5 + len(images)
    xobj_entries = b" ".join(
        b"/Im%d %d 0 R" % (i, 5 + i) for i in range(len(images))
    )
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 %d 0 R >> "
        b"/XObject << %s >> >> >>" % (font_num, xobj_entries),
        b"<< /Length %d%s >>\nstream\n%s\nendstream"
        % (len(content), cfilt, content),
    ]
    for data, fname, w, h in images:
        objects.append(
            b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
            b"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter %s "
            b"/Length %d >>\nstream\n%s\nendstream"
            % (w, h, fname, len(data), data)
        )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_at)
    )
    return bytes(out)


def extract_pdf_mixed(data: bytes) -> list[tuple]:
    """Text and image spans in positional reading order across the
    document. Returns a list of
      ("text", string)
      ("image", payload, width, height, "flate"|"dct")
    where a flate payload is the inflated raw RGB24 bytes and a dct
    payload is the embedded JPEG stream verbatim. Reading order is
    top-to-bottom / left-to-right per content stream (single-column
    mixed pages; multi-column text-only pages are the layout parser's
    job)."""
    if not data.startswith(b"%PDF-"):
        raise PdfParseError("not a PDF (missing %PDF- header)")
    images: dict[int, tuple[bytes, int, int, str]] = {}
    contents: list[bytes] = []
    name_map: dict[bytes, int] = {}
    for num, d, body in _iter_objects(data):
        if body is not None and _IMAGE_SUBTYPE_RE.search(d):
            wm, hm = _WIDTH_RE.search(d), _HEIGHT_RE.search(d)
            if not wm or not hm:
                raise PdfParseError("image XObject without /Width or /Height")
            w, h = int(wm.group(1)), int(hm.group(1))
            if b"/FlateDecode" in d:
                try:
                    payload = zlib.decompress(body)
                except zlib.error as exc:
                    raise PdfParseError(f"bad Flate image: {exc}") from exc
                if len(payload) != w * h * 3:
                    raise PdfParseError("flate image payload size mismatch")
                images[num] = (payload, w, h, "flate")
            elif b"/DCTDecode" in d:
                images[num] = (body, w, h, "dct")
            else:
                raise PdfParseError("unsupported image filter")
        elif body is not None:
            contents.append(_inflate(d, body))
        else:
            for xm in _XOBJ_DICT_RE.finditer(d):
                for em in _XOBJ_ENTRY_RE.finditer(xm.group(1)):
                    name_map[em.group(1)] = int(em.group(2))
    if not contents:
        raise PdfParseError("no stream objects found")
    spans: list[tuple] = []
    for stream in contents:
        runs = _typed_runs_from_content(stream)
        order = sorted(range(len(runs)), key=lambda k: (-runs[k][2], runs[k][1], k))
        for k in order:
            kind, _x, _y, payload = runs[k]
            if kind == "text":
                spans.append(("text", payload.decode("latin-1")))
            else:
                num = name_map.get(payload)
                if num is None or num not in images:
                    raise PdfParseError(
                        f"Do references unknown XObject /{payload.decode('latin-1')}"
                    )
                img, w, h, filt = images[num]
                spans.append(("image", img, w, h, filt))
    return spans
