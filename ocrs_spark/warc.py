"""Minimal from-spec WARC (ISO 28500) reader/writer + HTTP response
parsing + web charset detection.

The 100-TB input a web-scale extraction pipeline actually reads is
crawl archives: `.warc` / `.warc.gz` files of concatenated records,
each `response` record carrying a full HTTP response whose body is the
page. The reader here supports both the plain form and the
member-per-record gzip form (each record its own gzip member — the
layout crawl archives use so readers can split/seek without inflating
the whole file), and the charset layer implements the WHATWG-ish
precedence a browser applies: byte-order mark, then the HTTP
``Content-Type`` charset, then an early ``<meta charset>`` /
``http-equiv`` declaration, then strict UTF-8 validation with a
windows-1252 fallback.

Like the image/PDF codecs this is written from the public specs; the
reference engine has no archive path to copy.
"""

from __future__ import annotations

import re
import zlib


class WarcParseError(ValueError):
    """Malformed WARC record / HTTP payload (ValueError so the
    pipeline's quarantine catch handles it uniformly)."""


# --------------------------------------------------------------- writer

def write_warc_record(headers: dict[str, str], payload: bytes) -> bytes:
    """One WARC/1.0 record: version line, named fields, Content-Length,
    blank line, payload, and the two-CRLF record boundary."""
    lines = [b"WARC/1.0"]
    for k, v in headers.items():
        lines.append(f"{k}: {v}".encode("latin-1"))
    lines.append(b"Content-Length: %d" % len(payload))
    return b"\r\n".join(lines) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def build_http_response(body: bytes, content_type: str) -> bytes:
    """A minimal HTTP/1.1 200 response head + body (the payload of a
    WARC ``response`` record)."""
    head = (
        f"HTTP/1.1 200 OK\r\nContent-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("latin-1")
    return head + body


def gzip_member(data: bytes) -> bytes:
    """One complete gzip member (mtime pinned to 0 so archives are
    byte-deterministic)."""
    # compressobj's gzip wrapper stamps mtime=now; build the 10-byte
    # header ourselves for determinism around a raw deflate body.
    raw = zlib.compressobj(6, zlib.DEFLATED, -zlib.MAX_WBITS)
    body = raw.compress(data) + raw.flush()
    header = b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff"
    trailer = (zlib.crc32(data) & 0xFFFFFFFF).to_bytes(4, "little") + (
        len(data) & 0xFFFFFFFF
    ).to_bytes(4, "little")
    return header + body + trailer


# --------------------------------------------------------------- reader

def split_gzip_members(data: bytes) -> list[bytes]:
    """Decompress a stream of concatenated gzip members, one output
    blob per member (the .warc.gz record-per-member layout)."""
    out = []
    while data:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out.append(d.decompress(data) + d.flush())
        except zlib.error as exc:
            raise WarcParseError(f"bad gzip member: {exc}") from exc
        data = d.unused_data
    return out


_CL_RE = re.compile(rb"^content-length:\s*(\d+)\s*$", re.I | re.M)


def _parse_record(data: bytes, pos: int) -> tuple[dict[str, str], bytes, int]:
    """Parse one record at ``pos``; returns (headers, payload, next_pos)."""
    if data[pos : pos + 5] != b"WARC/":
        raise WarcParseError("record does not start with WARC/ version line")
    head_end = data.find(b"\r\n\r\n", pos)
    if head_end == -1:
        raise WarcParseError("unterminated WARC header block")
    head = data[pos:head_end]
    cl = _CL_RE.search(head)
    if not cl:
        raise WarcParseError("WARC record without Content-Length")
    n = int(cl.group(1))
    headers: dict[str, str] = {}
    for line in head.split(b"\r\n")[1:]:
        k, _, v = line.partition(b":")
        headers[k.strip().decode("latin-1")] = v.strip().decode("latin-1")
    body_start = head_end + 4
    payload = data[body_start : body_start + n]
    if len(payload) != n:
        raise WarcParseError("WARC payload truncated before Content-Length")
    end = body_start + n
    if data[end : end + 4] not in (b"\r\n\r\n", b""):
        raise WarcParseError("missing WARC record boundary")
    return headers, payload, end + 4


def iter_warc_records(data: bytes) -> list[tuple[dict[str, str], bytes]]:
    """All records of a .warc or .warc.gz blob, in archive order."""
    if data[:2] == b"\x1f\x8b":
        records = []
        for member in split_gzip_members(data):
            pos = 0
            while pos < len(member):
                h, p, pos = _parse_record(member, pos)
                records.append((h, p))
        return records
    records = []
    pos = 0
    while pos < len(data):
        h, p, pos = _parse_record(data, pos)
        records.append((h, p))
    return records


_STATUS_RE = re.compile(rb"^HTTP/\d\.\d\s+(\d{3})")


def parse_http_response(payload: bytes) -> tuple[int, dict[str, str], bytes]:
    """(status, lower-cased headers, body) of an HTTP response payload."""
    m = _STATUS_RE.match(payload)
    if not m:
        raise WarcParseError("payload is not an HTTP response")
    head_end = payload.find(b"\r\n\r\n")
    if head_end == -1:
        raise WarcParseError("unterminated HTTP header block")
    headers: dict[str, str] = {}
    for line in payload[:head_end].split(b"\r\n")[1:]:
        k, _, v = line.partition(b":")
        headers[k.strip().decode("latin-1").lower()] = v.strip().decode("latin-1")
    return int(m.group(1)), headers, payload[head_end + 4 :]


# ----------------------------------------------------- charset detection

_CHARSET_PARAM_RE = re.compile(r"charset\s*=\s*\"?([\w.:-]+)", re.I)
_META_CHARSET_RE = re.compile(
    rb"<meta[^>]+charset\s*=\s*[\"']?([\w.:-]+)", re.I
)

# Label -> Python codec for the encodings a web pipeline actually meets;
# per the WHATWG encoding spec, latin-1 labels mean windows-1252.
_CODECS = {
    "utf-8": "utf-8", "utf8": "utf-8",
    "us-ascii": "ascii", "ascii": "ascii",
    "iso-8859-1": "cp1252", "latin-1": "cp1252", "latin1": "cp1252",
    "windows-1252": "cp1252", "cp1252": "cp1252",
    "utf-16": "utf-16", "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
}


def detect_charset(body: bytes, content_type: str | None = None) -> str:
    """Codec name for an HTML body: BOM > HTTP charset > early <meta>
    declaration > strict UTF-8 validation > windows-1252 fallback."""
    if body[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"
    if body[:2] == b"\xff\xfe":
        return "utf-16"  # LE with BOM; the codec strips it
    if body[:2] == b"\xfe\xff":
        return "utf-16"
    if content_type:
        m = _CHARSET_PARAM_RE.search(content_type)
        if m and m.group(1).lower() in _CODECS:
            return _CODECS[m.group(1).lower()]
    m = _META_CHARSET_RE.search(body[:1024])
    if m:
        label = m.group(1).decode("latin-1").lower()
        if label in _CODECS:
            return _CODECS[label]
    try:
        body.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "cp1252"


def decode_html(body: bytes, content_type: str | None = None) -> str:
    """Bytes-to-text with detected charset; undecodable bytes are
    replaced rather than raised (a crawl always contains a few liars)."""
    return body.decode(detect_charset(body, content_type), errors="replace")
