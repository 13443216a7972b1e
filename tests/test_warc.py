"""WARC reader/writer, HTTP parsing, and charset detection contracts.

Spark/oracle parity of warc_main_content is covered by
tests/test_oracles.py (module registered in ops.all_queries); these pin
the codec layer on records the Spark corpus never produces.
"""

import pytest

from ocrs_spark.warc import (
    WarcParseError,
    build_http_response,
    decode_html,
    detect_charset,
    gzip_member,
    iter_warc_records,
    parse_http_response,
    split_gzip_members,
    write_warc_record,
)


def _record(n, body=b"hello body"):
    return write_warc_record(
        {
            "WARC-Type": "response",
            "WARC-Target-URI": f"http://x/{n}",
            "Content-Type": "application/http; msgtype=response",
        },
        build_http_response(body, "text/html; charset=utf-8"),
    )


def test_plain_archive_roundtrip():
    data = b"".join(_record(i) for i in range(3))
    records = iter_warc_records(data)
    assert [h["WARC-Target-URI"] for h, _ in records] == [
        "http://x/0", "http://x/1", "http://x/2",
    ]
    status, headers, body = parse_http_response(records[1][1])
    assert status == 200
    assert headers["content-type"] == "text/html; charset=utf-8"
    assert body == b"hello body"


def test_gzip_member_archive_roundtrip():
    data = b"".join(gzip_member(_record(i)) for i in range(3))
    # Deterministic members: same input -> same bytes (mtime pinned).
    assert data == b"".join(gzip_member(_record(i)) for i in range(3))
    records = iter_warc_records(data)
    assert len(records) == 3
    assert records[2][0]["WARC-Target-URI"] == "http://x/2"
    # Member splitting alone also yields one blob per record.
    assert split_gzip_members(data) == [_record(i) for i in range(3)]


def test_warc_errors():
    with pytest.raises(WarcParseError):
        iter_warc_records(b"HTTP/1.1 200 OK\r\n\r\n")  # not a WARC record
    rec = _record(0)
    with pytest.raises(WarcParseError):
        iter_warc_records(rec[:-10])  # truncated payload/boundary
    with pytest.raises(WarcParseError):
        parse_http_response(b"not http at all")
    no_cl = rec.replace(b"Content-Length:", b"X-Length:")
    with pytest.raises(WarcParseError):
        iter_warc_records(no_cl)


HTML = "<html><head><title>t</title></head><body><p>café content</p></body></html>"


def test_charset_precedence_bom_wins():
    body = HTML.encode("utf-8-sig")
    # BOM beats a lying HTTP header.
    assert detect_charset(body, "text/html; charset=windows-1252") == "utf-8-sig"
    assert decode_html(body, "text/html; charset=windows-1252") == HTML


def test_charset_http_header():
    body = HTML.encode("cp1252")
    assert detect_charset(body, "text/html; charset=ISO-8859-1") == "cp1252"
    assert decode_html(body, "text/html; charset=ISO-8859-1") == HTML
    # Counterfactual: decoding those bytes as UTF-8 would NOT round-trip
    # (the é is a bare 0xE9), which is what makes detection load-bearing.
    assert body.decode("utf-8", errors="replace") != HTML


def test_charset_meta_declaration():
    html = HTML.replace("<head>", '<head><meta charset="windows-1252">', 1)
    body = html.encode("cp1252")
    assert detect_charset(body, "text/html") == "cp1252"
    assert decode_html(body, "text/html") == html


def test_charset_meta_only_scanned_in_prefix():
    # A declaration buried past 1024 bytes is ignored (WHATWG prescan).
    filler = "x" * 1500
    html = f"<html><head></head><body><p>{filler}</p>" \
           '<meta charset="utf-16"><p>tail</p></body></html>'
    assert detect_charset(html.encode("utf-8"), None) == "utf-8"


def test_charset_utf16_bom():
    body = HTML.encode("utf-16")
    assert detect_charset(body, None) == "utf-16"
    assert decode_html(body, None) == HTML


def test_charset_fallback_validation():
    assert detect_charset(HTML.encode("utf-8"), None) == "utf-8"
    # Invalid UTF-8 with no declaration anywhere -> windows-1252.
    assert detect_charset(HTML.encode("cp1252"), None) == "cp1252"
    assert decode_html(HTML.encode("cp1252"), None) == HTML
