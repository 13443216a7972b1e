"""PDF text codec: round-trips, string-escape/TJ parsing, corrupt-input
behavior, and the Spark extraction row's failure isolation."""

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocrs_spark.pdf import (
    PdfParseError,
    _shows_from_content,
    encode_pdf,
    extract_pdf_text,
)


def test_roundtrip_basic():
    lines = ["hello world", "second line here"]
    assert extract_pdf_text(encode_pdf(lines)) == lines
    assert extract_pdf_text(encode_pdf(lines, compress=False)) == lines


def test_roundtrip_escapes_and_controls():
    lines = [
        "parens (nested (deep)) and \\ backslash",
        "tab\tnewline\ncarriage\rbell\x07",
        "",
        "high byte \xff and \x80",
    ]
    assert extract_pdf_text(encode_pdf(lines)) == lines


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=0, max_codepoint=255),
            max_size=60,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_roundtrip_property(lines):
    assert extract_pdf_text(encode_pdf(lines)) == lines


def test_encode_is_deterministic():
    assert encode_pdf(["a", "b"]) == encode_pdf(["a", "b"])


def test_tj_array_concatenates():
    # Kerned show: [(Hel) -20 (lo)] TJ must read back as one string.
    content = b"BT [(Hel) -20 (lo)] TJ (plain) Tj ET"
    assert _shows_from_content(content) == [b"Hello", b"plain"]


def test_octal_and_continuation_escapes():
    content = b"BT (\\101\\102\\103) Tj (line\\\ncontinued) Tj ET"
    assert _shows_from_content(content) == [b"ABC", b"linecontinued"]


def test_corrupt_inputs_raise():
    good = encode_pdf(["hello world filler text to compress"])
    for bad in [
        b"",
        b"not a pdf at all",
        good[:40],  # cut before any stream
        good.replace(b"/Length", b"/Lenxth", 1),
    ]:
        with pytest.raises(PdfParseError):
            extract_pdf_text(bad)


def test_bad_flate_stream_raises():
    good = encode_pdf(["some words to make a stream"])
    # Corrupt the deflate body in place: find the stream and flip bytes.
    at = good.index(b"stream\n") + len(b"stream\n")
    bad = good[:at] + b"\x00\x00\x00\x00" + good[at + 4 :]
    with pytest.raises(PdfParseError):
        extract_pdf_text(bad)


def test_unsupported_filter_raises():
    raw = b"BT (x) Tj ET"
    body = zlib.compress(raw)
    doc = (
        b"%%PDF-1.4\n1 0 obj\n<< /Length %d /Filter /LZWDecode >>\n"
        b"stream\n%s\nendstream\nendobj\n" % (len(body), body)
    )
    with pytest.raises(PdfParseError):
        extract_pdf_text(doc)


def test_spark_extraction_isolates_corrupt_rows(spark):
    import pandas as pd

    from ocrs_spark.ops.webdoc import PDF_TEXT_SCHEMA, _extract_pdf_batches

    rows = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "payload": [
                encode_pdf(["good doc one"]),
                b"corrupt payload",
                encode_pdf(["good doc two"]),
            ],
        }
    )
    df = spark.createDataFrame(rows).mapInPandas(
        _extract_pdf_batches, schema=PDF_TEXT_SCHEMA
    )
    got = {r["doc_id"]: r["pdf_text"] for r in df.collect()}
    assert got == {0: "good doc one", 1: None, 2: "good doc two"}


def test_multipage_roundtrip():
    pages = [["page one line a", "page one line b"], ["page two only"], [""]]
    data = encode_pdf([], pages=pages)
    assert extract_pdf_text(data) == [l for p in pages for l in p]
    assert extract_pdf_text(encode_pdf([], compress=False, pages=pages)) == [
        l for p in pages for l in p
    ]
