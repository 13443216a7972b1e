"""Contracts for office-document extraction (ops/officedoc.py): the
written archives must open with Python's OWN zipfile module
(independent conformance), the reader must verify CRCs and walk the
central directory, XML entity escaping must round-trip the five
specials, and the end-to-end text must equal the source exactly.
"""

import io
import struct
import zipfile

import pytest

from ocrs_spark.ops.officedoc import (
    _CONTENT_TYPES,
    _document_xml,
    docx_text_extraction,
    extract_docx_text,
    zip_read,
    zip_write,
)

SF = "/root/testdata/sf0.001"


def _docx(text: str) -> bytes:
    return zip_write(
        [
            ("[Content_Types].xml", _CONTENT_TYPES),
            ("word/document.xml", _document_xml(text)),
        ]
    )


def test_stdlib_zipfile_reads_our_archives():
    buf = _docx("independent conformance check")
    with zipfile.ZipFile(io.BytesIO(buf)) as z:
        assert z.namelist() == ["[Content_Types].xml", "word/document.xml"]
        assert z.testzip() is None  # stdlib CRC pass over every member


def test_entity_escaping_roundtrips_specials():
    nasty = "a<b & c>d \"quoted\" 'apos' &amp; literal </w:t> inside"
    _, _, text = extract_docx_text(_docx(nasty))
    assert text == nasty


def test_crc_and_structure_trips():
    buf = bytearray(_docx("x" * 100))
    members = zip_read(bytes(buf))
    assert [n for n, _ in members] == [
        "[Content_Types].xml",
        "word/document.xml",
    ]
    # corrupt one payload byte of document.xml: CRC must trip
    at = bytes(buf).index(b"<w:body>")
    buf[at] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        zip_read(bytes(buf))
    with pytest.raises(ValueError, match="EOCD"):
        zip_read(b"PK\x03\x04 but no end record")


def test_extraction_equals_source_text(spark):
    import hashlib

    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    src = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    rows = docx_text_extraction(spark, SF).collect()
    assert len(rows) == len(src)
    for r in rows[:40]:
        want = src[r["doc_id"]]
        assert r["n_chars"] == len(want)
        assert (
            r["text_roundtrip_md5"]
            == hashlib.md5(want.encode()).hexdigest()
        )
