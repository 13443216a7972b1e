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


# ---------------------------------------------------------------------------
# Positional extraction + layout analysis


def _layout(data, **kw):
    from ocrs_spark.pdf import extract_pdf_text_layout

    return extract_pdf_text_layout(data, **kw)


def test_two_column_stream_order_is_scrambled_but_layout_recovers():
    from ocrs_spark.pdf import encode_pdf_columns

    left = ["L one", "L two", "L three"]
    right = ["R one", "R two"]
    pdf = encode_pdf_columns([left, right])
    assert extract_pdf_text(pdf) != left + right  # non-vacuous
    assert _layout(pdf) == left + right


def test_three_columns_and_ragged_heights():
    from ocrs_spark.pdf import encode_pdf_columns

    cols = [["a1", "a2"], ["b1"], ["c1", "c2", "c3"]]
    pdf = encode_pdf_columns(cols, xs=(40, 240, 440))
    assert _layout(pdf) == ["a1", "a2", "b1", "c1", "c2", "c3"]


def test_single_column_layout_matches_stream_order():
    from ocrs_spark.pdf import encode_pdf, encode_pdf_columns

    lines = ["first line", "second line", "third line"]
    assert _layout(encode_pdf_columns([lines])) == lines
    # The Td-chain writer round-trips positionally too (multi-page:
    # each page has its own coordinate space).
    assert _layout(encode_pdf(lines, pages=[lines[:2], lines[2:]])) == lines


def test_ragged_indents_chain_into_one_column():
    from ocrs_spark.pdf import reading_order

    # Indented continuation lines (x drifts by < col_gap per step) must
    # chain-cluster into the same column as their neighbors.
    runs = [
        (72.0, 700.0, b"one"),
        (90.0, 686.0, b"two indented"),
        (108.0, 672.0, b"three more"),
        (400.0, 700.0, b"right col"),
    ]
    assert reading_order(runs) == ["one", "two indented", "three more", "right col"]


def test_reading_order_tie_breaks_left_to_right_on_a_line():
    from ocrs_spark.pdf import reading_order

    runs = [(90.0, 700.0, b"b"), (72.0, 700.0, b"a"), (72.0, 686.0, b"c")]
    assert reading_order(runs) == ["a", "b", "c"]


def test_runs_parser_tracks_tl_tstar_and_quote():
    from ocrs_spark.pdf import _runs_from_content

    content = b"BT /F1 12 Tf 16 TL 72 700 Td (one) Tj (two) ' (three) ' ET"
    runs = _runs_from_content(content)
    assert [(x, y, s) for x, y, s in runs] == [
        (72.0, 700.0, b"one"),
        (72.0, 684.0, b"two"),
        (72.0, 668.0, b"three"),
    ]


def test_runs_parser_td_sets_negative_leading():
    from ocrs_spark.pdf import _runs_from_content

    content = b"BT 72 700 Td (a) Tj 0 -20 TD (b) Tj (c) ' ET"
    runs = _runs_from_content(content)
    assert runs == [
        (72.0, 700.0, b"a"),
        (72.0, 680.0, b"b"),
        (72.0, 660.0, b"c"),
    ]


def test_runs_parser_ignores_unmodeled_operator_operands():
    from ocrs_spark.pdf import _runs_from_content

    # Stray operands for Tc/rg must not leak into Td's operand window.
    content = b"BT 0.5 Tc 1 0 0 rg 72 700 Td (a) Tj ET"
    assert _runs_from_content(content) == [(72.0, 700.0, b"a")]


def test_runs_parser_tj_array_position():
    from ocrs_spark.pdf import _runs_from_content

    content = b"BT 1 0 0 1 300 500 Tm [(he) -20 (llo)] TJ ET"
    assert _runs_from_content(content) == [(300.0, 500.0, b"hello")]


def test_layout_roundtrip_on_split_document_text():
    from ocrs_spark.pdf import encode_pdf_columns

    text = "w%s" % " w".join(str(i) for i in range(1, 40))
    toks = text.split(" ")
    mid = (len(toks) + 1) // 2
    cols = [
        [" ".join(half[i : i + 8]) for i in range(0, len(half), 8)]
        for half in (toks[:mid], toks[mid:])
    ]
    pdf = encode_pdf_columns(cols)
    assert " ".join(_layout(pdf)) == text


def test_spark_layout_extraction_recovers_documents(spark):
    from ocrs_spark.ops.webdoc import pdf_layout_extraction

    sf = "/root/testdata/sf0.001"
    got = {r.doc_id: r.layout_text for r in pdf_layout_extraction(spark, sf).collect()}
    want = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    assert got == want
