"""Contracts for email/mbox ingestion (ops/mailbox.py): parity with
Python's OWN email module on the folded-header parse (independent
conformance), QP round trips including '=' escaping and soft breaks,
and the end-to-end body-equals-source property.
"""

import email
import email.policy
import hashlib

import pyarrow.parquet as pq
import pytest

from ocrs_spark.ops.mailbox import (
    build_message,
    mbox_ingest,
    parse_message,
    qp_decode,
    qp_encode,
)

SF = "/root/testdata/sf0.001"


def test_stdlib_email_module_parity():
    raw = build_message(7, "wiki", "line one two three " * 9)
    ours_h, ours_body = parse_message(raw)
    theirs = email.message_from_string(raw, policy=email.policy.default)
    assert theirs["Subject"] == ours_h["Subject"]
    assert theirs["X-Doc-Id"] == ours_h["X-Doc-Id"]
    assert theirs.get_content().rstrip("\n") == ours_body.rstrip("\n")


def test_qp_roundtrip_with_equals_and_softbreaks():
    nasty = "x = y == z " * 20 + "tail"
    enc = qp_encode(nasty)
    assert "=3D" in enc and "=\r\n" in enc  # escaping + soft breaks
    assert qp_decode(enc) == nasty
    assert max(len(l) for l in enc.split("=\r\n")) <= 43


def test_unfolding_keeps_wsp_and_malformed_trips():
    raw = build_message(3, "news", "body")
    assert "\r\n " in raw.partition("\r\n\r\n")[0]  # a fold exists
    h, _ = parse_message(raw)
    assert h["Subject"] == "Msg 3 about news corpus ingestion"
    with pytest.raises(ValueError, match="separator"):
        parse_message("Subject: no body here")
    with pytest.raises(ValueError, match="malformed"):
        parse_message("not-a-header\r\n\r\nbody")


def test_body_equals_source(spark):
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    src = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    rows = mbox_ingest(spark, SF).collect()
    assert len(rows) == len(src)
    for r in rows[:40]:
        want = src[r["doc_id"]]
        assert r["x_doc_id"] == r["doc_id"]
        assert r["body_chars"] == len(want)
        assert r["body_md5"] == hashlib.md5(want.encode()).hexdigest()
