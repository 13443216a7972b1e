"""Contracts for PNG tEXt metadata harvesting (ops/imagemeta.py):
the spliced file must remain a valid PNG for the unmodified pixel
decoder, CRC corruption must be detected (the extractor verifies, not
trusts), and the extraction recomputes through real bytes.
"""

import struct

import numpy as np
import pytest

from ocrs_spark.codec import decode_png
from ocrs_spark.ops.imagemeta import (
    _png_with_text,
    extract_png_text,
    png_text_metadata,
)

SF = "/root/testdata/sf0.001"


def test_splice_preserves_pixel_decode():
    for doc_id in (0, 1, 2, 9, 255, 256):
        img = np.asarray(decode_png(_png_with_text(doc_id)))
        assert img.shape[0] == 3 and img.shape[1] == 4 + doc_id % 3
        flat = img[..., 0] if img.ndim == 3 else img
        assert (flat == doc_id % 256).all()


def test_extract_walks_and_verifies_crc():
    buf = bytearray(_png_with_text(42))
    w, h, n, texts = extract_png_text(bytes(buf))
    assert (w, h, n) == (4 + 42 % 3, 3, 5)
    assert texts["Description"] == "img 42 cap 2"
    assert texts["Software"] == "ocrs_spark 0"
    # flip one byte inside the Description tEXt payload: CRC must trip
    at = bytes(buf).index(b"Description")
    buf[at + 14] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        extract_png_text(bytes(buf))
    with pytest.raises(ValueError):
        extract_png_text(b"not a png at all")


def test_metadata_matches_rule_through_bytes(spark):
    rows = png_text_metadata(spark, SF).collect()
    assert len(rows) == 500
    for r in rows[:40]:
        d = r["doc_id"]
        assert r["width"] == 4 + d % 3 and r["height"] == 3
        assert r["n_chunks"] == 5
        assert r["description"] == f"img {d} cap {d % 10}"
        assert r["software"] == f"ocrs_spark {d % 3}"
