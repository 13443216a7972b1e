"""Contracts for the from-spec AVI codec + video features
(ops/video.py): container round trips across every stride-pad width,
the bottom-up row flip pinned by a hand-built gradient frame (the
oracle's flat fills cannot observe it), error paths, and a
pure-Python recompute through the real byte path.
"""

import struct

import numpy as np
import pytest

from ocrs_spark.ops.video import (
    SAMPLE_K,
    _dims,
    _fill,
    _n_frames,
    _stride,
    _usec_per_frame,
    decode_avi,
    encode_avi,
    video_avi_features,
)

SF = "/root/testdata/sf0.001"


def test_roundtrip_all_stride_pads():
    # doc_ids 0..3 sweep widths 16..19 => row pads 0..3 bytes.
    for doc_id in range(4):
        w, h = _dims(doc_id)
        assert _stride(w) - 3 * w == doc_id % 4
        got_w, got_h, usec, frames = decode_avi(encode_avi(doc_id))
        assert (got_w, got_h) == (w, h)
        assert usec == _usec_per_frame(doc_id)
        assert len(frames) == _n_frames(doc_id)
        for f, fr in enumerate(frames):
            assert fr.shape == (h, w, 3)
            assert fr.min() == fr.max() == _fill(doc_id, f)


def test_bottom_up_rows_are_flipped():
    # Hand-build one gradient frame (row r filled with value r,
    # stored bottom-up as the DIB spec requires) and check the
    # decoder returns natural top-down order.
    doc_id = 0
    w, h = _dims(doc_id)
    stride = _stride(w)
    buf = bytearray(encode_avi(doc_id))
    at = bytes(buf).index(b"00db")
    rows = [bytes([h - 1 - r]) * (3 * w) + b"\x00" * (stride - 3 * w)
            for r in range(h)]  # bottom-up storage: last row first
    buf[at + 8 : at + 8 + stride * h] = b"".join(rows)
    _, _, _, frames = decode_avi(bytes(buf))
    for r in range(h):
        assert frames[0][r].min() == frames[0][r].max() == r


def test_error_paths():
    with pytest.raises(ValueError):
        decode_avi(b"RIFFxxxxWAVE")
    good = encode_avi(5)
    with pytest.raises(ValueError):
        decode_avi(good[:60])  # truncated inside hdrl
    # corrupt a frame chunk's declared size
    buf = bytearray(good)
    at = bytes(buf).index(b"00db")
    struct.pack_into("<I", buf, at + 4, 7)
    with pytest.raises(ValueError):
        decode_avi(bytes(buf))


def test_features_match_python_recompute_through_bytes(spark):
    rows = video_avi_features(spark, SF).collect()
    assert len(rows) == 500
    for r in rows[:40]:
        d = r["doc_id"]
        w, h = _dims(d)
        n = _n_frames(d)
        sampled = list(range(0, n, SAMPLE_K))
        assert (r["width"], r["height"], r["n_frames"]) == (w, h, n)
        assert r["fps_milli"] == 1_000_000_000 // _usec_per_frame(d)
        assert r["sampled_frames"] == len(sampled)
        assert r["sample_digest"] == sum(
            1000 * f + _fill(d, f) for f in sampled
        )
