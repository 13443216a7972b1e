"""Lossy WebP (VP8) decoder tests.

The committed fixtures were encoded by the system libwebp and decoded
back with it to YUV planes (scripts/make_vp8_fixtures.py). RFC 6386
reconstruction is exact integer arithmetic, so any conformant decoder
must reproduce those planes bit-identically — the strongest possible
check, independent of any RGB-conversion choices. Counterpart of the
reference CLI's lossy-image support via the ``image`` crate
(ocrs-cli/src/main.rs:319-323)."""

import glob
import os
import struct

import numpy as np
import pytest

from ocrs_spark.codec import UnsupportedImageError, decode_image
from ocrs_spark.vp8 import _Bool, _FrameHeader, _parse_frame_header, decode_vp8
from ocrs_spark.webp import decode_webp

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "vp8")


def _vp8_payload(path):
    data = open(path, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if fourcc == b"VP8 ":
            return data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError(f"no VP8 chunk in {path}")


def _parse_header(payload):
    hdr = _FrameHeader()
    tag = payload[0] | payload[1] << 8 | payload[2] << 16
    hdr.width = (payload[6] | payload[7] << 8) & 0x3FFF
    hdr.height = (payload[8] | payload[9] << 8) & 0x3FFF
    hdr.mb_w = (hdr.width + 15) >> 4
    hdr.mb_h = (hdr.height + 15) >> 4
    n_parts = _parse_frame_header(_Bool(payload, 10, 10 + (tag >> 5)), hdr)
    return hdr, n_parts


FIXTURES = sorted(
    os.path.basename(p)[:-5]
    for p in glob.glob(os.path.join(FIXDIR, "*.webp"))
    if os.path.exists(os.path.join(FIXDIR, os.path.basename(p)[:-5] + ".expected.npz"))
)


@pytest.mark.parametrize("name", FIXTURES)
def test_planes_bit_exact(name):
    """Decoded Y/U/V planes match the reference decoder's bit-for-bit
    (normative: RFC 6386 §14-§15 reconstruction is exact integer)."""
    payload = _vp8_payload(os.path.join(FIXDIR, name + ".webp"))
    exp = np.load(os.path.join(FIXDIR, name + ".expected.npz"))
    y, u, v = decode_vp8(payload)
    assert np.array_equal(y, exp["y"])
    assert np.array_equal(u, exp["u"])
    assert np.array_equal(v, exp["v"])


def test_fixture_suite_covers_the_decoder_features():
    """Guard fixture regeneration: the suite must keep exercising
    segmentation, coefficient-probability updates, B_PRED mode parsing
    and a nonzero loop filter — silently losing one would turn the
    bit-exactness suite vacuous for that feature."""
    parsed = {n: _parse_header(_vp8_payload(os.path.join(FIXDIR, n + ".webp")))
              for n in FIXTURES}
    hdrs = {n: h for n, (h, _) in parsed.items()}
    assert any(h.seg_enabled for h in hdrs.values())
    # Loop filtering must stay broadly exercised (our own encoder's
    # fixtures legitimately write level 0, so not ALL have it).
    assert sum(h.filter_level > 0 for h in hdrs.values()) >= 10
    assert any(n_parts > 1 for _, n_parts in parsed.values())
    from ocrs_spark.vp8_tables import COEFF_PROBS

    def n_updates(h):
        return sum(
            h.coeff_probs[t][b][c][p] != COEFF_PROBS[t][b][c][p]
            for t in range(4) for b in range(8) for c in range(3) for p in range(11)
        )

    assert any(n_updates(h) > 10 for h in hdrs.values())
    # Odd widths/heights force partial-MB cropping paths.
    assert any(h.width % 16 and h.height % 16 for h in hdrs.values())
    # The advanced-API fixtures must keep the simple-filter, sharpness
    # and multi-partition paths exercised (make_vp8_adv_fixtures.py).
    assert any(h.filter_simple for h in hdrs.values())
    assert any(h.sharpness > 0 for h in hdrs.values())
    # Skip-MB decoding must stay exercised (enc_skippy fixture).
    assert any(h.use_skip for h in hdrs.values())


def test_container_decode_rgb():
    data = open(os.path.join(FIXDIR, "photo_q75.webp"), "rb").read()
    rgb = decode_webp(data)
    assert rgb.shape == (96, 128, 3) and rgb.dtype == np.uint8
    # decode_image dispatches on the RIFF magic.
    assert np.array_equal(decode_image(data), rgb)


def test_lossy_word_image_through_engine():
    """A lossy-encoded word image OCRs to the expected text after
    binarization (the fake recognition model argmaxes raw pixel rows,
    so sub-threshold lossy noise is squashed first; artifacts stay
    below the binarization threshold)."""
    from ocrs_spark import OcrEngine, OcrEngineParams
    from ocrs_spark.fixtures import make_word_image
    from ocrs_spark.models import (
        FakeDetectionModel,
        FakeRecognitionModel,
        fake_alphabet,
    )

    img = make_word_image(2)
    dec = decode_image(open(os.path.join(FIXDIR, "word2_q75.webp"), "rb").read())
    assert dec.shape == img.shape
    clean = np.where(dec > 127, 255, 0).astype(np.uint8)
    assert np.array_equal(clean, img)
    eng = OcrEngine(
        OcrEngineParams(
            detection_model=FakeDetectionModel(),
            recognition_model=FakeRecognitionModel(),
            alphabet=fake_alphabet(),
        )
    )
    assert eng.get_text(eng.prepare_input(clean)) == "77"


def test_rejects_interframe_and_garbage():
    payload = bytearray(_vp8_payload(os.path.join(FIXDIR, "tiny_q75.webp")))
    bad = bytearray(payload)
    bad[0] |= 1  # interframe bit
    with pytest.raises(UnsupportedImageError):
        decode_vp8(bytes(bad))
    bad = bytearray(payload)
    bad[3] = 0  # start code
    with pytest.raises(UnsupportedImageError):
        decode_vp8(bytes(bad))
    with pytest.raises(UnsupportedImageError):
        decode_vp8(bytes(payload[:8]))  # truncated header
    bad = bytearray(payload)
    bad[0] = (bad[0] & ~0x0E) | (5 << 1)  # version 5 is out of range
    with pytest.raises(UnsupportedImageError):
        decode_vp8(bytes(bad))


def test_yuv_to_rgb_matches_reference_within_rounding():
    """The RGB stage is non-normative, but it must stay within one
    code value of libwebp's own RGB conversion on the committed word
    fixture's stats (sanity against gross channel swaps/offsets)."""
    from ocrs_spark.fixtures import make_word_image

    img = make_word_image(2)
    dec = decode_image(open(os.path.join(FIXDIR, "word2_q75.webp"), "rb").read())
    diff = np.abs(dec.astype(int) - img.astype(int))
    assert diff.max() <= 20  # q75 lossy error bound on binary art
    assert diff.mean() < 1.0
