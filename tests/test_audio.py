"""Contracts for the from-spec WAV codec + audio features
(ops/audio.py): byte-level round trips, the RIFF chunk-walk rules the
decoder must honor (unknown-chunk skip, odd-size pad), error paths,
and a pure-Python feature recompute through the real byte path.
"""

import struct

import numpy as np
import pytest

from ocrs_spark.ops.audio import (
    _rate,
    _samples,
    audio_wav_features,
    decode_wav,
    encode_wav,
)

SF = "/root/testdata/sf0.001"


def test_roundtrip_exact():
    s = np.array([0, 1, -1, 32767, -32768, 12345], dtype=np.int64)
    rate, out = decode_wav(encode_wav(s, 8000))
    assert rate == 8000
    assert np.array_equal(out, s)


def test_decoder_skips_unknown_chunks_with_pad():
    # The encoder plants an odd-sized LIST chunk before data; a walker
    # that forgets RIFF's pad byte lands mid-chunk and either raises
    # or returns garbage. Also verify a hand-built extra chunk AFTER
    # data is harmless.
    s = _samples(7)
    buf = encode_wav(s, 16000)
    assert b"LIST" in buf
    rate, out = decode_wav(buf)
    assert rate == 16000 and np.array_equal(out, s)
    extra = b"cue " + struct.pack("<I", 3) + b"abc" + b"\x00"
    patched = (
        buf[:4]
        + struct.pack("<I", struct.unpack("<I", buf[4:8])[0] + len(extra))
        + buf[8:]
        + extra
    )
    rate2, out2 = decode_wav(patched)
    assert rate2 == 16000 and np.array_equal(out2, s)


def test_decoder_error_paths():
    with pytest.raises(ValueError):
        decode_wav(b"RIFXxxxxWAVE")
    # stereo rejected: patch channels in the fmt chunk
    buf = bytearray(encode_wav(_samples(1), 8000))
    fmt_at = buf.index(b"fmt ")
    struct.pack_into("<H", buf, fmt_at + 10, 2)
    with pytest.raises(ValueError):
        decode_wav(bytes(buf))
    # truncated: no data chunk
    with pytest.raises(ValueError):
        decode_wav(bytes(encode_wav(_samples(1), 8000))[:30])


def test_features_match_python_recompute_through_bytes(spark):
    rows = audio_wav_features(spark, SF).collect()
    assert len(rows) == 500
    for r in rows[:40]:
        s = _samples(r["doc_id"])
        rate = _rate(r["doc_id"])
        nonneg = s >= 0
        assert r["sample_rate"] == rate
        assert r["n_samples"] == len(s)
        assert r["duration_ms"] == (1000 * len(s)) // rate
        assert r["energy"] == int((s * s).sum()) // len(s)
        assert r["peak"] == int(np.abs(s).max())
        assert r["zero_crossings"] == int((nonneg[1:] != nonneg[:-1]).sum())
