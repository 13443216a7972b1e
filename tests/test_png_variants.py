import struct
import zlib

import numpy as np
import pytest

from ocrs_spark.codec import decode_png


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload)) + ctype + payload
        + struct.pack(">I", zlib.crc32(ctype + payload))
    )


def _png(width, height, depth, ctype, idat_raw, extra_chunks=()):
    ihdr = struct.pack(">IIBBBBB", width, height, depth, ctype, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    for ct, payload in extra_chunks:
        out += _chunk(ct, payload)
    out += _chunk(b"IDAT", zlib.compress(idat_raw))
    return out + _chunk(b"IEND", b"")


def _png_interlaced(width, height, depth, ctype, idat_raw, extra=()):
    ihdr = struct.pack(">IIBBBBB", width, height, depth, ctype, 0, 0, 1)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    for ct, payload in extra:
        out += _chunk(ct, payload)
    out += _chunk(b"IDAT", zlib.compress(idat_raw))
    return out + _chunk(b"IEND", b"")


def test_palette_png_with_trns():
    rng = np.random.default_rng(0)
    plte = rng.integers(0, 256, (5, 3), np.uint8).astype(np.uint8)
    idx = rng.integers(0, 5, (7, 9), np.uint8).astype(np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(7))
    alpha = bytes([255, 128, 0])  # entries 3,4 default 255
    data = _png(9, 7, 8, 3, raw, [(b"PLTE", plte.tobytes()), (b"tRNS", alpha)])
    out = decode_png(data)
    assert out.shape == (7, 9, 4)
    assert np.array_equal(out[:, :, :3], plte[idx])
    exp_alpha = np.array([255, 128, 0, 255, 255], np.uint8)[idx]
    assert np.array_equal(out[:, :, 3], exp_alpha)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_sub_byte_grey(depth):
    rng = np.random.default_rng(depth)
    w, h = 11, 4
    maxv = (1 << depth) - 1
    vals = rng.integers(0, maxv + 1, (h, w), np.uint8)
    rows = []
    for y in range(h):
        bits = "".join(format(v, f"0{depth}b") for v in vals[y])
        bits += "0" * (-len(bits) % 8)
        rows.append(b"\x00" + int(bits, 2).to_bytes(len(bits) // 8, "big"))
    data = _png(w, h, depth, 0, b"".join(rows))
    out = decode_png(data)
    assert out.shape == (h, w, 1)
    assert np.array_equal(out[:, :, 0], (vals.astype(np.uint16) * 255 // maxv).astype(np.uint8))


def test_16bit_rgb_high_byte():
    rng = np.random.default_rng(7)
    w, h = 5, 3
    px = rng.integers(0, 1 << 16, (h, w, 3), np.uint32).astype(">u2")
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    out = decode_png(_png(w, h, 16, 2, raw))
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, (px >> 8).astype(np.uint8))


def test_grey_colorkey_trns():
    w, h = 4, 2
    img = np.array([[10, 20, 30, 20], [20, 10, 20, 40]], np.uint8)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    data = _png(w, h, 8, 0, raw, [(b"tRNS", struct.pack(">H", 20))])
    out = decode_png(data)
    assert out.shape == (h, w, 2)
    assert np.array_equal(out[:, :, 0], img)
    assert np.array_equal(out[:, :, 1], np.where(img == 20, 0, 255))


_ADAM7 = (
    (0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
    (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2),
)


def test_adam7_interlaced_rgb():
    rng = np.random.default_rng(42)
    w, h = 13, 10  # asymmetric, not multiples of 8
    img = rng.integers(0, 256, (h, w, 3), np.uint8).astype(np.uint8)
    # Independent pass construction: plain nested loops per spec.
    stream = bytearray()
    for x0, xs, y0, ys in _ADAM7:
        ys_rows = list(range(y0, h, ys))
        xs_cols = list(range(x0, w, xs))
        if not ys_rows or not xs_cols:
            continue
        for y in ys_rows:
            stream += b"\x00"
            for x in xs_cols:
                stream += img[y, x].tobytes()
    out = decode_png(_png_interlaced(w, h, 8, 2, bytes(stream)))
    assert np.array_equal(out, img)


def test_adam7_interlaced_palette_small():
    # 3x2: several Adam7 passes are empty — exercises the skip logic.
    plte = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250]], np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], np.uint8)
    stream = bytearray()
    for x0, xs, y0, ys in _ADAM7:
        rows = list(range(y0, 2, ys))
        cols = list(range(x0, 3, xs))
        if not rows or not cols:
            continue
        for y in rows:
            stream += b"\x00" + bytes(int(idx[y, x]) for x in cols)
    data = _png_interlaced(3, 2, 8, 3, bytes(stream), [(b"PLTE", plte.tobytes())])
    out = decode_png(data)
    assert np.array_equal(out, plte[idx])


def test_16bit_colorkey_trns_exact_match():
    # PNG spec: the tRNS color key matches FULL 16-bit samples. A pixel
    # sharing only the key's high byte must stay opaque; only the exact
    # 16-bit value becomes transparent.
    w, h = 3, 1
    key = 0x1234
    px = np.array([[0x1234, 0x12FF, 0x9999]], ">u2").reshape(h, w, 1)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    data = _png(w, h, 16, 0, raw, [(b"tRNS", struct.pack(">H", key))])
    out = decode_png(data)
    assert out.shape == (h, w, 2)
    # high-byte rendering of the grey channel
    assert list(out[0, :, 0]) == [0x12, 0x12, 0x99]
    # only the exact 16-bit match is transparent
    assert list(out[0, :, 1]) == [0, 255, 255]


def test_16bit_rgb_colorkey_trns_exact_match():
    w, h = 2, 1
    key = (0x0102, 0x0304, 0x0506)
    px = np.array(
        [[[0x0102, 0x0304, 0x0506], [0x0102, 0x0304, 0x05FF]]], ">u2"
    ).reshape(h, w, 3)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    data = _png(w, h, 16, 2, raw, [(b"tRNS", struct.pack(">HHH", *key))])
    out = decode_png(data)
    assert out.shape == (h, w, 4)
    assert list(out[0, :, 3]) == [0, 255]
