"""Image codecs for media payloads — stdlib + numpy only.

Two formats:

1. ``RAWI`` — a deterministic uncompressed container used by the test
   fixtures (header magic + dims + raw HWC u8 pixels). This keeps the
   Spark-side plumbing (binary column -> decode -> numpy batch) fully
   real without PIL/cv2, per the sandbox constraints.

2. PNG (decode only) — a minimal pure-Python PNG reader (zlib inflate +
   scanline unfiltering; 8-bit grey/RGB/RGBA, non-interlaced) so the
   reference's real test images (ocrs-cli/test-data/*.png) can be loaded
   as pixel arrays. Counterpart of the reference's file image scan
   (ocrs-cli/src/main.rs:319-323), which supports PNG/JPEG/WebP via the
   image crate; JPEG (ocrs_spark.jpeg, baseline T.81) and lossless WebP
   (ocrs_spark.webp, VP8L) are pure-Python spec implementations
   dispatched from decode_image below.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

RAWI_MAGIC = b"RAWI"


class UnsupportedImageError(ValueError):
    pass


def encode_rawi(img: np.ndarray) -> bytes:
    """HWC (or HW) uint8 image -> RAWI bytes."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    return RAWI_MAGIC + struct.pack("<BIII", 1, h, w, c) + img.tobytes()


def decode_rawi(data: bytes) -> np.ndarray:
    if data[:4] != RAWI_MAGIC:
        raise UnsupportedImageError("not a RAWI payload")
    _, h, w, c = struct.unpack("<BIII", data[4:17])
    pixels = np.frombuffer(data, dtype=np.uint8, count=h * w * c, offset=17)
    return pixels.reshape(h, w, c)


RLEI_MAGIC = b"RLEI"


def encode_rlei(img: np.ndarray) -> bytes:
    """Run-length-encoded image container (HWC/HW uint8). Synthetic page
    images (flat regions) compress ~50-100x, letting benches ship large
    pixel arrays through broadcast joins at KB wire cost."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    flat = img.reshape(-1)
    # Run boundaries where the value changes.
    change = np.nonzero(np.diff(flat))[0] + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [flat.size]))
    values = flat[starts]
    lengths = (ends - starts).astype(np.uint32)
    return (
        RLEI_MAGIC
        + struct.pack("<BIII I", 1, h, w, c, len(values))
        + values.tobytes()
        + lengths.tobytes()
    )


def decode_rlei(data: bytes) -> np.ndarray:
    if data[:4] != RLEI_MAGIC:
        raise UnsupportedImageError("not a RLEI payload")
    _, h, w, c, n = struct.unpack("<BIII I", data[4:21])
    values = np.frombuffer(data, dtype=np.uint8, count=n, offset=21)
    lengths = np.frombuffer(data, dtype=np.uint32, count=n, offset=21 + n)
    return np.repeat(values, lengths).reshape(h, w, c)


# ------------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to an HWC uint8 array.

    Supports color types 0 (grey), 2 (RGB), 4 (grey+alpha), 6 (RGBA)
    and all five scanline filters. Palette/16-bit/interlaced PNGs raise
    UnsupportedImageError.
    """
    if data[:8] != _PNG_SIG:
        raise UnsupportedImageError("not a PNG")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
        elif ctype == b"IDAT":
            idat.extend(chunk)
        elif ctype == b"IEND":
            break
    if bit_depth != 8:
        raise UnsupportedImageError(f"unsupported PNG bit depth {bit_depth}")
    if color_type not in _PNG_CHANNELS:
        raise UnsupportedImageError(f"unsupported PNG color type {color_type}")
    if interlace:
        raise UnsupportedImageError("interlaced PNG not supported")

    channels = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise UnsupportedImageError("PNG data length mismatch")

    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = raw[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at 8-bit depth

    for y in range(height):
        line = raw[y, 1:].astype(np.int32)
        f = filters[y]
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, dtype=np.int32)
        if f == 0:
            cur = line
        elif f == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise UnsupportedImageError(f"unknown PNG filter {f}")
        out[y] = cur.astype(np.uint8)

    return out.reshape(height, width, channels)


def encode_png(img: np.ndarray) -> bytes:
    """Encode an HWC (or HW) uint8 array as an 8-bit PNG (filter 0).
    Used for debug text-map/text-mask outputs (counterpart of
    ocrs-cli/src/main.rs:423-436)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if color_type is None:
        raise UnsupportedImageError(f"cannot encode {c}-channel PNG")
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        data = ctype + payload
        return struct.pack(">I", len(payload)) + data + struct.pack(
            ">I", zlib.crc32(data) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_image(data: bytes) -> np.ndarray:
    """Dispatch on magic bytes -> HWC uint8 array."""
    if data[:4] == RAWI_MAGIC:
        return decode_rawi(data)
    if data[:4] == RLEI_MAGIC:
        return decode_rlei(data)
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    if data[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        from .webp import decode_webp

        return decode_webp(data)
    raise UnsupportedImageError(
        "unsupported image format (RAWI, RLEI, PNG, baseline JPEG and "
        "lossless WebP supported)"
    )
