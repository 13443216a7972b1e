"""From-spec GIF87a/89a decode (+ a minimal conformant encoder) —
stdlib+numpy only, extending the engine's image surface a fourth
format beyond the reference triad (PNG/JPEG/WebP mirror the reference
CLI's `image` crate features; GIF is everywhere in web crawls).

Decoder implements real LZW: little-endian bit unpacking across data
sub-blocks, dictionary growth with code-width escalation to 12 bits,
CLEAR re-initialization, EOI, and the KwKwK self-referential case —
plus logical-screen / global-color-table / graphic-control-extension
/ image-descriptor parsing. Interlaced images are rejected explicitly
(documented; rare in OCR corpora).

Encoder uses the classic "uncompressed GIF" technique (public domain
folklore, documented in the GIF89a spec's own terms): emit literal
codes only, inserting CLEAR before the decoder's next-code counter
would force a width change, so every code stays min_code_size+1 bits.
A decoder that mishandles CLEAR or width growth cannot read these
streams — which is exactly what the round-trip tests exercise.
"""

from __future__ import annotations

import struct

import numpy as np

from .codec import UnsupportedImageError


class GifError(UnsupportedImageError):
    """Subclasses the dispatcher's error type so corrupt/unsupported
    GIFs flow through the same quarantine path as every other format
    (codec.py's decode_image contract)."""


def _lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader over the concatenated sub-block payload
    bitpos = 0
    total_bits = 8 * len(data)

    def read(width):
        nonlocal bitpos
        if bitpos + width > total_bits:
            raise GifError("LZW stream truncated")
        v = 0
        for i in range(width):
            byte = data[(bitpos + i) >> 3]
            v |= ((byte >> ((bitpos + i) & 7)) & 1) << i
        bitpos += width
        return v

    table: list[bytes] = []

    def reset():
        nonlocal table, width, next_code
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        next_code = eoi + 1

    width = min_code_size + 1
    next_code = eoi + 1
    reset()
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == clear:
            reset()
            prev = None
            continue
        if code == eoi:
            break
        if code < next_code:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise GifError("bad LZW code")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table.append(prev + entry[:1])
            next_code += 1
            # GIF width growth (giflib/Mozilla/stb convention): the
            # code space is full once next_code reaches 2^width, so
            # grow then. (The grow-at-2^width-1 "early change" rule
            # belongs to TIFF's LZW variant, not GIF.)
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) >= n_expected:
            # spec: trailing EOI may follow; stop decoding pixels
            break
    if len(out) < n_expected:
        raise GifError("LZW produced too few pixels")
    return bytes(out[:n_expected])


def _lzw_encode_uncompressed(min_code_size: int, pixels: bytes) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # After CLEAR, next_code = eoi+1 and grows by 1 per emitted code
    # (from the second code on); stay below 1<<width by clearing.
    span = (1 << width) - (eoi + 1) - 1
    bits = bytearray()
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for i, p in enumerate(pixels):
        if i and i % span == 0:
            emit(clear)
        emit(p)
    emit(eoi)
    if nbits:
        bits.append(acc & 0xFF)
    for i in range(0, len(bits), 255):
        block = bits[i : i + 255]
        out.append(len(block))
        out.extend(block)
    out.append(0)
    return bytes(out)


def encode_gif(img: np.ndarray, delay_cs: int = 0) -> bytes:
    """Greyscale HxW uint8 -> single-frame GIF89a with a 256-entry
    greyscale global color table (index i == intensity i) and a GCE
    carrying ``delay_cs``."""
    return encode_gif_animated([img], [delay_cs])


def encode_gif_animated(
    frames: list[np.ndarray], delays_cs: list[int]
) -> bytes:
    """Multi-frame GIF89a: NETSCAPE2.0 loop block, then one GCE +
    image descriptor + LZW stream per frame (all full-canvas,
    disposal 'none' — the subset the decoder supports)."""
    if not frames or len(frames) != len(delays_cs):
        raise GifError("frames/delays mismatch")
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0xF7, 0, 0])  # GCT present, 8-bit, 256 entries
    for i in range(256):
        out += bytes([i, i, i])
    if len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for img, delay in zip(frames, delays_cs):
        if img.ndim != 2 or img.dtype != np.uint8 or img.shape != (h, w):
            raise GifError("encoder takes equal-shape HxW uint8 frames")
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay) + b"\x00\x00"
        out += b"," + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += bytes([8]) + _lzw_encode_uncompressed(8, img.tobytes())
    out += b";"
    return bytes(out)


def decode_gif(data: bytes):
    """-> (first frame as uint8 array — HxW grey, or HxWx3 RGB for a
    color palette — and its delay_cs). Single-frame convenience
    wrapper over ``decode_gif_frames``."""
    frames = decode_gif_frames(data)
    return frames[0][1], frames[0][0]


def decode_gif_frames(data: bytes):
    """-> list of (delay_cs, frame), one per image descriptor, each
    GCE applying to the NEXT descriptor per the spec. A greyscale
    palette (r==g==b for every entry — all GIFs this engine writes)
    decodes to an HxW uint8 grey frame; a color palette expands to
    HxWx3 RGB, matching the PNG palette path (codec.py). Rejects
    interlace and local color tables (documented subset; the
    synthesized corpus never emits them)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF")
    if len(data) < 14:
        raise GifError("truncated GIF header")
    try:
        return _parse_frames(data)
    except (IndexError, ValueError, struct.error) as e:
        # Block/extension walking indexes freely; a truncated or
        # corrupt stream must surface as GifError so it flows through
        # decode_image's quarantine path, not crash the task.
        raise GifError(f"truncated GIF ({e})") from e


def _parse_frames(data: bytes):
    w, h = struct.unpack("<HH", data[6:10])
    packed, _bg, _aspect = data[10], data[11], data[12]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(-1, 3)
        pos += 3 * n
    delay_cs = 0
    frames_out = []
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9:
                sz = data[pos]
                delay_cs = struct.unpack(
                    "<H", data[pos + 2 : pos + 4]
                )[0]
                pos += 1 + sz
            while data[pos] != 0:  # remaining sub-blocks
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            ix, iy, iw, ih = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
            ipacked = data[pos + 9]
            pos += 10
            if ipacked & 0x40:
                raise GifError("interlaced GIF not supported")
            if ipacked & 0x80:
                raise GifError("local color table not supported")
            if (ix, iy, iw, ih) != (0, 0, w, h):
                raise GifError("partial-frame GIF not supported")
            min_code = data[pos]
            pos += 1
            stream = bytearray()
            while data[pos] != 0:
                n = data[pos]
                stream += data[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1
            idx = np.frombuffer(
                _lzw_decode(min_code, bytes(stream), w * h), np.uint8
            ).reshape(h, w)
            if gct is None:
                raise GifError("missing color table")
            if idx.max(initial=0) >= gct.shape[0]:
                raise GifError("palette index out of range")
            if np.array_equal(gct[:, 0], gct[:, 1]) and np.array_equal(
                gct[:, 0], gct[:, 2]
            ):
                frame = gct[idx.ravel(), 0].reshape(h, w)
            else:
                frame = gct[idx.ravel()].reshape(h, w, 3)
            frames_out.append((delay_cs, frame.copy()))
            delay_cs = 0  # a GCE scopes only the next descriptor
        elif b == 0x3B:  # trailer
            break
        else:
            raise GifError(f"unexpected GIF block 0x{b:02x}")
    if not frames_out:
        raise GifError("no image data in GIF")
    return frames_out
