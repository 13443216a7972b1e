"""Pure-Python/numpy baseline JPEG codec (ITU-T T.81 public spec).

Counterpart of the reference file scan's JPEG support
(ocrs-cli/src/main.rs:319-323 loads PNG/JPEG/WebP via the image crate):
real corpora are mostly JPEG, and this sandbox has no native codec, so
baseline JPEG is implemented from the spec the same way the PNG reader
in codec.py is.

Decoder: baseline sequential DCT (SOF0/SOF1), 8-bit, grey or YCbCr,
any sampling factors with integer ratios (4:4:4, 4:2:2, 4:2:0),
restart intervals. Progressive (SOF2), arithmetic coding, 12-bit and
hierarchical JPEG raise UnsupportedImageError.

Encoder: baseline, standard Annex K quantization (IJG quality scaling)
and Huffman tables, 4:4:4 or 4:2:0 — used to produce test fixtures and
as the sink-side counterpart (the reference CLI only decodes JPEG).

Throughput note: the DCT/IDCT and color transforms are vectorized
numpy over whole planes; the entropy coder is a per-symbol Python
loop, fine for fixtures and unit tests. In the Spark pipeline decode
happens inside mapInPandas where a real deployment would swap in a
native codec via the same decode_image seam.
"""

from __future__ import annotations

import struct

import numpy as np

from .codec import UnsupportedImageError

# ------------------------------------------------------------ constants

# Annex K.1 / K.2 base quantization tables (row-major 8x8).
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
).reshape(8, 8)

_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
).reshape(8, 8)

# Annex K.3 standard Huffman tables: (BITS[1..16], HUFFVAL).
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _zigzag_positions():
    """Zigzag scan order: list of (row, col), index 0..63."""
    out = []
    for d in range(15):
        diag = [(d - k, k) for k in range(max(0, d - 7), min(d, 7) + 1)]
        if d % 2 == 1:
            diag.reverse()
        out.extend(diag)
    return out


_ZIGZAG = _zigzag_positions()
# flat index (row*8+col) of the i-th zigzag entry
_ZIGZAG_FLAT = np.array([r * 8 + c for r, c in _ZIGZAG])
_UNZIGZAG = np.argsort(_ZIGZAG_FLAT)  # natural flat index -> zigzag index

# Orthonormal DCT-II basis: dct2(B) = _C @ B @ _C.T, idct2 = _C.T @ B @ _C.
_C = np.zeros((8, 8))
for _u in range(8):
    _cu = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _C[_u, _x] = 0.5 * _cu * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _scaled_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (1..100)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.floor((base * scale + 50) / 100)
    return np.clip(q, 1, 255)


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: value -> (code, length)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman: (length, code) -> value."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


# ------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (size, appended bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_blocks(writer, plane, qtable, dc_codes, ac_codes, pred):
    """DCT + quantize + Huffman-encode every 8x8 block of a plane (row-
    major block order). Returns the updated DC predictor."""
    h, w = plane.shape
    shifted = plane.astype(np.float64) - 128.0
    # Vectorized 2D DCT of all blocks at once.
    blocks = shifted.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    coefs = np.einsum("ux,ryxc,cv->ryuv", _C, blocks, _C.T)
    quant = np.round(coefs / qtable).astype(np.int32)
    for by in range(quant.shape[0]):
        for bx in range(quant.shape[1]):
            pred = _encode_one_block(writer, quant[by, bx], dc_codes, ac_codes, pred)
    return pred


def _encode_one_block(writer, qblock, dc_codes, ac_codes, pred):
    zz = qblock.reshape(-1)[_ZIGZAG_FLAT]
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    size, bits = _magnitude(diff)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(bits, size)
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    end = (last_nz[-1] + 2) if last_nz.size else 1
    for k in range(1, end):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(bits, size)
        run = 0
    if end < 64:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return pred


def _pad_to(plane: np.ndarray, mult_h: int, mult_w: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult_h
    pw = (-w) % mult_w
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _rgb_to_ycbcr(img: np.ndarray):
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _dqt_segment(tid: int, qtable: np.ndarray) -> bytes:
    zz = qtable.reshape(-1)[_ZIGZAG_FLAT].astype(np.uint8)
    return b"\xff\xdb" + struct.pack(">HB", 2 + 1 + 64, tid) + zz.tobytes()


def _dht_segment(tclass: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload


def encode_jpeg(img: np.ndarray, quality: int = 85, subsample: bool = False) -> bytes:
    """Encode an HW / HW1 (grey) or HWC-RGB uint8 array as baseline
    JPEG. ``subsample=True`` emits 4:2:0 chroma (2x2-averaged), else
    4:4:4."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    grey = img.ndim == 2
    if not grey and img.shape[2] != 3:
        raise UnsupportedImageError(f"cannot JPEG-encode {img.shape[2]} channels")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise UnsupportedImageError("empty image")

    qy = _scaled_qtable(_Q_LUMA, quality)
    qc = _scaled_qtable(_Q_CHROMA, quality)
    dc_y = _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_y = _build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _build_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(
        [1, 1, 0]
    ) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    out += _dqt_segment(0, qy)
    if not grey:
        out += _dqt_segment(1, qc)

    if grey:
        comps = [(1, 1, 1, 0)]
    elif subsample:
        comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    else:
        comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hs, vs, tq in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    out += _dht_segment(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += _dht_segment(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    if not grey:
        out += _dht_segment(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        out += _dht_segment(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)

    sos = bytes([len(comps)])
    for cid, _, _, tq in comps:
        sos += bytes([cid, (tq << 4) | tq])  # DC/AC table id == quant id
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    writer = _BitWriter()
    if grey:
        plane = _pad_to(img.astype(np.float64), 8, 8)
        _encode_blocks(writer, plane, qy, dc_y, ac_y, 0)
    else:
        y, cb, cr = _rgb_to_ycbcr(img)
        if subsample:
            y = _pad_to(y, 16, 16)
            cb = _pad_to(cb, 16, 16)
            cr = _pad_to(cr, 16, 16)
            # 2x2 box average, then the chroma planes are 8|: one block
            # per MCU.
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3))
            preds = {1: 0, 2: 0, 3: 0}
            # Interleaved MCUs: 4 Y blocks (2x2), 1 Cb, 1 Cr per MCU.
            # Quantize whole planes once, then emit in MCU order.
            planes = {1: (y, qy, dc_y, ac_y), 2: (cb, qc, dc_c, ac_c), 3: (cr, qc, dc_c, ac_c)}
            quants = {}
            for cid, (p, q, _, _) in planes.items():
                sh = p.astype(np.float64) - 128.0
                blocks = sh.reshape(p.shape[0] // 8, 8, p.shape[1] // 8, 8).transpose(0, 2, 1, 3)
                quants[cid] = np.round(
                    np.einsum("ux,ryxc,cv->ryuv", _C, blocks, _C.T) / q
                ).astype(np.int32)
            mcuy, mcux = y.shape[0] // 16, y.shape[1] // 16
            for my in range(mcuy):
                for mx in range(mcux):
                    for by in range(2):
                        for bx in range(2):
                            preds[1] = _encode_one_block(
                                writer, quants[1][my * 2 + by, mx * 2 + bx], dc_y, ac_y, preds[1]
                            )
                    preds[2] = _encode_one_block(writer, quants[2][my, mx], dc_c, ac_c, preds[2])
                    preds[3] = _encode_one_block(writer, quants[3][my, mx], dc_c, ac_c, preds[3])
        else:
            y = _pad_to(y, 8, 8)
            cb = _pad_to(cb, 8, 8)
            cr = _pad_to(cr, 8, 8)
            planes = [(y, qy, dc_y, ac_y), (cb, qc, dc_c, ac_c), (cr, qc, dc_c, ac_c)]
            quants = []
            for p, q, dcc, acc in planes:
                sh = p.astype(np.float64) - 128.0
                blocks = sh.reshape(p.shape[0] // 8, 8, p.shape[1] // 8, 8).transpose(0, 2, 1, 3)
                quants.append(np.round(np.einsum("ux,ryxc,cv->ryuv", _C, blocks, _C.T) / q).astype(np.int32))
            preds = [0, 0, 0]
            mcuy, mcux = y.shape[0] // 8, y.shape[1] // 8
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci, (_, _, dcc, acc) in enumerate(planes):
                        preds[ci] = _encode_one_block(writer, quants[ci][my, mx], dcc, acc, preds[ci])
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------- decoder


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill_byte(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed
            else:
                # Marker mid-entropy-data: treat as truncated stream
                # padding (spec allows optional fill before markers).
                self.pos -= 1
                b = 0
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill_byte()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.acc = 0
        self.nbits = 0
        if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2
            return
        raise UnsupportedImageError("expected JPEG restart marker")


def _read_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bits(1)
        v = table.get((length, code))
        if v is not None:
            return v
    raise UnsupportedImageError("invalid JPEG Huffman code")


def _receive_extend(br: _BitReader, size: int) -> int:
    if size == 0:
        return 0
    v = br.read_bits(size)
    if v < (1 << (size - 1)):
        v -= (1 << size) - 1
    return v


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG to an HWC uint8 array (1 or 3 channels)."""
    if data[:2] != b"\xff\xd8":
        raise UnsupportedImageError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            raise UnsupportedImageError("bad JPEG marker stream")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 15
                if prec != 0:
                    raise UnsupportedImageError("16-bit quant tables unsupported")
                zz = np.frombuffer(seg, dtype=np.uint8, count=64, offset=p + 1)
                q = np.zeros(64)
                q[_ZIGZAG_FLAT] = zz
                qtables[tid] = q.reshape(8, 8).astype(np.float64)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tclass, tid = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                htables[(tclass, tid)] = _build_decoder(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise UnsupportedImageError(f"{prec}-bit JPEG unsupported")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedImageError(
                "only baseline sequential JPEG supported (progressive/arithmetic/lossless found)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            # The decoder handles a single interleaved scan covering every
            # frame component; a spec-valid multi-scan baseline file
            # (ns < frame component count) must fail loudly here rather
            # than KeyError/garble downstream.
            if frame is not None and ns != len(frame["comps"]):
                raise UnsupportedImageError(
                    "non-interleaved (multi-scan) baseline JPEG unsupported"
                )
            tables = {}
            for i in range(ns):
                cid, tt = seg[1 + 2 * i : 3 + 2 * i]
                tables[cid] = (tt >> 4, tt & 15)
            scan = {"tables": tables, "entropy_start": pos + seglen}
            break
        pos += seglen
    if frame is None or scan is None:
        raise UnsupportedImageError("JPEG missing SOF/SOS")

    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or any(
        hmax % c["h"] or vmax % c["v"] for c in comps
    ):
        raise UnsupportedImageError("non-integer JPEG sampling ratios unsupported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    br = _BitReader(data, scan["entropy_start"])
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    }
    preds = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.restart()
                preds = {c["id"]: 0 for c in comps}
            for c in comps:
                dc_tid, ac_tid = scan["tables"][c["id"]]
                dc_tbl = htables[(0, dc_tid)]
                ac_tbl = htables[(1, ac_tid)]
                q = qtables[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64)
                        s = _read_huff(br, dc_tbl)
                        preds[c["id"]] += _receive_extend(br, s)
                        zz[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _read_huff(br, ac_tbl)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise UnsupportedImageError("JPEG AC run overflow")
                            zz[k] = _receive_extend(br, s)
                            k += 1
                        coefs = np.zeros(64)
                        coefs[_ZIGZAG_FLAT] = zz
                        block = _C.T @ (coefs.reshape(8, 8) * q) @ _C + 128.0
                        py = (my * c["v"] + by) * 8
                        px = (mx * c["h"] + bx) * 8
                        planes[c["id"]][py : py + 8, px : px + 8] = block
            mcu_count += 1

    out_planes = []
    for c in comps:
        p = planes[c["id"]]
        ch = -(-h * c["v"] // vmax)
        cw = -(-w * c["h"] // hmax)
        p = p[:ch, :cw]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out_planes.append(p[:h, :w])

    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    if len(out_planes) != 3:
        raise UnsupportedImageError(f"{len(out_planes)}-component JPEG unsupported")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
