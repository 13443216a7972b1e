"""Pure-Python lossless WebP (VP8L) codec.

Implemented from the public container/bitstream specs (RIFF container +
"WebP Lossless Bitstream Specification"); no reference code reused. The
reference CLI's file scan accepts .webp alongside .png/.jpeg
(ocrs-cli/src/main.rs:319-323, via the ``image`` crate) — this module
closes that gap for the Spark-side file source.

Decoder coverage: the full VP8L feature set — all four transforms
(predictor, color, subtract-green, color-indexing incl. pixel
bundling), color cache, LZ77 backward references with the short-range
distance map, meta prefix codes, simple and code-length-coded prefix
codes. Lossy VP8 chunks raise UnsupportedImageError.

Encoder: lossless VP8L with real canonical Huffman coding
(length-limited via package-merge), greedy LZ77 emission (horizontal
runs + copy-row-above, the two distances that dominate rasters),
optional color-indexing with pixel bundling (auto for <= 16 distinct
colors), optional subtract-green transform and color cache.
"""

from __future__ import annotations

import struct

import numpy as np

from .codec import UnsupportedImageError

# Order in which code-length-code lengths are stored (spec constant).
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

_NUM_LITERALS = 256
_NUM_LENGTH_CODES = 24
_NUM_DISTANCE_CODES = 40
_GREEN_BASE = _NUM_LITERALS + _NUM_LENGTH_CODES  # cache codes start here

# Short-range LZ77 distance map: plane codes 1..120 address a pixel
# neighborhood as (dx, dy); dist = dy * xsize + dx (min 1).
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _add_px(a: int, b: int) -> int:
    """Componentwise modulo-256 sum of two ARGB pixels."""
    return (
        (((a >> 24) + (b >> 24)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    )


def _sub_px(a: int, b: int) -> int:
    return (
        (((a >> 24) - (b >> 24)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) - ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) - ((b >> 8) & 0xFF)) & 0xFF) << 8
        | (((a & 0xFF) - (b & 0xFF)) & 0xFF)
    )


def _cache_hash(argb: int, bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


# ------------------------------------------------------------- bit I/O


class _BitReader:
    """LSB-first bit reader over the VP8L payload."""

    def __init__(self, data: bytes, pos: int = 0):
        self._data = data
        self._byte = pos
        self._bit = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self._byte >= len(self._data):
                raise UnsupportedImageError("truncated VP8L stream")
            bit = (self._data[self._byte] >> self._bit) & 1
            v |= bit << i
            self._bit += 1
            if self._bit == 8:
                self._bit = 0
                self._byte += 1
        return v


class _BitWriter:
    def __init__(self):
        self._out = bytearray()
        self._cur = 0
        self._bit = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            if (value >> i) & 1:
                self._cur |= 1 << self._bit
            self._bit += 1
            if self._bit == 8:
                self._out.append(self._cur)
                self._cur = 0
                self._bit = 0

    def write_code(self, code: int, length: int) -> None:
        """Write a prefix code MSB-first (mirror of tree traversal)."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytes(self._out)
        if self._bit:
            out += bytes([self._cur])
        return out


# -------------------------------------------------------- prefix codes


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment (shorter codes
    first; ties by symbol order), as in DEFLATE."""
    pairs = sorted(
        (l, s) for s, l in enumerate(lengths) if l > 0
    )
    codes = {}
    code = 0
    prev_len = 0
    for l, s in pairs:
        code <<= l - prev_len
        prev_len = l
        codes[s] = (code, l)
        code += 1
    return codes


class _PrefixCode:
    """Decoder for one prefix code; 0-bit single-symbol codes allowed."""

    def __init__(self, single=None, table=None, max_len=0):
        self._single = single
        self._table = table or {}
        self._max_len = max_len

    @classmethod
    def from_lengths(cls, lengths: list[int]) -> "_PrefixCode":
        nonzero = [(s, l) for s, l in enumerate(lengths) if l > 0]
        if not nonzero:
            raise UnsupportedImageError("empty prefix code")
        if len(nonzero) == 1:
            return cls(single=nonzero[0][0])
        kraft = sum(1 << (15 - l) for _, l in nonzero)
        if kraft != 1 << 15:
            raise UnsupportedImageError("incomplete/overfull prefix code")
        codes = _canonical_codes(lengths)
        table = {(l, c): s for s, (c, l) in codes.items()}
        return cls(table=table, max_len=max(l for _, l in nonzero))

    @classmethod
    def from_symbols(cls, symbols: list[int]) -> "_PrefixCode":
        if len(symbols) == 1:
            return cls(single=symbols[0])
        # Two symbols, 1 bit each, codes assigned in READ order.
        return cls(table={(1, 0): symbols[0], (1, 1): symbols[1]}, max_len=1)

    def read(self, br: _BitReader) -> int:
        if self._single is not None:
            return self._single
        code = 0
        for length in range(1, self._max_len + 1):
            code = (code << 1) | br.read(1)
            sym = self._table.get((length, code))
            if sym is not None:
                return sym
        raise UnsupportedImageError("invalid prefix code in VP8L stream")


def _read_prefix_code(br: _BitReader, alphabet: int) -> _PrefixCode:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        s0 = br.read(8 if first_8bit else 1)
        syms = [s0]
        if num_symbols == 2:
            syms.append(br.read(8))
        return _PrefixCode.from_symbols(syms)
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode.from_lengths(cl_lengths)
    if br.read(1):
        nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev_len = 8
    i = 0
    while i < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = cl_code.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev_len = s
        else:
            if s == 16:
                rep, fill = 3 + br.read(2), prev_len
            elif s == 17:
                rep, fill = 3 + br.read(3), 0
            else:
                rep, fill = 11 + br.read(7), 0
            if i + rep > alphabet:
                raise UnsupportedImageError("prefix code length overflow")
            for _ in range(rep):
                lengths[i] = fill
                i += 1
    return _PrefixCode.from_lengths(lengths)


def _lz77_value(sym: int, br: _BitReader) -> int:
    """Length/distance prefix decoding (spec 'LZ77 prefix coding')."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.read(extra) + 1


def _lz77_code(value: int) -> tuple[int, int, int]:
    """Inverse of _lz77_value: value -> (symbol, extra, extra_bits).
    Symbol s >= 4 covers (offset, offset + 2^extra] with
    offset = (2 + (s & 1)) << extra, so the bit count for ``value`` is
    derived from value - 1 (the top of each range is a power-of-two
    boundary that belongs to the LOWER bit count)."""
    if value <= 4:
        return value - 1, 0, 0
    bits = (value - 1).bit_length() - 2
    if value > (3 << bits):
        sym = 2 * bits + 3
        extra = value - (3 << bits) - 1
    else:
        sym = 2 * bits + 2
        extra = value - (2 << bits) - 1
    return sym, extra, bits


def _plane_to_dist(plane: int, xsize: int) -> int:
    if plane > 120:
        return plane - 120
    dx, dy = _DIST_MAP[plane - 1]
    return max(1, dy * xsize + dx)


# ------------------------------------------------------------- decoder


class _CodeGroup:
    __slots__ = ("green", "red", "blue", "alpha", "dist")

    def __init__(self, green, red, blue, alpha, dist):
        self.green, self.red, self.blue = green, red, blue
        self.alpha, self.dist = alpha, dist


def _decode_stream(br: _BitReader, w: int, h: int, level0: bool) -> list[int]:
    transforms = []
    if level0:
        seen = set()
        while br.read(1):
            t = br.read(2)
            if t in seen:
                raise UnsupportedImageError("duplicate VP8L transform")
            seen.add(t)
            if t == 2:  # subtract green
                transforms.append(("subgreen",))
            elif t in (0, 1):  # predictor / color transform
                bits = br.read(3) + 2
                sw, sh = _subsample(w, bits), _subsample(h, bits)
                sub = _decode_stream(br, sw, sh, False)
                kind = "pred" if t == 0 else "color"
                transforms.append((kind, bits, sub, sw))
            else:  # color indexing
                psize = br.read(8) + 1
                pal = _decode_stream(br, psize, 1, False)
                for i in range(1, psize):
                    pal[i] = _add_px(pal[i], pal[i - 1])
                if psize <= 2:
                    wb = 3
                elif psize <= 4:
                    wb = 2
                elif psize <= 16:
                    wb = 1
                else:
                    wb = 0
                transforms.append(("palette", wb, pal, w))
                w = _subsample(w, wb)  # decode over the PACKED width

    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits and not 1 <= cache_bits <= 11:
        raise UnsupportedImageError("invalid color cache size")

    meta = None
    meta_w = prefix_bits = 0
    n_groups = 1
    if level0 and br.read(1):
        prefix_bits = br.read(3) + 2
        meta_w, meta_h = _subsample(w, prefix_bits), _subsample(h, prefix_bits)
        meta_px = _decode_stream(br, meta_w, meta_h, False)
        meta = [((p >> 8) & 0xFFFF) for p in meta_px]
        n_groups = max(meta) + 1

    green_alphabet = _GREEN_BASE + (1 << cache_bits if cache_bits else 0)
    groups = [
        _CodeGroup(
            _read_prefix_code(br, green_alphabet),
            _read_prefix_code(br, _NUM_LITERALS),
            _read_prefix_code(br, _NUM_LITERALS),
            _read_prefix_code(br, _NUM_LITERALS),
            _read_prefix_code(br, _NUM_DISTANCE_CODES),
        )
        for _ in range(n_groups)
    ]

    n = w * h
    buf = [0] * n
    cache = [0] * (1 << cache_bits) if cache_bits else None
    pos = 0
    g = groups[0]
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            g = groups[meta[(y >> prefix_bits) * meta_w + (x >> prefix_bits)]]
        s = g.green.read(br)
        if s < _NUM_LITERALS:
            # Literal channel order per spec: green, red, blue, alpha.
            red = g.red.read(br)
            blue = g.blue.read(br)
            alpha = g.alpha.read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            buf[pos] = px
            pos += 1
            if cache is not None:
                cache[_cache_hash(px, cache_bits)] = px
        elif s < _GREEN_BASE:
            length = _lz77_value(s - _NUM_LITERALS, br)
            plane = _lz77_value(g.dist.read(br), br)
            dist = _plane_to_dist(plane, w)
            if dist > pos or pos + length > n:
                raise UnsupportedImageError("invalid LZ77 reference")
            for _ in range(length):
                px = buf[pos - dist]
                buf[pos] = px
                pos += 1
                if cache is not None:
                    cache[_cache_hash(px, cache_bits)] = px
        else:
            if cache is None:
                raise UnsupportedImageError("cache code without color cache")
            buf[pos] = cache[s - _GREEN_BASE]
            pos += 1

    # Inverse transforms apply in reverse of stream order (only the
    # color-indexing inverse changes the working width).
    for t in reversed(transforms):
        if t[0] == "subgreen":
            buf = _inv_subtract_green(buf)
        elif t[0] == "pred":
            buf = _inv_predictor(buf, w, h, t[1], t[2], t[3])
        elif t[0] == "color":
            buf = _inv_color_transform(buf, w, h, t[1], t[2], t[3])
        else:
            buf, w = _inv_palette(buf, w, h, t[1], t[2], t[3])
    return buf


def _inv_subtract_green(buf: list[int]) -> list[int]:
    out = [0] * len(buf)
    for i, px in enumerate(buf):
        gch = (px >> 8) & 0xFF
        r = ((px >> 16) & 0xFF) + gch & 0xFF
        b = (px & 0xFF) + gch & 0xFF
        out[i] = (px & 0xFF00FF00) | (r << 16) | b
    return out


def _avg2(a: int, b: int) -> int:
    """Per-channel average of two ARGB pixels."""
    return (
        ((((a >> 24) + (b >> 24)) >> 1) << 24)
        | (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16)
        | (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8)
        | (((a & 0xFF) + (b & 0xFF)) >> 1)
    )


def _channels(px: int) -> tuple[int, int, int, int]:
    return (px >> 24) & 0xFF, (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF


def _select(left: int, top: int, topleft: int) -> int:
    # p = L + T - TL per channel; choose the neighbor closer to p.
    lt = zip(_channels(left), _channels(top), _channels(topleft))
    p_vs = [(lc + tc - tlc) for lc, tc, tlc in lt]
    pl = sum(
        abs(p - lc) for p, lc in zip(p_vs, _channels(left))
    )
    pt = sum(
        abs(p - tc) for p, tc in zip(p_vs, _channels(top))
    )
    return top if pt <= pl else left


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        c = _clamp(((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF))
        out |= c << sh
    return out


def _clamp_add_sub_half(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        ave = (((l >> sh) & 0xFF) + ((t >> sh) & 0xFF)) >> 1
        delta = ave - ((tl >> sh) & 0xFF)
        # C-style truncation toward zero for the halving.
        half = delta // 2 if delta >= 0 else -((-delta) // 2)
        out |= _clamp(ave + half) << sh
    return out


def _predict(mode: int, l: int, t: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(l, t, tl)
    raise UnsupportedImageError(f"invalid predictor mode {mode}")


def _inv_predictor(
    buf: list[int], w: int, h: int, bits: int, pred_img: list[int], pred_w: int
) -> list[int]:
    for pos in range(w * h):
        x, y = pos % w, pos // w
        if x == 0 and y == 0:
            mode = 0
        elif y == 0:
            mode = 1  # top row predicts from L
        elif x == 0:
            mode = 2  # left column predicts from T
        else:
            mode = (pred_img[(y >> bits) * pred_w + (x >> bits)] >> 8) & 0xFF
        l = buf[pos - 1] if x > 0 else 0
        t = buf[pos - w] if y > 0 else 0
        tl = buf[pos - w - 1] if (x > 0 and y > 0) else 0
        # Right edge: TR wraps to the first (already reconstructed)
        # pixel of the current row — the spec's contiguous-buffer rule.
        tr = buf[pos - w + 1] if y > 0 else 0
        buf[pos] = _add_px(buf[pos], _predict(mode, l, t, tl, tr))
    return buf


def _int8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _ct_delta(t: int, c: int) -> int:
    return (_int8(t) * _int8(c)) >> 5


def _inv_color_transform(
    buf: list[int], w: int, h: int, bits: int, ct_img: list[int], ct_w: int
) -> list[int]:
    for pos in range(w * h):
        x, y = pos % w, pos // w
        cte = ct_img[(y >> bits) * ct_w + (x >> bits)]
        g2r = cte & 0xFF  # blue channel
        g2b = (cte >> 8) & 0xFF  # green channel
        r2b = (cte >> 16) & 0xFF  # red channel
        px = buf[pos]
        gch = (px >> 8) & 0xFF
        red = (((px >> 16) & 0xFF) + _ct_delta(g2r, gch)) & 0xFF
        blue = ((px & 0xFF) + _ct_delta(g2b, gch) + _ct_delta(r2b, red)) & 0xFF
        buf[pos] = (px & 0xFF00FF00) | (red << 16) | blue
    return buf


def _inv_palette(
    buf: list[int], packed_w: int, h: int, wb: int, palette: list[int], orig_w: int
) -> tuple[list[int], int]:
    if wb == 0:
        out = [
            palette[(px >> 8) & 0xFF] if ((px >> 8) & 0xFF) < len(palette) else 0
            for px in buf
        ]
        return out, orig_w
    bits_pp = 8 >> wb
    mask = (1 << bits_pp) - 1
    xmask = (1 << wb) - 1
    out = [0] * (orig_w * h)
    for y in range(h):
        row = y * packed_w
        orow = y * orig_w
        for x in range(orig_w):
            gch = (buf[row + (x >> wb)] >> 8) & 0xFF
            idx = (gch >> ((x & xmask) * bits_pp)) & mask
            out[orow + x] = palette[idx] if idx < len(palette) else 0
    return out, orig_w


def decode_vp8l(payload: bytes) -> tuple[int, int, bool, list[int]]:
    """Decode a VP8L chunk payload -> (width, height, alpha_bit, argb)."""
    if not payload or payload[0] != 0x2F:
        raise UnsupportedImageError("bad VP8L signature")
    br = _BitReader(payload, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    alpha_used = bool(br.read(1))
    if br.read(3) != 0:
        raise UnsupportedImageError("unsupported VP8L version")
    return w, h, alpha_used, _decode_stream(br, w, h, True)


def _iter_chunks(data: bytes, pos: int):
    """Yield (fourcc, body) over a RIFF chunk sequence (even-padded)."""
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        yield fourcc, data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)


def _decode_alph(body: bytes, w: int, h: int) -> np.ndarray:
    """Decode an ALPH chunk -> (h, w) uint8 alpha plane.

    Header byte: rsv(2) | P preprocessing(2) | F filtering(2) |
    C compression(2). C=0 raw bytes, C=1 headerless VP8L stream whose
    GREEN channel carries the alpha values; filtering is the per-pixel
    left/above/gradient predictor applied after decompression.
    Preprocessing (level reduction) is encoder-side only."""
    if not body:
        raise UnsupportedImageError("empty ALPH chunk")
    head = body[0]
    filt = (head >> 2) & 0x3
    comp = head & 0x3
    if comp == 0:
        if len(body) < 1 + w * h:
            raise UnsupportedImageError("short raw ALPH chunk")
        plane = np.frombuffer(body, np.uint8, count=w * h, offset=1).copy()
    elif comp == 1:
        argb = _decode_stream(_BitReader(body, 1), w, h, True)
        plane = (
            (np.array(argb, dtype=np.uint32).reshape(-1) >> 8) & 0xFF
        ).astype(np.uint8)
    else:
        raise UnsupportedImageError(f"unknown ALPH compression {comp}")
    plane = plane.reshape(h, w)
    if filt == 0:
        pass
    elif filt == 1:
        # Horizontal: pred = left (first col: above; (0,0): 0). The
        # reconstruction is an exact prefix sum mod 256: first column
        # chains vertically, then each row accumulates rightward.
        plane = plane.astype(np.int64)
        plane[:, 0] = np.cumsum(plane[:, 0]) & 0xFF
        plane = np.cumsum(plane, axis=1) & 0xFF
    elif filt == 2:
        # Vertical: pred = above (first row: left; (0,0): 0) — the
        # transpose of the horizontal case.
        plane = plane.astype(np.int64)
        plane[0, :] = np.cumsum(plane[0, :]) & 0xFF
        plane = np.cumsum(plane, axis=0) & 0xFF
    else:
        # Gradient: pred = clip(left + above - topleft). The recurrence
        # is sequential per pixel, but every cell on anti-diagonal
        # y + x = d depends only on diagonals d-1 (left, above) and d-2
        # (topleft). Skewing the plane (row y shifted right by y) turns
        # anti-diagonals into contiguous COLUMNS, so the whole image
        # decodes in O(w + h) vectorized column steps instead of
        # O(w * h) Python-interpreted ones (first row chains on left,
        # first column on above, like the directional filters).
        first_row = (np.cumsum(plane[0, :], dtype=np.int64) & 0xFF).astype(np.int16)
        first_col = (np.cumsum(plane[:, 0], dtype=np.int64) & 0xFF).astype(np.int16)
        # T[d, y] = plane[y, d - y]; each diagonal is a CONTIGUOUS row
        # (int16 holds every intermediate: values are 0..255, the pred
        # sum is bounded by 510). left -> T[d-1, y], above -> T[d-1, y-1],
        # topleft -> T[d-2, y-1] — all contiguous row slices. Built
        # transposed directly (h strided row-writes, the only layout
        # cost) to avoid extra full-plane copies: this host faults in
        # fresh pages at ~20 MB/s, so every avoided buffer matters.
        T = np.zeros((w + h - 1, h), np.int16)
        diag = np.arange(w)
        for y in range(h):
            T[y + diag, y] = plane[y]
        T[:w, 0] = first_row
        T[np.arange(h), np.arange(h)] = first_col
        for d in range(2, w + h - 1):
            y0 = max(1, d - w + 1)
            y1 = min(h - 1, d - 1)
            if y0 > y1:
                continue
            s = slice(y0, y1 + 1)
            sm1 = slice(y0 - 1, y1)
            pred = np.clip(T[d - 1, s] + T[d - 1, sm1] - T[d - 2, sm1], 0, 255)
            T[d, s] = (T[d, s] + pred) & 0xFF
        plane = np.empty((h, w), np.int16)
        for y in range(h):
            plane[y] = T[y + diag, y]
    return plane.astype(np.uint8)


def _vp8l_to_array(payload: bytes) -> np.ndarray:
    w, h, _, argb = decode_vp8l(payload)
    arr = np.array(argb, dtype=np.uint32).reshape(h, w)
    a = (arr >> 24).astype(np.uint8)
    r = ((arr >> 16) & 0xFF).astype(np.uint8)
    g = ((arr >> 8) & 0xFF).astype(np.uint8)
    b = (arr & 0xFF).astype(np.uint8)
    if np.all(a == 255):
        return np.stack([r, g, b], axis=-1)
    return np.stack([r, g, b, a], axis=-1)


def _decode_image_chunks(chunks) -> np.ndarray:
    """Decode a (ALPH?, VP8|VP8L) sub-chunk sequence — the image-data
    layout shared by plain files, VP8X stills, and ANMF frames."""
    alph = None
    for fourcc, body in chunks:
        if fourcc == b"ALPH":
            alph = body
        elif fourcc == b"VP8L":
            return _vp8l_to_array(body)  # VP8L carries its own alpha
        elif fourcc == b"VP8 ":
            from .vp8 import decode_vp8, yuv420_to_rgb

            rgb = yuv420_to_rgb(*decode_vp8(body))
            if alph is not None:
                h, w = rgb.shape[:2]
                a = _decode_alph(alph, w, h)
                return np.concatenate([rgb, a[:, :, None]], axis=2)
            return rgb
    raise UnsupportedImageError("no VP8/VP8L chunk in WebP file")


def decode_webp(data: bytes) -> np.ndarray:
    """Decode a WebP file to an HWC uint8 array (RGB, or RGBA when any
    pixel is non-opaque): lossless VP8L, lossy VP8 keyframes, and VP8X
    extended files (ALPH alpha plane over lossy; animation stills =
    first ANMF frame) — the still-image surface the reference reads
    through the ``image`` crate (ocrs-cli/Cargo.toml:12)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise UnsupportedImageError("not a WebP file")
    chunks = list(_iter_chunks(data, 12))
    for fourcc, body in chunks:
        if fourcc != b"VP8X":
            continue
        # Extended container: flags byte (rsv2 I L E X A R), 3 reserved
        # bytes, canvas w-1/h-1 as 24-bit LE. Stills carry (ALPH?,
        # VP8|VP8L) at the top level; animations carry ANMF frames
        # whose payload repeats the same image-data layout.
        if len(body) < 10:
            raise UnsupportedImageError("short VP8X chunk")
        animated = bool(body[0] & 0x02)
        if not animated:
            return _decode_image_chunks(chunks)
        for fc, fb in chunks:
            if fc == b"ANMF":
                # 16-byte frame header (x/y/w-1/h-1/duration/flags),
                # then the frame's image sub-chunks.
                return _decode_image_chunks(_iter_chunks(fb, 16))
        raise UnsupportedImageError("animated WebP without ANMF frame")
    return _decode_image_chunks(chunks)


# ------------------------------------------------------------- encoder


def _package_merge(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """Length-limited canonical Huffman lengths (package-merge); the
    result is always a complete prefix code for >= 2 symbols."""
    syms = sorted(s for s, f in freqs.items() if f > 0)
    if len(syms) == 1:
        return {syms[0]: 1}
    if len(syms) == 2:
        return {s: 1 for s in syms}
    if len(syms) > (1 << max_len):
        raise ValueError("alphabet too large for the length limit")
    # Boundary package-merge over (weight, {symbol: count}) items.
    orig = sorted((freqs[s], (s,)) for s in syms)
    packages: list[tuple[int, tuple]] = list(orig)
    merged = list(orig)
    for _ in range(max_len - 1):
        paired = [
            (
                packages[i][0] + packages[i + 1][0],
                packages[i][1] + packages[i + 1][1],
            )
            for i in range(0, len(packages) - 1, 2)
        ]
        merged = sorted(orig + paired)
        packages = merged
    lengths = {s: 0 for s in syms}
    for _, members in merged[: 2 * (len(syms) - 1)]:
        for s in members:
            lengths[s] += 1
    return lengths


def _write_prefix_code(
    bw: _BitWriter, freqs: dict[int, int], alphabet: int
) -> dict[int, tuple[int, int]]:
    """Emit one prefix code for the given symbol frequencies; returns
    symbol -> (code, length) for the payload writer."""
    used = sorted(s for s, f in freqs.items() if f > 0)
    if not used:
        used = [0]  # never read, but a code must be present
    if len(used) == 1 and used[0] < 256:
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        if used[0] < 2:
            bw.write(0, 1)
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)
            bw.write(used[0], 8)
        return {used[0]: (0, 0)}
    if len(used) == 2 and all(s < 256 for s in used):
        bw.write(1, 1)  # simple
        bw.write(1, 1)  # two symbols
        bw.write(1, 1)  # first symbol in 8 bits
        bw.write(used[0], 8)
        bw.write(used[1], 8)
        return {used[0]: (0, 1), used[1]: (1, 1)}

    sym_lengths = _package_merge({s: freqs.get(s, 0) for s in used}, 15)
    lengths = [sym_lengths.get(s, 0) for s in range(alphabet)]
    codes = _canonical_codes(lengths)

    bw.write(0, 1)  # code-length-coded
    cl_freq: dict[int, int] = {}
    for l in lengths:
        cl_freq[l] = cl_freq.get(l, 0) + 1
    cl_lengths_map = _package_merge(cl_freq, 7)
    cl_lengths = [cl_lengths_map.get(s, 0) for s in range(19)]
    # num_code_lengths must cover every used CL symbol's order position.
    max_order = max(
        i for i, s in enumerate(_CL_ORDER) if cl_lengths[s] > 0
    )
    num_cl = max(4, max_order + 1)
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    bw.write(0, 1)  # no max_symbol shortcut: emit all alphabet lengths
    if len(cl_lengths_map) == 1:
        cl_codes = {next(iter(cl_lengths_map)): (0, 0)}
    else:
        cl_codes = _canonical_codes(cl_lengths)
    for l in lengths:
        c, n = cl_codes[l]
        bw.write_code(c, n)
    return codes


def _emit(bw: _BitWriter, codes: dict[int, tuple[int, int]], sym: int) -> None:
    c, n = codes[sym]
    bw.write_code(c, n)


_MAX_LZ77_LEN = 4096  # spec maximum backward-reference length


def _write_entropy_image(
    bw: _BitWriter,
    pixels: list[int],
    cache_bits: int,
    level0: bool,
    width: int = 0,
) -> None:
    """Write one entropy-coded image: cache bit, (no meta), 5 prefix
    codes, then LZ77/cache/literal-coded pixels.

    LZ77 emission is a greedy two-candidate matcher: at each position
    try distance 1 (horizontal runs) and distance ``width`` (copy the
    row above) and take the longer match when it reaches 3 pixels —
    the two distances that dominate real rasters, both mapping to
    1-byte short-range plane codes. The color cache is simulated with
    the decoder's exact insertion rule (literal AND copied pixels) so
    cache hits stay in sync."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if level0:
        bw.write(0, 1)  # no meta prefix codes

    cache = [None] * (1 << cache_bits) if cache_bits else None
    greens: list[int] = []
    reds: list[int] = []
    blues: list[int] = []
    alphas: list[int] = []
    dists: list[int] = []
    ops: list = []
    n = len(pixels)
    i = 0
    while i < n:
        # Longest match at distance 1 and (if applicable) width.
        best_len = 0
        best_dist = 0
        for dist in (1, width):
            if dist == 0 or dist > i:
                continue
            m = 0
            limit = min(n - i, _MAX_LZ77_LEN)
            while m < limit and pixels[i + m] == pixels[i + m - dist]:
                m += 1
            if m > best_len:
                best_len, best_dist = m, dist
        if best_len >= 3:
            len_sym, len_extra, len_bits = _lz77_code(best_len)
            # Plane code: dist 1 -> (1,0) is plane 2; dist width -> (0,1)
            # is plane 1; anything else -> long form dist+120.
            if best_dist == 1:
                plane = 2
            elif best_dist == width:
                plane = 1
            else:
                plane = best_dist + 120
            d_sym, d_extra, d_bits = _lz77_code(plane)
            greens.append(_NUM_LITERALS + len_sym)
            dists.append(d_sym)
            ops.append(("m", len_sym, len_extra, len_bits, d_sym, d_extra, d_bits))
            if cache is not None:
                for k in range(best_len):
                    px = pixels[i + k]
                    cache[_cache_hash(px, cache_bits)] = px
            i += best_len
            continue
        px = pixels[i]
        i += 1
        if cache is not None:
            hidx = _cache_hash(px, cache_bits)
            if cache[hidx] == px:
                sym = _GREEN_BASE + hidx
                greens.append(sym)
                ops.append(("c", sym))
                continue
            cache[hidx] = px
        a, r, gch, b = _channels(px)
        greens.append(gch)
        reds.append(r)
        blues.append(b)
        alphas.append(a)
        ops.append(("l", px))

    def freq(vals):
        f: dict[int, int] = {}
        for v in vals:
            f[v] = f.get(v, 0) + 1
        return f

    green_alphabet = _GREEN_BASE + (1 << cache_bits if cache_bits else 0)
    gcodes = _write_prefix_code(bw, freq(greens), green_alphabet)
    rcodes = _write_prefix_code(bw, freq(reds), _NUM_LITERALS)
    bcodes = _write_prefix_code(bw, freq(blues), _NUM_LITERALS)
    acodes = _write_prefix_code(bw, freq(alphas), _NUM_LITERALS)
    dcodes = _write_prefix_code(bw, freq(dists), _NUM_DISTANCE_CODES)

    for op in ops:
        if op[0] == "c":
            _emit(bw, gcodes, op[1])
        elif op[0] == "m":
            _, len_sym, len_extra, len_bits, d_sym, d_extra, d_bits = op
            _emit(bw, gcodes, _NUM_LITERALS + len_sym)
            if len_bits:
                bw.write(len_extra, len_bits)
            _emit(bw, dcodes, d_sym)
            if d_bits:
                bw.write(d_extra, d_bits)
        else:
            a, r, gch, b = _channels(op[1])
            _emit(bw, gcodes, gch)
            _emit(bw, rcodes, r)
            _emit(bw, bcodes, b)
            _emit(bw, acodes, a)


def encode_webp(
    img: np.ndarray,
    use_palette: bool | None = None,
    subtract_green: bool = False,
    cache_bits: int = 0,
) -> bytes:
    """Encode an HWC (or HW) uint8 array as a lossless VP8L WebP."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if w > 1 << 14 or h > 1 << 14:
        raise UnsupportedImageError("image too large for WebP (16384 max)")
    if c == 1:
        r = g = b = img[:, :, 0].astype(np.uint32)
        a = np.full((h, w), 255, np.uint32)
    elif c == 3:
        r, g, b = (img[:, :, i].astype(np.uint32) for i in range(3))
        a = np.full((h, w), 255, np.uint32)
    elif c == 4:
        r, g, b, a = (img[:, :, i].astype(np.uint32) for i in range(4))
    else:
        raise UnsupportedImageError(f"cannot encode {c}-channel WebP")
    argb = ((a << 24) | (r << 16) | (g << 8) | b).reshape(-1).tolist()
    alpha_used = int(bool(np.any(a != 255)))

    distinct = sorted(set(argb))
    if use_palette is None:
        use_palette = len(distinct) <= 16

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(alpha_used, 1)
    bw.write(0, 3)  # version

    if use_palette:
        if len(distinct) > 256:
            raise UnsupportedImageError("too many colors for palette mode")
        palette = distinct
        index = {px: i for i, px in enumerate(palette)}
        psize = len(palette)
        bw.write(1, 1)
        bw.write(3, 2)  # color indexing transform
        bw.write(psize - 1, 8)
        deltas = [palette[0]] + [
            _sub_px(palette[i], palette[i - 1]) for i in range(1, psize)
        ]
        _write_entropy_image(bw, deltas, 0, level0=False, width=psize)
        if psize <= 2:
            wb = 3
        elif psize <= 4:
            wb = 2
        elif psize <= 16:
            wb = 1
        else:
            wb = 0
        packed_w = _subsample(w, wb)
        bits_pp = 8 >> wb
        xmask = (1 << wb) - 1
        packed = [0] * (packed_w * h)
        for y in range(h):
            row, orow = y * packed_w, y * w
            for x in range(w):
                packed[row + (x >> wb)] |= index[argb[orow + x]] << (
                    (x & xmask) * bits_pp
                )
        pixels = [0xFF000000 | (gch << 8) for gch in packed]
        bw.write(0, 1)  # end of transforms
        _write_entropy_image(bw, pixels, cache_bits, level0=True, width=packed_w)
    else:
        if subtract_green:
            bw.write(1, 1)
            bw.write(2, 2)
            argb = [
                (px & 0xFF00FF00)
                | ((((px >> 16) & 0xFF) - ((px >> 8) & 0xFF)) & 0xFF) << 16
                | ((px & 0xFF) - ((px >> 8) & 0xFF)) & 0xFF
                for px in argb
            ]
        bw.write(0, 1)  # end of transforms
        _write_entropy_image(bw, argb, cache_bits, level0=True, width=w)

    payload = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
