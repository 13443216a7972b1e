"""Pure-Python lossy WebP (VP8) keyframe decoder.

Implemented from the public VP8 bitstream spec (RFC 6386); no reference
code reused. The reference CLI accepts lossy .webp files through the
``image`` crate (ocrs-cli/src/main.rs:319-323); this module closes that
gap for the Spark-side file source — most real-world .webp files are
lossy, so the VP8L-only coverage of :mod:`ocrs_spark.webp` hit this
immediately on real corpora.

Scope: keyframes only (a standalone lossy WebP file's ``VP8 `` chunk is
always a keyframe — interframes exist only in multi-frame VP8 video
streams), bitstream version 0 (versions 1-3 swap the reconstruction
filters and skip the loop filter; nothing mainstream emits them).
Covered: the boolean arithmetic decoder, segmentation, all intra
prediction modes (16x16, 8x8 chroma, all ten 4x4 B-modes), token
decoding with per-frame probability updates, multiple token partitions,
dequantization with per-segment quantizers, the inverse WHT + DCT, and
both the normal and simple in-loop deblocking filters.

Reconstruction is exact integer arithmetic (RFC 6386 §14), so the
decoded Y/U/V planes are normative: tests assert bit-identity against
planes decoded by the system libwebp (fixtures committed; see
scripts/make_vp8_fixtures.py). The YUV->RGB conversion at the end is
NOT part of the VP8 contract — this module uses integer BT.601
studio-range conversion with nearest-neighbor chroma upsampling.

The normative constant tables (default/update coefficient
probabilities, keyframe B-mode probabilities, quantizer lookups) live
in :mod:`ocrs_spark.vp8_tables`, extracted from the system libwebp's
read-only data (see scripts/extract_vp8_tables.py for provenance).
"""

from __future__ import annotations

import numpy as np

from .codec import UnsupportedImageError
from .vp8_tables import (
    AC_QLOOKUP,
    COEFF_PROBS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    KF_BMODE_PROBS,
)

# ---------------------------------------------------------------------------
# Constant trees / tables (RFC 6386 §8.2, §11.2, §13.2-13.3)

# Scan position -> raster position.
_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
# Scan position -> probability band.
_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

_MB_SEGMENT_TREE = (2, 4, 0, -1, -2, -3)

# Intra 16x16 modes.
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = range(5)
_KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
_KF_YMODE_PROB = (145, 156, 163, 128)
_UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
_KF_UV_MODE_PROB = (142, 114, 183)

# Intra 4x4 (B) modes. The enum ORDER is normative: kf_bmode_probs rows
# are indexed by these values (empirically pinned against libwebp
# decodes — RD/VR sort before LD/VL, unlike some texts' listing order).
(B_DC, B_TM, B_VE, B_HE, B_RD, B_VR, B_LD, B_VL, B_HD, B_HU) = range(10)
_BMODE_TREE = (
    -B_DC, 2, -B_TM, 4, -B_VE, 6, 8, 12,
    -B_HE, 10, -B_RD, -B_VR, -B_LD, 14, -B_VL, 16, -B_HD, -B_HU,
)
# 16x16 mode -> equivalent B mode for above/left context of neighbors.
_YMODE_TO_B = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}

# DCT token category extra-bit probabilities (RFC 6386 §13.2).
_CAT_PROBS = (
    (159,),
    (165, 145),
    (173, 148, 140),
    (176, 155, 140, 135),
    (180, 157, 141, 134, 130),
    (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
)
_CAT_BASES = (5, 7, 11, 19, 35, 67)


class _Bool:
    """Boolean arithmetic decoder (RFC 6386 §7.3). Reads past the end
    of the partition yield zero bits, as the spec permits."""

    __slots__ = ("data", "pos", "end", "value", "range", "bits")

    def __init__(self, data: bytes, start: int = 0, end: int | None = None):
        self.data = data
        self.end = len(data) if end is None else end
        pos = start
        value = 0
        for _ in range(2):
            value = (value << 8) | (data[pos] if pos < self.end else 0)
            pos += 1
        self.pos = pos
        self.value = value
        self.range = 255
        self.bits = 0

    def bool(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        # Renormalize.
        rng = self.range
        while rng < 128:
            self.value <<= 1
            rng <<= 1
            self.bits += 1
            if self.bits == 8:
                self.bits = 0
                if self.pos < self.end:
                    self.value |= self.data[self.pos]
                self.pos += 1
        self.range = rng
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bool(128)
        return v

    def signed(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.bool(128) else v

    def flagged_signed(self, n: int) -> int:
        """An optional delta: flag bit, then magnitude + sign."""
        return self.signed(n) if self.bool(128) else 0

    def tree(self, tree, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.bool(probs[i >> 1])]
            if i <= 0:
                return -i


def _clamp127(x: int) -> int:
    return 0 if x < 0 else (127 if x > 127 else x)


class _FrameHeader:
    __slots__ = (
        "width", "height", "mb_w", "mb_h",
        "seg_enabled", "seg_update_map", "seg_abs", "seg_quant", "seg_lf",
        "seg_tree_probs",
        "filter_simple", "filter_level", "sharpness",
        "lf_delta_enabled", "ref_lf_delta", "mode_lf_delta",
        "dequant", "coeff_probs", "use_skip", "skip_prob",
    )


def _parse_frame_header(bd: _Bool, hdr: _FrameHeader) -> int:
    """Parse the frame-level portion of the first partition (RFC 6386
    §9.2-§9.11). Returns the token partition count."""
    bd.literal(1)  # color_space
    bd.literal(1)  # clamping_type

    hdr.seg_enabled = bool(bd.literal(1))
    hdr.seg_update_map = False
    hdr.seg_abs = False
    hdr.seg_quant = [0, 0, 0, 0]
    hdr.seg_lf = [0, 0, 0, 0]
    hdr.seg_tree_probs = [255, 255, 255]
    if hdr.seg_enabled:
        hdr.seg_update_map = bool(bd.literal(1))
        update_data = bool(bd.literal(1))
        if update_data:
            hdr.seg_abs = bool(bd.literal(1))
            for i in range(4):
                hdr.seg_quant[i] = bd.flagged_signed(7)
            for i in range(4):
                hdr.seg_lf[i] = bd.flagged_signed(6)
        if hdr.seg_update_map:
            for i in range(3):
                if bd.literal(1):
                    hdr.seg_tree_probs[i] = bd.literal(8)

    hdr.filter_simple = bool(bd.literal(1))
    hdr.filter_level = bd.literal(6)
    hdr.sharpness = bd.literal(3)
    hdr.lf_delta_enabled = bool(bd.literal(1))
    hdr.ref_lf_delta = [0, 0, 0, 0]
    hdr.mode_lf_delta = [0, 0, 0, 0]
    if hdr.lf_delta_enabled:
        if bd.literal(1):  # mode_ref_lf_delta_update
            for i in range(4):
                hdr.ref_lf_delta[i] = bd.flagged_signed(6)
            for i in range(4):
                hdr.mode_lf_delta[i] = bd.flagged_signed(6)

    n_parts = 1 << bd.literal(2)

    y_ac_qi = bd.literal(7)
    y_dc_d = bd.flagged_signed(4)
    y2_dc_d = bd.flagged_signed(4)
    y2_ac_d = bd.flagged_signed(4)
    uv_dc_d = bd.flagged_signed(4)
    uv_ac_d = bd.flagged_signed(4)

    # Per-segment dequant factors (RFC 6386 §9.6, §14.1): six factors
    # each. The chroma-DC index clamps at 117 (DC_QLOOKUP[117] == 132,
    # the spec's "chroma DC limited to 132"); Y2 AC scales by 155/100
    # with a floor of 8.
    hdr.dequant = []
    for seg in range(4):
        if hdr.seg_enabled:
            q = hdr.seg_quant[seg] if hdr.seg_abs else y_ac_qi + hdr.seg_quant[seg]
            q = _clamp127(q)
        else:
            q = y_ac_qi
        hdr.dequant.append(
            (
                DC_QLOOKUP[_clamp127(q + y_dc_d)],          # y1 dc
                AC_QLOOKUP[q],                               # y1 ac
                DC_QLOOKUP[_clamp127(q + y2_dc_d)] * 2,      # y2 dc
                max(8, AC_QLOOKUP[_clamp127(q + y2_ac_d)] * 155 // 100),  # y2 ac
                DC_QLOOKUP[min(117, max(0, q + uv_dc_d))],   # uv dc
                AC_QLOOKUP[_clamp127(q + uv_ac_d)],          # uv ac
            )
        )

    bd.literal(1)  # refresh_entropy_probs (keyframe state is transient here)

    hdr.coeff_probs = [
        [[list(ps) for ps in band] for band in plane] for plane in COEFF_PROBS
    ]
    for t in range(4):
        for b in range(8):
            for c in range(3):
                upd = COEFF_UPDATE_PROBS[t][b][c]
                row = hdr.coeff_probs[t][b][c]
                for p in range(11):
                    if bd.bool(upd[p]):
                        row[p] = bd.literal(8)

    hdr.use_skip = bool(bd.literal(1))
    hdr.skip_prob = bd.literal(8) if hdr.use_skip else 0
    return n_parts


def _parse_mb_modes(bd: _Bool, hdr: _FrameHeader):
    """Per-MB prediction records for the whole frame (RFC 6386 §10,
    §11.2 — all in the first partition, raster order)."""
    mb_w, mb_h = hdr.mb_w, hdr.mb_h
    seg_ids = np.zeros((mb_h, mb_w), np.uint8)
    skips = np.zeros((mb_h, mb_w), bool)
    ymodes = np.zeros((mb_h, mb_w), np.uint8)
    uvmodes = np.zeros((mb_h, mb_w), np.uint8)
    bmodes = np.zeros((mb_h, mb_w, 16), np.uint8)

    above = np.full((mb_w, 4), B_DC, np.uint8)  # bottom-row B modes per MB col
    for my in range(mb_h):
        left = np.full(4, B_DC, np.uint8)  # right-col B modes of left MB
        for mx in range(mb_w):
            if hdr.seg_update_map:
                seg_ids[my, mx] = bd.tree(_MB_SEGMENT_TREE, hdr.seg_tree_probs)
            if hdr.use_skip:
                skips[my, mx] = bool(bd.bool(hdr.skip_prob))
            ym = bd.tree(_KF_YMODE_TREE, _KF_YMODE_PROB)
            ymodes[my, mx] = ym
            if ym == B_PRED:
                sub = bmodes[my, mx]
                for b in range(16):
                    r, c = b >> 2, b & 3
                    a_mode = above[mx][c] if r == 0 else sub[b - 4]
                    l_mode = left[r] if c == 0 else sub[b - 1]
                    sub[b] = bd.tree(_BMODE_TREE, KF_BMODE_PROBS[a_mode][l_mode])
            else:
                bmodes[my, mx, :] = _YMODE_TO_B[ym]
            above[mx] = bmodes[my, mx, 12:16]
            left[:] = bmodes[my, mx, 3::4]
            uvmodes[my, mx] = bd.tree(_UV_MODE_TREE, _KF_UV_MODE_PROB)
    return seg_ids, skips, ymodes, uvmodes, bmodes


def _get_coeffs(bd: _Bool, plane_probs, ctx: int, dq_dc: int, dq_ac: int,
                first: int, out) -> bool:
    """Decode one 4x4 block's DCT tokens (RFC 6386 §13.3), writing
    dequantized coefficients into ``out`` (16 raster positions).
    Returns whether any nonzero coefficient was decoded."""
    n = first
    p = plane_probs[_BANDS[n]][ctx]
    any_nz = False
    bbool = bd.bool
    while n < 16:
        if not bbool(p[0]):  # EOB
            break
        while not bbool(p[1]):  # DCT_0 run; EOB cannot follow a zero
            n += 1
            if n == 16:
                return any_nz
            p = plane_probs[_BANDS[n]][0]
        if not bbool(p[2]):
            v = 1
            nctx = 1
        else:
            if not bbool(p[3]):
                if not bbool(p[4]):
                    v = 2
                else:
                    v = 3 + bbool(p[5])
            else:
                if not bbool(p[6]):
                    cat = 0 if not bbool(p[7]) else 1
                else:
                    if not bbool(p[8]):
                        cat = 2 if not bbool(p[9]) else 3
                    else:
                        cat = 4 if not bbool(p[10]) else 5
                extra = 0
                for pb in _CAT_PROBS[cat]:
                    extra = (extra << 1) | bbool(pb)
                v = _CAT_BASES[cat] + extra
            nctx = 2
        if bbool(128):
            v = -v
        out[_ZIGZAG[n]] = v * (dq_dc if n == 0 else dq_ac)
        any_nz = True
        n += 1
        if n == 16:
            break
        p = plane_probs[_BANDS[n]][nctx]
    return any_nz


def _inv_wht(coeffs):
    """4x4 inverse Walsh-Hadamard (RFC 6386 §14.3) — exact integer.
    Input/output: 16 raster values; output[i] is Y block i's DC."""
    tmp = [0] * 16
    for i in range(4):
        a1 = coeffs[i] + coeffs[12 + i]
        b1 = coeffs[4 + i] + coeffs[8 + i]
        c1 = coeffs[4 + i] - coeffs[8 + i]
        d1 = coeffs[i] - coeffs[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        base = 4 * i
        a1 = tmp[base] + tmp[base + 3]
        b1 = tmp[base + 1] + tmp[base + 2]
        c1 = tmp[base + 1] - tmp[base + 2]
        d1 = tmp[base] - tmp[base + 3]
        out[base] = (a1 + b1 + 3) >> 3
        out[base + 1] = (c1 + d1 + 3) >> 3
        out[base + 2] = (a1 - b1 + 3) >> 3
        out[base + 3] = (d1 - c1 + 3) >> 3
    return out


_C1 = 20091  # cos(pi/8)*sqrt(2) - 1, Q16 (RFC 6386 §14.4)
_C2 = 35468  # sin(pi/8)*sqrt(2), Q16


def _idct_blocks(coeffs: np.ndarray) -> np.ndarray:
    """Vectorized exact inverse DCT over N blocks (RFC 6386 §14.4).
    ``coeffs``: (N, 16) int64 raster-order; returns (N, 4, 4) int64."""
    c = coeffs.reshape(-1, 4, 4)
    # Pass 1: columns (axis 1).
    i0, i1, i2, i3 = c[:, 0, :], c[:, 1, :], c[:, 2, :], c[:, 3, :]
    a1 = i0 + i2
    b1 = i0 - i2
    c1 = ((i1 * _C2) >> 16) - (i3 + ((i3 * _C1) >> 16))
    d1 = (i1 + ((i1 * _C1) >> 16)) + ((i3 * _C2) >> 16)
    t = np.empty_like(c)
    t[:, 0, :] = a1 + d1
    t[:, 1, :] = b1 + c1
    t[:, 2, :] = b1 - c1
    t[:, 3, :] = a1 - d1
    # Pass 2: rows (axis 2), with final rounding shift.
    i0, i1, i2, i3 = t[:, :, 0], t[:, :, 1], t[:, :, 2], t[:, :, 3]
    a1 = i0 + i2
    b1 = i0 - i2
    c1 = ((i1 * _C2) >> 16) - (i3 + ((i3 * _C1) >> 16))
    d1 = (i1 + ((i1 * _C1) >> 16)) + ((i3 * _C2) >> 16)
    out = np.empty_like(c)
    out[:, :, 0] = (a1 + d1 + 4) >> 3
    out[:, :, 1] = (b1 + c1 + 4) >> 3
    out[:, :, 2] = (b1 - c1 + 4) >> 3
    out[:, :, 3] = (a1 - d1 + 4) >> 3
    return out


# ---------------------------------------------------------------------------
# Intra prediction (RFC 6386 §12). Planes carry a one-pixel virtual
# border: row 0 is 127 (extending 4 past the right edge for
# above-right), column 0 is 129, corner 127.


def _pred_16_or_8(plane, y0, x0, size, mode, has_above, has_left):
    A = plane[y0 - 1, x0:x0 + size].astype(np.int32)
    L = plane[y0:y0 + size, x0 - 1].astype(np.int32)
    P = int(plane[y0 - 1, x0 - 1])
    if mode == DC_PRED:
        if has_above and has_left:
            dc = (int(A.sum()) + int(L.sum()) + size) >> (
                5 if size == 16 else 4
            )
        elif has_above:
            dc = (int(A.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
        elif has_left:
            dc = (int(L.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
        else:
            dc = 128
        return np.full((size, size), dc, np.int32)
    if mode == V_PRED:
        return np.broadcast_to(A, (size, size))
    if mode == H_PRED:
        return np.broadcast_to(L[:, None], (size, size))
    # TM_PRED
    return np.clip(L[:, None] + A[None, :] - P, 0, 255)


def _pred_b(mode, A, L, P, AR):
    """One 4x4 sub-block prediction. A/L: 4-vectors (above/left), P:
    above-left, AR: 4-vector above-right. Returns 4x4 int array."""
    d = np.zeros((4, 4), np.int32)
    if mode == B_DC:
        d[:] = (int(A.sum()) + int(L.sum()) + 4) >> 3
        return d
    if mode == B_TM:
        return np.clip(L[:, None] + A[None, :] - P, 0, 255)
    if mode == B_VE:
        e = [P, A[0], A[1], A[2], A[3], AR[0]]
        row = [(e[i] + 2 * e[i + 1] + e[i + 2] + 2) >> 2 for i in range(4)]
        d[:] = row
        return d
    if mode == B_HE:
        e = [P, L[0], L[1], L[2], L[3], L[3]]
        col = [(e[i] + 2 * e[i + 1] + e[i + 2] + 2) >> 2 for i in range(4)]
        d[:] = np.array(col)[:, None]
        return d
    if mode == B_LD:
        e = [A[0], A[1], A[2], A[3], AR[0], AR[1], AR[2], AR[3]]
        av = [(e[i] + 2 * e[i + 1] + e[i + 2] + 2) >> 2 for i in range(6)]
        av.append((e[6] + 3 * e[7] + 2) >> 2)
        for r in range(4):
            for c in range(4):
                d[r, c] = av[r + c]
        return d
    # The remaining modes share the 9-pixel edge [L3,L2,L1,L0,P,A0..A3].
    pp = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]]
    a3 = [(pp[i] + 2 * pp[i + 1] + pp[i + 2] + 2) >> 2 for i in range(7)]
    a2 = [(pp[i] + pp[i + 1] + 1) >> 1 for i in range(8)]
    if mode == B_RD:
        for r in range(4):
            for c in range(4):
                d[r, c] = a3[c - r + 3]
        return d
    if mode == B_VR:
        d[3, 0] = a3[1]
        d[2, 0] = a3[2]
        d[1, 0] = d[3, 1] = a3[3]
        d[0, 0] = d[2, 1] = a2[4]
        d[1, 1] = d[3, 2] = a3[4]
        d[0, 1] = d[2, 2] = a2[5]
        d[1, 2] = d[3, 3] = a3[5]
        d[0, 2] = d[2, 3] = a2[6]
        d[1, 3] = a3[6]
        d[0, 3] = a2[7]
        return d
    if mode == B_VL:
        e = [A[0], A[1], A[2], A[3], AR[0], AR[1], AR[2], AR[3]]
        e3 = [(e[i] + 2 * e[i + 1] + e[i + 2] + 2) >> 2 for i in range(6)]
        e2 = [(e[i] + e[i + 1] + 1) >> 1 for i in range(5)]
        d[0, 0] = e2[0]
        d[1, 0] = e3[0]
        d[2, 0] = d[0, 1] = e2[1]
        d[3, 0] = d[1, 1] = e3[1]
        d[2, 1] = d[0, 2] = e2[2]
        d[3, 1] = d[1, 2] = e3[2]
        d[2, 2] = d[0, 3] = e2[3]
        d[3, 2] = d[1, 3] = e3[3]
        d[2, 3] = e3[4]
        d[3, 3] = e3[5]
        return d
    if mode == B_HD:
        d[3, 0] = a2[0]
        d[3, 1] = a3[0]
        d[2, 0] = d[3, 2] = a2[1]
        d[2, 1] = d[3, 3] = a3[1]
        d[1, 0] = d[2, 2] = a2[2]
        d[1, 1] = d[2, 3] = a3[2]
        d[0, 0] = d[1, 2] = a2[3]
        d[0, 1] = d[1, 3] = a3[3]
        d[0, 2] = a3[4]
        d[0, 3] = a3[5]
        return d
    if mode == B_HU:
        l2 = [(L[i] + L[i + 1] + 1) >> 1 for i in range(3)]
        l3 = [(L[i] + 2 * L[i + 1] + L[i + 2] + 2) >> 2 for i in range(2)]
        l3.append((L[2] + 3 * L[3] + 2) >> 2)
        d[0, 0] = l2[0]
        d[0, 1] = l3[0]
        d[0, 2] = d[1, 0] = l2[1]
        d[0, 3] = d[1, 1] = l3[1]
        d[1, 2] = d[2, 0] = l2[2]
        d[1, 3] = d[2, 1] = l3[2]
        d[2, 2] = d[2, 3] = d[3, 0] = d[3, 1] = d[3, 2] = d[3, 3] = L[3]
        return d
    raise UnsupportedImageError(f"invalid VP8 B mode {mode}")


# ---------------------------------------------------------------------------
# Loop filter (RFC 6386 §15). All arithmetic follows the spec's
# signed-char semantics: pixels are biased by -128, every intermediate
# clamps to [-128, 127], shifts are arithmetic.


def _sc(x):
    return np.clip(x, -128, 127)


def _filter_common(p1, p0, q0, q1, mask, hev, use_outer):
    a = _sc(p1 - q1)
    if use_outer is not None:
        a = np.where(use_outer, a, 0)
    a = _sc(a + 3 * (q0 - p0))
    a = np.where(mask, a, 0)
    f1 = _sc(a + 4) >> 3
    f2 = _sc(a + 3) >> 3
    q0n = _sc(q0 - f1)
    p0n = _sc(p0 + f2)
    return p0n, q0n, f1


def _normal_filter_edge(seg, lim, blim, thresh, mb_edge):
    """seg: (n, 8) int16 raw pixel lanes [p3 p2 p1 p0 q0 q1 q2 q3].
    Returns the filtered lanes (same shape). Implements vp8_filter /
    vp8_mbfilter with the §15.2 filter and high-edge-variance masks."""
    p3, p2, p1, p0, q0, q1, q2, q3 = (seg[:, i] for i in range(8))
    mask = (
        (np.abs(p3 - p2) <= lim)
        & (np.abs(p2 - p1) <= lim)
        & (np.abs(p1 - p0) <= lim)
        & (np.abs(q1 - q0) <= lim)
        & (np.abs(q2 - q1) <= lim)
        & (np.abs(q3 - q2) <= lim)
        & (np.abs(p0 - q0) * 2 + np.abs(p1 - q1) // 2 <= blim)
    )
    hev = (np.abs(p1 - p0) > thresh) | (np.abs(q1 - q0) > thresh)
    ps2, ps1, ps0 = p2 - 128, p1 - 128, p0 - 128
    qs0, qs1, qs2 = q0 - 128, q1 - 128, q2 - 128
    if not mb_edge:
        ps0n, qs0n, f1 = _filter_common(ps1, ps0, qs0, qs1, mask, hev, hev)
        outer = (f1 + 1) >> 1
        outer = np.where(hev, 0, outer)
        qs1n = _sc(qs1 - outer)
        ps1n = _sc(ps1 + outer)
        ps2n, qs2n = ps2, qs2
    else:
        a = _sc(_sc(ps1 - qs1) + 3 * (qs0 - ps0))
        a = np.where(mask, a, 0)
        narrow = np.where(hev, a, 0)
        f1 = _sc(narrow + 4) >> 3
        f2 = _sc(narrow + 3) >> 3
        qs0n = _sc(qs0 - f1)
        ps0n = _sc(ps0 + f2)
        wide = np.where(hev, 0, a)
        u27 = _sc((27 * wide + 63) >> 7)
        u18 = _sc((18 * wide + 63) >> 7)
        u9 = _sc((9 * wide + 63) >> 7)
        qs0n = _sc(qs0n - u27)
        ps0n = _sc(ps0n + u27)
        qs1n = _sc(qs1 - u18)
        ps1n = _sc(ps1 + u18)
        qs2n = _sc(qs2 - u9)
        ps2n = _sc(ps2 + u9)
    out = seg.copy()
    out[:, 1] = ps2n + 128
    out[:, 2] = ps1n + 128
    out[:, 3] = ps0n + 128
    out[:, 4] = qs0n + 128
    out[:, 5] = qs1n + 128
    out[:, 6] = qs2n + 128
    return out


def _simple_filter_edge(seg, blim):
    """seg: (n, 4) int16 lanes [p1 p0 q0 q1] (simple filter, §15.1)."""
    p1, p0, q0, q1 = (seg[:, i] for i in range(4))
    mask = np.abs(p0 - q0) * 2 + np.abs(p1 - q1) // 2 <= blim
    ps1, ps0, qs0, qs1 = p1 - 128, p0 - 128, q0 - 128, q1 - 128
    ps0n, qs0n, _ = _filter_common(ps1, ps0, qs0, qs1, mask, None, None)
    out = seg.copy()
    out[:, 1] = ps0n + 128
    out[:, 2] = qs0n + 128
    return out


def _filter_v(plane, y0, x, n, lim, blim, thresh, mb_edge, simple):
    if simple:
        seg = plane[y0:y0 + n, x - 2:x + 2].astype(np.int16)
        plane[y0:y0 + n, x - 2:x + 2] = _simple_filter_edge(seg, blim)
    else:
        seg = plane[y0:y0 + n, x - 4:x + 4].astype(np.int16)
        plane[y0:y0 + n, x - 4:x + 4] = _normal_filter_edge(
            seg, lim, blim, thresh, mb_edge
        )


def _filter_h(plane, x0, y, n, lim, blim, thresh, mb_edge, simple):
    if simple:
        seg = plane[y - 2:y + 2, x0:x0 + n].T.astype(np.int16)
        plane[y - 2:y + 2, x0:x0 + n] = _simple_filter_edge(seg, blim).T
    else:
        seg = plane[y - 4:y + 4, x0:x0 + n].T.astype(np.int16)
        plane[y - 4:y + 4, x0:x0 + n] = _normal_filter_edge(
            seg, lim, blim, thresh, mb_edge
        ).T


def _loop_filter(hdr: _FrameHeader, Y, U, V, seg_ids, ymodes, has_coeffs):
    """In-loop deblocking over the reconstructed mb-aligned planes, MB
    raster order, vertical edges before horizontal (RFC 6386 §15.2)."""
    if hdr.filter_level == 0:
        return
    # Per-segment base level.
    levels = []
    for seg in range(4):
        if hdr.seg_enabled:
            lvl = hdr.seg_lf[seg] if hdr.seg_abs else hdr.filter_level + hdr.seg_lf[seg]
        else:
            lvl = hdr.filter_level
        levels.append(max(0, min(63, lvl)))

    simple = hdr.filter_simple
    sharp = hdr.sharpness
    for my in range(hdr.mb_h):
        for mx in range(hdr.mb_w):
            lvl = levels[seg_ids[my, mx]]
            is_b = ymodes[my, mx] == B_PRED
            if hdr.lf_delta_enabled:
                lvl += hdr.ref_lf_delta[0]  # intra frame
                if is_b:
                    lvl += hdr.mode_lf_delta[0]
                lvl = max(0, min(63, lvl))
            if lvl == 0:
                continue
            inner = bool(has_coeffs[my, mx]) or is_b
            interior = lvl
            if sharp:
                interior >>= 2 if sharp > 4 else 1
                if interior > 9 - sharp:
                    interior = 9 - sharp
            if interior < 1:
                interior = 1
            mb_lim = 2 * (lvl + 2) + interior
            b_lim = 2 * lvl + interior
            hev_t = 2 if lvl >= 40 else (1 if lvl >= 15 else 0)

            yy, yx = 1 + my * 16, 1 + mx * 16
            cy, cx = 1 + my * 8, 1 + mx * 8
            # Vertical (left MB edge, then inner columns).
            if mx > 0:
                _filter_v(Y, yy, yx, 16, interior, mb_lim, hev_t, True, simple)
                if not simple:
                    _filter_v(U, cy, cx, 8, interior, mb_lim, hev_t, True, False)
                    _filter_v(V, cy, cx, 8, interior, mb_lim, hev_t, True, False)
            if inner:
                for dx in (4, 8, 12):
                    _filter_v(Y, yy, yx + dx, 16, interior, b_lim, hev_t, False, simple)
                if not simple:
                    _filter_v(U, cy, cx + 4, 8, interior, b_lim, hev_t, False, False)
                    _filter_v(V, cy, cx + 4, 8, interior, b_lim, hev_t, False, False)
            # Horizontal (top MB edge, then inner rows).
            if my > 0:
                _filter_h(Y, yx, yy, 16, interior, mb_lim, hev_t, True, simple)
                if not simple:
                    _filter_h(U, cx, cy, 8, interior, mb_lim, hev_t, True, False)
                    _filter_h(V, cx, cy, 8, interior, mb_lim, hev_t, True, False)
            if inner:
                for dy in (4, 8, 12):
                    _filter_h(Y, yx, yy + dy, 16, interior, b_lim, hev_t, False, simple)
                if not simple:
                    _filter_h(U, cx, cy + 4, 8, interior, b_lim, hev_t, False, False)
                    _filter_h(V, cx, cy + 4, 8, interior, b_lim, hev_t, False, False)


# ---------------------------------------------------------------------------
# Frame decode


def decode_vp8(data: bytes):
    """Decode a VP8 keyframe chunk payload. Returns (y, u, v) uint8
    planes at full and half resolution, cropped to the frame size."""
    if len(data) < 10:
        raise UnsupportedImageError("truncated VP8 chunk")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise UnsupportedImageError("VP8 interframe outside a video stream")
    version = (tag >> 1) & 7
    if version > 3:
        raise UnsupportedImageError(f"invalid VP8 version {version}")
    # Versions 1-3 swap the INTER-prediction subpixel reconstruction
    # filters (and libwebp emits version 1 when encoding with the
    # simple loop filter). Keyframes contain no inter prediction, and
    # the loop-filter choice is read from the frame header's
    # filter_type bit, so all four versions decode identically here.
    first_part_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise UnsupportedImageError("bad VP8 start code")
    width = (data[6] | (data[7] << 8)) & 0x3FFF
    height = (data[8] | (data[9] << 8)) & 0x3FFF
    if width == 0 or height == 0:
        raise UnsupportedImageError("zero VP8 dimensions")
    if 10 + first_part_size > len(data):
        raise UnsupportedImageError("truncated VP8 first partition")

    hdr = _FrameHeader()
    hdr.width, hdr.height = width, height
    hdr.mb_w = (width + 15) >> 4
    hdr.mb_h = (height + 15) >> 4

    bd = _Bool(data, 10, 10 + first_part_size)
    n_parts = _parse_frame_header(bd, hdr)

    # Token partitions: sizes of all but the last are stored as 3-byte
    # little-endian values right after the first partition.
    off = 10 + first_part_size
    sizes_end = off + 3 * (n_parts - 1)
    if sizes_end > len(data):
        raise UnsupportedImageError("truncated VP8 partition table")
    parts = []
    pos = sizes_end
    for i in range(n_parts - 1):
        sz = data[off + 3 * i] | (data[off + 3 * i + 1] << 8) | (data[off + 3 * i + 2] << 16)
        if pos + sz > len(data):
            raise UnsupportedImageError("truncated VP8 token partition")
        parts.append(_Bool(data, pos, pos + sz))
        pos += sz
    parts.append(_Bool(data, pos, len(data)))

    seg_ids, skips, ymodes, uvmodes, bmodes = _parse_mb_modes(bd, hdr)

    mb_w, mb_h = hdr.mb_w, hdr.mb_h
    n_mb = mb_w * mb_h
    y_coef = np.zeros((n_mb, 16, 16), np.int64)
    u_coef = np.zeros((n_mb, 4, 16), np.int64)
    v_coef = np.zeros((n_mb, 4, 16), np.int64)
    has_coeffs = np.zeros((mb_h, mb_w), bool)

    # Nonzero-context state (RFC 6386 §13.4).
    above_y = np.zeros((mb_w, 4), np.uint8)
    above_u = np.zeros((mb_w, 2), np.uint8)
    above_v = np.zeros((mb_w, 2), np.uint8)
    above_y2 = np.zeros(mb_w, np.uint8)
    probs = hdr.coeff_probs

    for my in range(mb_h):
        td = parts[my % n_parts]
        left_y = np.zeros(4, np.uint8)
        left_u = np.zeros(2, np.uint8)
        left_v = np.zeros(2, np.uint8)
        left_y2 = 0
        for mx in range(mb_w):
            mb = my * mb_w + mx
            is_b = ymodes[my, mx] == B_PRED
            if skips[my, mx]:
                left_y[:] = 0
                above_y[mx, :] = 0
                left_u[:] = 0
                above_u[mx, :] = 0
                left_v[:] = 0
                above_v[mx, :] = 0
                if not is_b:
                    left_y2 = 0
                    above_y2[mx] = 0
                continue
            dq = hdr.dequant[seg_ids[my, mx]] if hdr.seg_enabled else hdr.dequant[0]
            y1dc, y1ac, y2dc, y2ac, uvdc, uvac = dq
            mb_nz = False
            if not is_b:
                ctx = above_y2[mx] + left_y2
                buf = [0] * 16
                nz = _get_coeffs(td, probs[1], ctx, y2dc, y2ac, 0, buf)
                above_y2[mx] = left_y2 = 1 if nz else 0
                mb_nz |= nz
                dcs = _inv_wht(buf)
                first = 1
                plane = 0
            else:
                dcs = None
                first = 0
                plane = 3
            yc = y_coef[mb]
            pp = probs[plane]
            for b in range(16):
                r, c = b >> 2, b & 3
                ctx = above_y[mx, c] + left_y[r]
                out = yc[b]
                nz = _get_coeffs(td, pp, ctx, y1dc, y1ac, first, out)
                if dcs is not None:
                    out[0] = dcs[b]
                above_y[mx, c] = left_y[r] = 1 if nz else 0
                mb_nz |= nz or (dcs is not None and dcs[b] != 0)
            for cb, coefs, anz, lnz in (
                (u_coef[mb], probs[2], above_u, left_u),
                (v_coef[mb], probs[2], above_v, left_v),
            ):
                for b in range(4):
                    r, c = b >> 1, b & 1
                    ctx = anz[mx, c] + lnz[r]
                    nz = _get_coeffs(td, coefs, ctx, uvdc, uvac, 0, cb[b])
                    anz[mx, c] = lnz[r] = 1 if nz else 0
                    mb_nz |= nz
            has_coeffs[my, mx] = mb_nz

    # ---------------- reconstruction ----------------
    W16, H16 = mb_w * 16, mb_h * 16
    W8, H8 = mb_w * 8, mb_h * 8
    Y = np.empty((H16 + 1, W16 + 5), np.uint8)
    U = np.empty((H8 + 1, W8 + 1), np.uint8)
    V = np.empty((H8 + 1, W8 + 1), np.uint8)
    for P in (Y, U, V):
        P[0, :] = 127
        P[1:, 0] = 129

    y_res = _idct_blocks(y_coef.reshape(-1, 16)).reshape(n_mb, 16, 4, 4)
    u_res = _idct_blocks(u_coef.reshape(-1, 16)).reshape(n_mb, 4, 4, 4)
    v_res = _idct_blocks(v_coef.reshape(-1, 16)).reshape(n_mb, 4, 4, 4)

    for my in range(mb_h):
        yy, cy = 1 + my * 16, 1 + my * 8
        for mx in range(mb_w):
            mb = my * mb_w + mx
            yx, cx = 1 + mx * 16, 1 + mx * 8
            ym = ymodes[my, mx]
            if ym != B_PRED:
                pred = _pred_16_or_8(Y, yy, yx, 16, ym, my > 0, mx > 0)
                res = np.zeros((16, 16), np.int64)
                blocks = y_res[mb].reshape(4, 4, 4, 4)
                res = blocks.transpose(0, 2, 1, 3).reshape(16, 16)
                Y[yy:yy + 16, yx:yx + 16] = np.clip(pred + res, 0, 255)
            else:
                sub = bmodes[my, mx]
                for b in range(16):
                    r, c = b >> 2, b & 3
                    by, bx = yy + r * 4, yx + c * 4
                    A = Y[by - 1, bx:bx + 4].astype(np.int32)
                    L = Y[by:by + 4, bx - 1].astype(np.int32)
                    P = int(Y[by - 1, bx - 1])
                    if c < 3:
                        AR = Y[by - 1, bx + 4:bx + 8].astype(np.int32)
                    else:
                        # Right-column sub-blocks take above-right from
                        # the row above the whole MB (libvpx border
                        # semantics; within-MB rows to the right are
                        # not yet reconstructed).
                        AR = Y[yy - 1, yx + 16:yx + 20].astype(np.int32)
                    pred = _pred_b(int(sub[b]), A, L, P, AR)
                    Y[by:by + 4, bx:bx + 4] = np.clip(
                        pred + y_res[mb, b], 0, 255
                    )
            uvm = uvmodes[my, mx]
            for Pl, res4 in ((U, u_res[mb]), (V, v_res[mb])):
                pred = _pred_16_or_8(Pl, cy, cx, 8, uvm, my > 0, mx > 0)
                res = res4.reshape(2, 2, 4, 4).transpose(0, 2, 1, 3).reshape(8, 8)
                Pl[cy:cy + 8, cx:cx + 8] = np.clip(pred + res, 0, 255)
        # Extend the right border with each row's last pixel so the
        # next MB row's rightmost above-right reads replicate it (top
        # border row keeps 127 from initialization).
        Y[yy:yy + 16, W16 + 1:] = Y[yy:yy + 16, W16:W16 + 1]

    _loop_filter(hdr, Y, U, V, seg_ids, ymodes, has_coeffs)

    uv_w, uv_h = (width + 1) >> 1, (height + 1) >> 1
    return (
        Y[1:1 + height, 1:1 + width].copy(),
        U[1:1 + uv_h, 1:1 + uv_w].copy(),
        V[1:1 + uv_h, 1:1 + uv_w].copy(),
    )


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Integer BT.601 studio-range YUV420 -> RGB888 with nearest
    chroma upsampling. Not part of the VP8 bit-exactness contract."""
    h, w = y.shape
    uu = u.repeat(2, 0).repeat(2, 1)[:h, :w].astype(np.int32) - 128
    vv = v.repeat(2, 0).repeat(2, 1)[:h, :w].astype(np.int32) - 128
    c = 298 * (y.astype(np.int32) - 16)
    r = (c + 409 * vv + 128) >> 8
    g = (c - 100 * uu - 208 * vv + 128) >> 8
    b = (c + 516 * uu + 128) >> 8
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
