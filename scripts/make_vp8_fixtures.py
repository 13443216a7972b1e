#!/usr/bin/env python
"""Generate lossy-WebP (VP8) test fixtures with the system libwebp.

Encodes small deterministic synthetic images as lossy WebP at several
quality levels via ctypes (``WebPEncodeRGB``), then decodes each file
back with ``WebPDecodeYUV`` and stores the decoded Y/U/V planes as the
expected output. RFC 6386 defines VP8 reconstruction (inverse DCT/WHT,
intra prediction, loop filter) as exact integer arithmetic, so the
decoded YUV planes are normative: any conformant decoder must produce
them bit-identically. The fixtures (webp bytes + expected planes) are
committed; this script is provenance/regeneration tooling and needs
libwebp only at generation time, never at test time.

The RGB->YUV conversion used at *encode* time is libwebp's own and is
irrelevant to the contract — only the .webp bitstream and its decoded
YUV planes matter.

Run:  python scripts/make_vp8_fixtures.py
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os

import numpy as np

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "vp8")


def _load_libwebp() -> ctypes.CDLL:
    path = ctypes.util.find_library("webp")
    if path is None:
        raise SystemExit("libwebp not found; cannot (re)generate fixtures")
    lib = ctypes.CDLL(path)
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.WebPFree.restype = None
    lib.WebPFree.argtypes = [ctypes.c_void_p]
    return lib


def encode_lossy(lib: ctypes.CDLL, rgb: np.ndarray, quality: float) -> bytes:
    h, w, _ = rgb.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = lib.WebPEncodeRGB(
        rgb.astype(np.uint8).tobytes(), w, h, w * 3, quality, ctypes.byref(out)
    )
    if size == 0:
        raise RuntimeError("WebPEncodeRGB failed")
    data = ctypes.string_at(out, size)
    lib.WebPFree(out)
    return data


def decode_yuv(lib: ctypes.CDLL, data: bytes):
    w = ctypes.c_int(); h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)(); v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int(); uv_stride = ctypes.c_int()
    y = lib.WebPDecodeYUV(
        data, len(data), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(u), ctypes.byref(v),
        ctypes.byref(stride), ctypes.byref(uv_stride),
    )
    if not y:
        raise RuntimeError("WebPDecodeYUV failed")
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    uv_h = (H + 1) // 2
    uv_w = (W + 1) // 2
    yp = np.frombuffer(ctypes.string_at(y, S * H), np.uint8).reshape(H, S)[:, :W].copy()
    up = np.frombuffer(ctypes.string_at(u, US * uv_h), np.uint8).reshape(uv_h, US)[:, :uv_w].copy()
    vp = np.frombuffer(ctypes.string_at(v, US * uv_h), np.uint8).reshape(uv_h, US)[:, :uv_w].copy()
    lib.WebPFree(y)
    return yp, up, vp


def synth_images() -> dict[str, np.ndarray]:
    rng = np.random.default_rng(42)
    imgs: dict[str, np.ndarray] = {}

    flat = np.full((48, 64, 3), (90, 160, 210), np.uint8)
    imgs["flat"] = flat

    yy, xx = np.mgrid[0:64, 0:80]
    grad = np.stack(
        [(xx * 3) % 256, (yy * 4) % 256, ((xx + yy) * 2) % 256], axis=-1
    ).astype(np.uint8)
    imgs["gradient"] = grad

    imgs["noise"] = rng.integers(0, 256, (32, 48, 3), np.uint8).astype(np.uint8)

    # Smooth blobs + hard edges + a noisy patch: drives mixed 16x16/4x4
    # modes, multiple quant segments, and strong loop-filter activity.
    yy, xx = np.mgrid[0:96, 0:128]
    photo = np.zeros((96, 128, 3), np.float64)
    photo[..., 0] = 128 + 90 * np.sin(xx / 11.0) * np.cos(yy / 7.0)
    photo[..., 1] = 128 + 90 * np.cos(xx / 17.0 + 1.0)
    photo[..., 2] = 128 + 90 * np.sin((xx + 2 * yy) / 23.0)
    photo[20:60, 30:70] = (240, 240, 240)
    photo[30:50, 80:120] = (10, 10, 10)
    photo = photo.clip(0, 255).astype(np.uint8)
    photo[70:90, 10:40] = rng.integers(0, 256, (20, 30, 3))
    imgs["photo"] = photo

    imgs["tiny"] = rng.integers(0, 256, (6, 9, 3), np.uint8).astype(np.uint8)

    # Dimensions straddling MB boundaries (17 = 16+1, 33 = 2*16+1).
    text = np.full((17, 33, 3), 255, np.uint8)
    text[4:13, 3:9] = 0
    text[4:13, 12:18] = 0
    text[8:9, 3:30] = 0
    imgs["glyphs"] = text
    return imgs


def main() -> None:
    lib = _load_libwebp()
    os.makedirs(OUT_DIR, exist_ok=True)
    qualities = {"flat": (75,), "gradient": (75,), "noise": (75, 10),
                 "photo": (75, 30, 95), "tiny": (75,), "glyphs": (75,)}
    for name, img in synth_images().items():
        for q in qualities[name]:
            data = encode_lossy(lib, img, float(q))
            yp, up, vp = decode_yuv(lib, data)
            base = f"{name}_q{q}"
            with open(os.path.join(OUT_DIR, base + ".webp"), "wb") as f:
                f.write(data)
            np.savez_compressed(
                os.path.join(OUT_DIR, base + ".expected.npz"), y=yp, u=up, v=vp
            )
            print(f"{base}: {img.shape[1]}x{img.shape[0]} -> {len(data)} bytes")


if __name__ == "__main__":
    main()
