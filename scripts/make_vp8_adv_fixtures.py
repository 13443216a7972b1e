#!/usr/bin/env python
"""Generate VP8 fixtures exercising decoder paths the simple libwebp
API cannot reach: the SIMPLE loop filter (filter_type=0), nonzero
sharpness, multiple token partitions, and autofilter.

Uses libwebp's advanced encoder API via ctypes (WebPConfig +
WebPPicture + WebPMemoryWriter). The WebPConfig/WebPPicture struct
layouts below match libwebp 1.x (qmin/qmax present since 1.2.0); the
ABI version is probed against WebPConfigInitInternal, which rejects
mismatches, so a wrong layout fails loudly rather than corrupting.

Like make_vp8_fixtures.py, the committed artifacts are the .webp bytes
plus the YUV planes decoded by libwebp itself (normative per RFC 6386);
libwebp is needed only to (re)generate.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os

import numpy as np

from make_vp8_fixtures import decode_yuv, synth_images

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "vp8")


class WebPConfig(ctypes.Structure):
    _fields_ = [
        ("lossless", ctypes.c_int),
        ("quality", ctypes.c_float),
        ("method", ctypes.c_int),
        ("image_hint", ctypes.c_int),
        ("target_size", ctypes.c_int),
        ("target_PSNR", ctypes.c_float),
        ("segments", ctypes.c_int),
        ("sns_strength", ctypes.c_int),
        ("filter_strength", ctypes.c_int),
        ("filter_sharpness", ctypes.c_int),
        ("filter_type", ctypes.c_int),
        ("autofilter", ctypes.c_int),
        ("alpha_compression", ctypes.c_int),
        ("alpha_filtering", ctypes.c_int),
        ("alpha_quality", ctypes.c_int),
        ("pass_", ctypes.c_int),
        ("show_compressed", ctypes.c_int),
        ("preprocessing", ctypes.c_int),
        ("partitions", ctypes.c_int),
        ("partition_limit", ctypes.c_int),
        ("emulate_jpeg_size", ctypes.c_int),
        ("thread_level", ctypes.c_int),
        ("low_memory", ctypes.c_int),
        ("near_lossless", ctypes.c_int),
        ("exact", ctypes.c_int),
        ("use_delta_palette", ctypes.c_int),
        ("use_sharp_yuv", ctypes.c_int),
        ("qmin", ctypes.c_int),
        ("qmax", ctypes.c_int),
    ]


class WebPMemoryWriter(ctypes.Structure):
    _fields_ = [
        ("mem", ctypes.POINTER(ctypes.c_uint8)),
        ("size", ctypes.c_size_t),
        ("max_size", ctypes.c_size_t),
        ("pad", ctypes.c_uint32 * 1),
    ]


_WRITER_FN = ctypes.CFUNCTYPE(
    ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t, ctypes.c_void_p
)


class WebPPicture(ctypes.Structure):
    _fields_ = [
        ("use_argb", ctypes.c_int),
        ("colorspace", ctypes.c_int),
        ("width", ctypes.c_int),
        ("height", ctypes.c_int),
        ("y", ctypes.POINTER(ctypes.c_uint8)),
        ("u", ctypes.POINTER(ctypes.c_uint8)),
        ("v", ctypes.POINTER(ctypes.c_uint8)),
        ("y_stride", ctypes.c_int),
        ("uv_stride", ctypes.c_int),
        ("a", ctypes.POINTER(ctypes.c_uint8)),
        ("a_stride", ctypes.c_int),
        ("pad1", ctypes.c_uint32 * 2),
        ("argb", ctypes.POINTER(ctypes.c_uint32)),
        ("argb_stride", ctypes.c_int),
        ("pad2", ctypes.c_uint32 * 3),
        ("writer", _WRITER_FN),
        ("custom_ptr", ctypes.c_void_p),
        ("extra_info_type", ctypes.c_int),
        ("extra_info", ctypes.POINTER(ctypes.c_uint8)),
        ("stats", ctypes.c_void_p),
        ("error_code", ctypes.c_int),
        ("progress_hook", ctypes.c_void_p),
        ("user_data", ctypes.c_void_p),
        ("pad3", ctypes.c_uint32 * 3),
        ("pad4", ctypes.POINTER(ctypes.c_uint8)),
        ("pad5", ctypes.POINTER(ctypes.c_uint8)),
        ("pad6", ctypes.c_uint32 * 8),
        ("memory_", ctypes.c_void_p),
        ("memory_argb_", ctypes.c_void_p),
        ("pad7", ctypes.c_void_p * 2),
    ]


def _load():
    from make_vp8_fixtures import _load_libwebp

    lib = _load_libwebp()  # decoder prototypes (WebPDecodeYUV etc.)
    lib.WebPConfigInitInternal.restype = ctypes.c_int
    lib.WebPPictureInitInternal.restype = ctypes.c_int
    lib.WebPPictureImportRGB.restype = ctypes.c_int
    lib.WebPEncode.restype = ctypes.c_int
    lib.WebPMemoryWrite.restype = ctypes.c_int
    lib.WebPFree.restype = None
    lib.WebPFree.argtypes = [ctypes.c_void_p]
    # Probe the encoder ABI version WebPConfigInitInternal accepts.
    for ver in (0x020F, 0x0210, 0x020E, 0x020D):
        cfg = WebPConfig()
        if lib.WebPConfigInitInternal(
            ctypes.byref(cfg), 0, ctypes.c_float(75.0), ver
        ):
            return lib, ver
    raise SystemExit("no accepted WEBP_ENCODER_ABI_VERSION; struct layout suspect")


def encode_adv(lib, ver, rgb: np.ndarray, **overrides) -> bytes:
    h, w, _ = rgb.shape
    cfg = WebPConfig()
    if not lib.WebPConfigInitInternal(ctypes.byref(cfg), 0, ctypes.c_float(75.0), ver):
        raise RuntimeError("config init failed")
    for k, v in overrides.items():
        setattr(cfg, k, v)
    pic = WebPPicture()
    if not lib.WebPPictureInitInternal(ctypes.byref(pic), ver):
        raise RuntimeError("picture init failed")
    pic.width, pic.height = w, h
    pic.use_argb = 0
    buf = rgb.astype(np.uint8).tobytes()
    if not lib.WebPPictureImportRGB(ctypes.byref(pic), buf, w * 3):
        raise RuntimeError("import failed")
    wr = WebPMemoryWriter()
    lib.WebPMemoryWriterInit(ctypes.byref(wr))
    pic.writer = _WRITER_FN(("WebPMemoryWrite", lib))
    pic.custom_ptr = ctypes.addressof(wr)
    ok = lib.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic))
    lib.WebPPictureFree(ctypes.byref(pic))
    if not ok:
        raise RuntimeError(f"encode failed (error_code={pic.error_code})")
    data = ctypes.string_at(wr.mem, wr.size)
    lib.WebPFree(wr.mem)
    return data


def main() -> None:
    lib, ver = _load()
    print(f"encoder ABI version 0x{ver:04x}")
    os.makedirs(OUT_DIR, exist_ok=True)
    imgs = synth_images()
    cases = {
        # Simple loop filter: filter_type=0 with low strength.
        "photo_simplefilter": (imgs["photo"], dict(filter_type=0, filter_strength=30, autofilter=0)),
        # Nonzero sharpness alters the interior-limit computation.
        "photo_sharp": (imgs["photo"], dict(filter_sharpness=5)),
        # Multiple token partitions (2^2 = 4, 2^3 = 8). libwebp's
        # method>=3 token-buffer loop always emits one partition, so
        # drop to method 2 where the partitions knob is honored.
        "photo_4parts": (imgs["photo"], dict(partitions=2, method=2)),
        "noise_8parts": (imgs["noise"], dict(partitions=3, method=2)),
        # Autofilter picks per-frame strengths via a different path.
        "gradient_autofilter": (imgs["gradient"], dict(autofilter=1)),
    }
    for name, (img, kw) in cases.items():
        data = encode_adv(lib, ver, img, **kw)
        yp, up, vp = decode_yuv(lib, data)
        with open(os.path.join(OUT_DIR, name + ".webp"), "wb") as f:
            f.write(data)
        np.savez_compressed(
            os.path.join(OUT_DIR, name + ".expected.npz"), y=yp, u=up, v=vp
        )
        print(f"{name}: {img.shape[1]}x{img.shape[0]} {kw} -> {len(data)} bytes")


if __name__ == "__main__":
    main()
