"""Bilinear image resize with ONNX-Resize "half_pixel" semantics.

Matches the behavior of the reference's ``resize_image`` calls
(``ocrs/src/detection.rs:167-171,186-194`` and
``ocrs/src/recognition.rs:119-125``), which use linear interpolation with
half-pixel coordinate transform and edge clamping (the ONNX Resize
default). Pure numpy, fully vectorized (separable: one gather+lerp per
axis).
"""

from __future__ import annotations

import numpy as np


def _axis_coords(out_size: int, in_size: int):
    """Source sample positions for each output index under half_pixel."""
    if out_size == in_size:
        idx = np.arange(out_size)
        return idx, idx, np.zeros(out_size, dtype=np.float32)
    scale = in_size / out_size
    x = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    x0 = np.floor(x)
    frac = (x - x0).astype(np.float32)
    lo = np.clip(x0, 0, in_size - 1).astype(np.int64)
    hi = np.clip(x0 + 1, 0, in_size - 1).astype(np.int64)
    return lo, hi, frac


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Resize a (H, W) float32 image to (out_h, out_w)."""
    img = np.asarray(img, dtype=np.float32)
    in_h, in_w = img.shape

    if in_h == out_h and in_w == out_w:
        return img.copy()

    ylo, yhi, yf = _axis_coords(out_h, in_h)
    xlo, xhi, xf = _axis_coords(out_w, in_w)

    # Interpolate rows first, then columns.
    rows = img[ylo, :] * (1.0 - yf)[:, None] + img[yhi, :] * yf[:, None]
    out = rows[:, xlo] * (1.0 - xf)[None, :] + rows[:, xhi] * xf[None, :]
    return out.astype(np.float32)
