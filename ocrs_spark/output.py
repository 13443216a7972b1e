"""Output sinks: plain text and HierText-style JSON.

Counterparts of the reference CLI's formatters
(``ocrs-cli/src/output.rs``):
- text: lines joined by newline, None lines skipped (output.rs:88-95) —
  implemented in kernels.recognition.format_text_output and used here;
- JSON: paragraphs -> lines -> words with ``text`` + 4-corner
  ``vertices`` rounded to ints (output.rs:24-76); all lines are placed
  in a single paragraph, mirroring output.rs:70-74.
"""

from __future__ import annotations

import json

import numpy as np

from .geometry import Rect, RotatedRect
from .kernels.contours import min_area_rect
from .kernels.recognition import TextLine


def _rotated_rect_of(item: TextLine) -> RotatedRect:
    pts = []
    for c in item.chars:
        pts.extend(c.rect.corners())
    rr = min_area_rect(pts)
    return rr.orient_towards(0.0, -1.0)


def rounded_vertex_coords(rr: RotatedRect) -> list[list[int]]:
    return [[int(round(x)), int(round(y))] for x, y in rr.corners()]


def format_json_output(
    input_path: str, input_hw: tuple[int, int], text_lines: list[TextLine | None]
) -> str:
    line_items = []
    for line in text_lines:
        if line is None:
            continue
        words = [
            {
                "text": w.text(),
                "vertices": rounded_vertex_coords(_rotated_rect_of(w)),
            }
            for w in line.words()
        ]
        line_items.append(
            {
                "text": line.text(),
                "words": words,
                "vertices": rounded_vertex_coords(_rotated_rect_of(line)),
            }
        )
    h, w = input_hw
    return json.dumps(
        {
            "url": input_path,
            "image_width": w,
            "image_height": h,
            "paragraphs": [{"lines": line_items}],
        },
        indent=2,
    )


def _draw_segment(img: np.ndarray, p0, p1, color) -> None:
    h, w = img.shape[:2]
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1)) * 2
    ts = np.linspace(0.0, 1.0, n)
    xs = np.clip(np.round(p0[0] + ts * (p1[0] - p0[0])).astype(int), 0, w - 1)
    ys = np.clip(np.round(p0[1] + ts * (p1[1] - p0[1])).astype(int), 0, h - 1)
    img[ys, xs] = color


def draw_polygon(img: np.ndarray, points, color) -> None:
    for i in range(len(points)):
        _draw_segment(img, points[i], points[(i + 1) % len(points)], color)


# Light/dark palettes matching the annotated-PNG sink's intent
# (ocrs-cli/src/output.rs:116-180): detection words light, recognition
# words dark, line boundaries grey.
_LINE_GREY = (160, 160, 160)
_LIGHT = [(255, 180, 180), (180, 255, 180), (180, 180, 255)]
_DARK = [(160, 0, 0), (0, 160, 0), (0, 0, 160)]


def generate_annotated_image(
    img: np.ndarray,
    line_rects: list[list[RotatedRect]],
    text_lines: list[TextLine | None],
) -> np.ndarray:
    """Annotated copy of an HWC uint8 image: grey line boxes, light
    detection-word polygons, dark recognition-word polygons (counterpart
    of generate_annotated_png, ocrs-cli/src/output.rs:116-180)."""
    out = np.array(img, dtype=np.uint8, copy=True)
    if out.ndim == 2:
        out = np.repeat(out[:, :, None], 3, axis=2)
    elif out.shape[2] == 1:
        out = np.repeat(out, 3, axis=2)
    for li, words in enumerate(line_rects):
        pts = [p for wrd in words for p in wrd.corners()]
        rr = min_area_rect(pts)
        if rr is not None:
            draw_polygon(out, rr.corners(), _LINE_GREY)
        for wi, wrd in enumerate(words):
            draw_polygon(out, wrd.corners(), _LIGHT[wi % len(_LIGHT)])
    for line in text_lines:
        if line is None:
            continue
        for wi, word in enumerate(line.words()):
            rr = _rotated_rect_of(word)
            draw_polygon(out, rr.corners(), _DARK[wi % len(_DARK)])
    return out
