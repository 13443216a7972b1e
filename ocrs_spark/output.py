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
