"""Layout analysis: word -> line grouping, block separators, reading order.

Behavioral counterpart of ``ocrs/src/layout_analysis.rs`` (+
``layout_analysis/empty_rects.rs``), constants preserved verbatim:
- greedy left-to-right line chaining with vertical-overlap >= 5 and
  horizontal-overlap <= 5 thresholds (layout_analysis.rs:19-71);
- median word spacing / height via index len/2 of the sorted (resp.
  unsorted) list — reproduced literally (layout_analysis.rs:92-119);
- Breuel (2002) max-empty-rects branch-and-bound over a max-heap
  (empty_rects.rs:86-137);
- Shafait et al. separator scoring sqrt(area * aspect_weight) with
  0.5/1.5/|log2 ar| buckets, min dims 3x median spacing/height, IoU 0.5
  dedup, top 80 (layout_analysis.rs:127-154);
- line sort by midpoint-line center y; greedy paragraph grouping by
  horizontal overlap, flattened (layout_analysis.rs:186-232).

These are inherently sequential per-image algorithms (the parallel grain
is the image); in Spark they run inside the per-image pandas UDF.
"""

from __future__ import annotations

import heapq
import itertools
import math

from ..geometry import Line, Rect, RotatedRect, leftmost_edge, rightmost_edge

OVERLAP_THRESHOLD = 5.0
MAX_H_OVERLAP = 5.0
SEPARATOR_IOU = 0.5
MAX_SEPARATORS = 80


def _rects_separated_by_line(a: RotatedRect, b: RotatedRect, sep: Line) -> bool:
    return Line(a.cx, a.cy, b.cx, b.cy).intersects(sep)


class _RectGeom:
    """Per-rect geometry cached once: the greedy chaining loop touches
    each candidate's edges O(lines x words) times."""

    __slots__ = ("rect", "left", "ledge", "redge", "lex", "rex", "ly0", "ly1", "ry0", "ry1")

    def __init__(self, rect: RotatedRect):
        self.rect = rect
        self.left = int(rect.bounding_rect().left)
        self.ledge = leftmost_edge(rect)
        self.redge = rightmost_edge(rect)
        self.lex = self.ledge.center()[0]
        self.rex = self.redge.center()[0]
        self.ly0 = min(self.ledge.y0, self.ledge.y1)
        self.ly1 = max(self.ledge.y0, self.ledge.y1)
        self.ry0 = min(self.redge.y0, self.redge.y1)
        self.ry1 = max(self.redge.y0, self.redge.y1)


def group_into_lines(rects: list[RotatedRect], separators: list[Line]) -> list[list[RotatedRect]]:
    pool = sorted((_RectGeom(r) for r in rects), key=lambda g: g.left)
    lines: list[list[RotatedRect]] = []
    while pool:
        line = [pool.pop(0)]
        while True:
            last = line[-1]
            best_i, best_key = None, None
            for i, g in enumerate(pool):
                # Same predicate as the reference (layout_analysis.rs:47-58):
                # center beyond last, bounded horizontal overlap, vertical
                # overlap of facing edges, not across a separator.
                if not (
                    g.rect.cx > last.rect.cx
                    and g.lex - last.rex >= -MAX_H_OVERLAP
                    and min(last.ry1, g.ly1) - max(last.ry0, g.ly0) >= OVERLAP_THRESHOLD
                ):
                    continue
                key = int(g.rect.cx)
                if best_key is not None and key >= best_key:
                    continue
                if any(_rects_separated_by_line(last.rect, g.rect, s) for s in separators):
                    continue
                best_i, best_key = i, key
            if best_i is None:
                break
            line.append(pool.pop(best_i))
        lines.append(line)
    return [[g.rect for g in line] for line in lines]


def _score_separator(r: Rect) -> float:
    """sqrt(area * aspect_weight), Shafait et al. §3.D
    (layout_analysis.rs:127-135)."""
    height = r.height
    width = r.width
    aspect_ratio = height / width if width else float("inf")
    la = abs(math.log2(aspect_ratio)) if aspect_ratio > 0 else float("inf")
    if la < 3.0:
        weight = 0.5
    elif la < 5.0:
        weight = 1.5
    else:
        weight = la
    return math.sqrt(r.area() * weight)


def max_empty_rects(obstacles, boundary: Rect, score, min_width: int, min_height: int):
    """Yield empty rects within ``boundary`` in decreasing score order
    (Breuel 2002; empty_rects.rs:51-137). ``score(S) <= score(R)`` must
    hold for S contained in R."""
    obstacles = sorted(obstacles, key=lambda o: o.center())
    counter = itertools.count()  # FIFO tiebreak for equal scores
    heap: list[tuple[float, int, Rect, list[Rect]]] = []
    if not boundary.is_empty():
        heapq.heappush(heap, (-score(boundary), next(counter), boundary, obstacles))
    while heap:
        neg_s, _, b, obs = heapq.heappop(heap)
        if not obs:
            yield b
            continue
        pivot = obs[len(obs) // 2]
        sub_rects = [
            Rect(b.top, b.left, pivot.top, b.right),  # top
            Rect(b.top, b.left, b.bottom, pivot.left),  # left
            Rect(pivot.bottom, b.left, b.bottom, b.right),  # bottom
            Rect(b.top, pivot.right, b.bottom, b.right),  # right
        ]
        for sr in sub_rects:
            if max(sr.width, 0) < min_width or max(sr.height, 0) < min_height or sr.is_empty():
                continue
            sub_obs = [o for o in obs if o.intersects(sr)]
            heapq.heappush(heap, (-score(sr), next(counter), sr, sub_obs))


def filter_overlapping(rect_iter, factor: float):
    """Drop rects whose IoU with an already-yielded rect >= factor
    (empty_rects.rs:170-229)."""
    found: list[Rect] = []
    for r in rect_iter:
        if any(f.iou(r) >= factor for f in found):
            continue
        found.append(r)
        yield r


def find_block_separators(words: list[RotatedRect]) -> list[Rect]:
    if not words:
        return []
    page_rect = _bounding_rect_rotated(words).integral()

    lines = group_into_lines(words, [])
    lines.sort(key=lambda l: int(round(l[0].bounding_rect().top)))

    all_spacings: list[int] = []
    for line in lines:
        if len(line) > 1:
            spacings = sorted(
                int(round(max(nxt.bounding_rect().left - cur.bounding_rect().right, 0.0)))
                for cur, nxt in zip(line, line[1:])
            )
            all_spacings.extend(spacings)
    all_spacings.sort()

    median_word_spacing = all_spacings[len(all_spacings) // 2] if all_spacings else 10
    # NB: the reference takes words[len/2] of the *unsorted* word list for
    # the height median (layout_analysis.rs:116-119) — reproduced as-is.
    median_height = (
        int(round(words[len(words) // 2].height)) if len(words) // 2 < len(words) else 10
    )

    obstacle_boxes = [w.bounding_rect().integral() for w in words]
    min_width = median_word_spacing * 3
    min_height = 3 * max(median_height, 0)

    it = max_empty_rects(obstacle_boxes, page_rect, _score_separator, min_width, min_height)
    return list(itertools.islice(filter_overlapping(it, SEPARATOR_IOU), MAX_SEPARATORS))


def _bounding_rect_rotated(words: list[RotatedRect]) -> Rect:
    br = words[0].bounding_rect()
    for w in words[1:]:
        br = br.union(w.bounding_rect())
    return br


def _midpoint_line(words: list[RotatedRect]) -> Line:
    """Center of first word's left edge -> center of last word's right
    edge (layout_analysis.rs:186-192)."""
    first = words[0].bounding_rect()
    last = words[-1].bounding_rect()
    return Line(first.left, (first.top + first.bottom) / 2.0, last.right, (last.top + last.bottom) / 2.0)


def find_text_lines(words: list[RotatedRect]) -> list[list[RotatedRect]]:
    """Group words into lines, sorted into reading order
    (layout_analysis.rs:158-233). The output ordering defines the final
    text order and therefore the span-equality contract."""
    separators = find_block_separators(words)
    vertical_seps = [
        Line(r.center()[0], r.top, r.center()[0], r.bottom) for r in separators
    ]
    horizontal_seps = [
        Line(r.left, r.center()[1], r.right, r.center()[1]) for r in separators
    ]

    lines = group_into_lines(words, vertical_seps)
    lines.sort(key=lambda l: int(_midpoint_line(l).center()[1]))

    def separated(a: Line, b: Line) -> bool:
        ab = Line(a.center()[0], a.center()[1], b.center()[0], b.center()[1])
        return any(sep.intersects(ab) for sep in horizontal_seps)

    paragraphs: list[list[list[RotatedRect]]] = []
    while lines:
        seed = lines.pop(0)
        para = [seed]
        prev_line = _midpoint_line(seed)
        i = 0
        while i < len(lines):
            cand = _midpoint_line(lines[i])
            if prev_line.horizontal_overlap(cand) > 0 and not separated(prev_line, cand):
                para.append(lines.pop(i))
                prev_line = cand
            else:
                i += 1
        paragraphs.append(para)

    return [line for para in paragraphs for line in para]
