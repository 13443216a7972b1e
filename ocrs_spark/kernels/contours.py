"""Connected components, contour tracing, polygon simplification,
min-area rects, and polygon rasterization — pure numpy/Python.

Behavioral counterparts of the rten-imageproc routines used by
``ocrs/src/detection.rs:41-62`` (find_contours RetrievalMode::External,
simplify_polygon eps=2, min_area_rect) and
``ocrs/src/recognition.rs:91-126`` (Polygon::fill_iter). Implemented from
the published algorithms (Suzuki-Abe border following via Moore tracing,
Douglas-Peucker, rotating calipers) — no reference code reused.

Connected-component labeling is a vectorized row-run union-find: runs of
foreground per row are found with np.diff, merged across rows with
8-connectivity. This keeps the hot loop O(rows + runs) in Python with all
per-pixel work in numpy.
"""

from __future__ import annotations

import math

import numpy as np

from ..geometry import Rect, RotatedRect

# Moore neighborhood in clockwise order starting from W (dx, dy).
_MOORE = [(-1, 0), (-1, -1), (0, -1), (1, -1), (1, 0), (1, 1), (0, 1), (-1, 1)]

# Single-slot scratch for _component_runs (reused across same-shaped
# masks; Spark Python workers are single-threaded processes).
_RUN_SCRATCH = None


def label_components(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """8-connected component labeling of a boolean mask.

    Returns (labels, n) where labels is int32 (0 = background,
    components numbered 1..n in raster order of their first pixel).
    """
    runs_by_label, h, w = _component_runs(mask)
    labels = np.zeros((h, w), dtype=np.int32)
    for lbl, runs in enumerate(runs_by_label, start=1):
        for y, s, e in runs:
            labels[y, s:e] = lbl
    return labels, len(runs_by_label)


def _component_runs(mask: np.ndarray):
    """Row-run union-find labeling. Returns (runs_by_label, h, w) where
    runs_by_label[i] is the list of (y, start, end) half-open runs of
    component i+1, in raster order of first appearance."""
    mask = np.asarray(mask, dtype=bool)
    h, w = mask.shape

    # All run boundaries in ONE 2D diff (row-major nonzero order pairs
    # starts with ends per row), instead of h per-row numpy calls. The
    # scratch buffers are reused across calls (single-slot, per-process)
    # — this host faults fresh pages at ~20 MB/s, and allocating ~1 MB
    # of temporaries per image measurably throttles concurrent workers
    # (see malloc_tuning.py).
    global _RUN_SCRATCH
    key = (h, w)
    if _RUN_SCRATCH is None or _RUN_SCRATCH[0] != key:
        padded = np.zeros((h, w + 2), dtype=np.int8)
        diff = np.empty((h, w + 1), dtype=np.int8)
        _RUN_SCRATCH = (key, padded, diff)
    _, padded, diff = _RUN_SCRATCH
    padded[:, 1:-1] = mask
    np.subtract(padded[:, 1:], padded[:, :-1], out=diff)
    sy, sx = np.nonzero(diff == 1)
    _, ex = np.nonzero(diff == -1)
    n = len(sy)

    parent = list(range(n + 1))  # union-find over run ids 1..n

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb

    runs = list(zip(sy.tolist(), sx.tolist(), ex.tolist()))
    prev: list[tuple[int, int, int]] = []  # (start, end, run_id) of row-1
    cur: list[tuple[int, int, int]] = []
    cur_row = -1
    for i, (y, s, e) in enumerate(runs):
        rid = i + 1
        if y != cur_row:
            prev = cur if y == cur_row + 1 else []
            cur = []
            cur_row = y
        # 8-connectivity: overlap with previous row extended by 1 col.
        for ps, pe, pid in prev:
            if ps < e + 1 and pe > s - 1:
                union(rid, pid)
        cur.append((s, e, rid))

    # Resolve roots to dense component labels in raster order.
    root_to_label: dict[int, int] = {}
    runs_by_label: list[list[tuple[int, int, int]]] = []
    for i, (y, s, e) in enumerate(runs):
        r = find(i + 1)
        lbl = root_to_label.get(r)
        if lbl is None:
            lbl = len(runs_by_label)
            root_to_label[r] = lbl
            runs_by_label.append([])
        runs_by_label[lbl].append((y, s, e))
    return runs_by_label, h, w


def _trace_on_grid(grid: list[list[bool]], sx: int, sy: int, max_steps: int) -> list[tuple[int, int]]:
    """Moore-neighbor tracing (clockwise, Jacob's stopping criterion) on
    a padded boolean grid (grid[y][x]; a 1-pixel False border makes
    bounds checks unnecessary). ``(sx, sy)`` is the topmost-leftmost
    foreground pixel. Returns border pixels (x, y) in traversal order."""
    moore = _MOORE
    # Flat (dy+1)*3 + (dx+1) -> ring index table (faster than a dict of
    # tuples in the per-step loop).
    delta_dir = [0] * 9
    for i, (dx, dy) in enumerate(moore):
        delta_dir[(dy + 1) * 3 + (dx + 1)] = i
    contour = [(sx, sy)]
    cx, cy = sx, sy
    bx, by = sx - 1, sy  # entered the start pixel from the West
    first_move = None
    for _ in range(max_steps):
        bdir = delta_dir[(by - cy + 1) * 3 + (bx - cx + 1)]
        nxt = None
        for k in range(1, 9):
            dx, dy = moore[(bdir + k) & 7]
            nx, ny = cx + dx, cy + dy
            if grid[ny][nx]:
                nxt = (nx, ny)
                break
            bx, by = nx, ny  # last background cell examined
        if nxt is None:
            return contour  # isolated pixel
        if cx == sx and cy == sy:
            if first_move is None:
                first_move = nxt
            elif nxt == first_move:
                return contour  # completed the loop
        cx, cy = nxt
        contour.append(nxt)
    raise RuntimeError("contour tracing did not terminate")


def trace_outer_contour(labels: np.ndarray, label: int, start: tuple[int, int]) -> list[tuple[int, int]]:
    """Back-compat wrapper: trace one component of a label image."""
    grid = np.pad(labels == label, 1).tolist()
    sx, sy = start
    pts = _trace_on_grid(grid, sx + 1, sy + 1, 4 * (labels.size + 8))
    return [(x - 1, y - 1) for x, y in pts]


def find_contours_external(mask: np.ndarray) -> list[list[tuple[int, int]]]:
    """Outer contour of each 8-connected component, as ordered (x, y)
    border-pixel lists (counterpart of rten-imageproc find_contours with
    RetrievalMode::External, used at detection.rs:46).

    Each component is traced on its own padded bounding-box crop (built
    from the labeling runs), so cost scales with component perimeter,
    not image area."""
    runs_by_label, h, w = _component_runs(mask)
    contours = []
    for runs in runs_by_label:
        y0 = runs[0][0]
        y1 = runs[-1][0]
        x0 = min(s for _, s, _ in runs)
        x1 = max(e for _, _, e in runs)
        ch, cw = y1 - y0 + 1, x1 - x0
        crop = np.zeros((ch + 2, cw + 2), dtype=bool)
        for y, s, e in runs:
            crop[y - y0 + 1, s - x0 + 1 : e - x0 + 1] = True
        grid = crop.tolist()
        # Start = topmost-leftmost pixel (raster order of first run).
        sx, sy = runs[0][1] - x0 + 1, 1
        pts = _trace_on_grid(grid, sx, sy, 4 * ((ch + 2) * (cw + 2) + 8))
        contours.append([(x + x0 - 1, y + y0 - 1) for x, y in pts])
    return contours


def simplify_polyline(points: list[tuple[float, float]], eps: float) -> list[tuple[float, float]]:
    """Douglas-Peucker simplification, endpoints kept (counterpart of
    rten-imageproc simplify_polygon at detection.rs:50)."""
    if len(points) <= 2:
        return list(points)
    pts = np.asarray(points, dtype=np.float64)
    keep = np.zeros(len(pts), dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, len(pts) - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 <= i0 + 1:
            continue
        p0, p1 = pts[i0], pts[i1]
        ex, ey = p1[0] - p0[0], p1[1] - p0[1]
        seg_len = math.hypot(ex, ey)
        mid = pts[i0 + 1 : i1]
        if seg_len == 0:
            d = np.hypot(mid[:, 0] - p0[0], mid[:, 1] - p0[1])
        else:
            d = np.abs(ex * (mid[:, 1] - p0[1]) - ey * (mid[:, 0] - p0[0])) / seg_len
        k = int(np.argmax(d))
        if d[k] > eps:
            j = i0 + 1 + k
            keep[j] = True
            stack.append((i0, j))
            stack.append((j, i1))
    return [tuple(p) for p in pts[keep]]


def convex_hull(points) -> np.ndarray:
    """Andrew monotone chain. Returns hull points (x, y) CCW in image
    coords (y down), shape (m, 2) float64."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    if len(pts) <= 2:
        return pts
    # Sorted by x then y (np.unique sorts rows lexicographically).

    def half(iterable):
        out = []
        for p in iterable:
            while len(out) >= 2:
                ox, oy = out[-2]
                ax, ay = out[-1]
                if (ax - ox) * (p[1] - oy) - (ay - oy) * (p[0] - ox) <= 0:
                    out.pop()
                else:
                    break
            out.append((p[0], p[1]))
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1])


def min_area_rect(points) -> RotatedRect | None:
    """Minimum-area oriented bounding rect via rotating calipers over hull
    edges (counterpart of rten-imageproc min_area_rect at
    detection.rs:52). Up axis is oriented towards (0, -1) so horizontal
    input yields width = x-extent, height = y-extent."""
    pts = np.asarray(points, dtype=np.float64)
    if len(pts) == 0:
        return None
    hull = convex_hull(pts)
    if len(hull) == 1:
        return RotatedRect(hull[0][0], hull[0][1], 0.0, -1.0, 0.0, 0.0)
    if len(hull) == 2:
        (x0, y0), (x1, y1) = hull
        dx, dy = x1 - x0, y1 - y0
        length = math.hypot(dx, dy)
        ux, uy = (-dy / length, dx / length) if length else (0.0, -1.0)
        rr = RotatedRect((x0 + x1) / 2, (y0 + y1) / 2, ux, uy, length, 0.0)
        return rr.orient_towards(0.0, -1.0)

    # All caliper edges evaluated at once: project every hull point on
    # every edge direction (hulls are tiny, the m x m matrices are
    # cheap) and take the first minimal-area edge — float math and
    # tie-breaking identical to the per-edge loop this replaces.
    nxt = np.roll(hull, -1, axis=0)
    evec = nxt - hull
    elen = np.hypot(evec[:, 0], evec[:, 1])
    valid = elen > 0
    e = evec[valid] / elen[valid, None]  # unit edge dirs (k, 2)
    p = np.stack([-e[:, 1], e[:, 0]], axis=1)  # perpendiculars
    # Explicit mul+add (not matmul): BLAS dot may fuse FMA and round
    # differently; this keeps results bit-identical to the scalar loop.
    x, y = hull[:, 0][:, None], hull[:, 1][:, None]
    proj_e = x * e[:, 0][None, :] + y * e[:, 1][None, :]  # (m points, k edges)
    proj_p = x * p[:, 0][None, :] + y * p[:, 1][None, :]
    emax, emin = proj_e.max(axis=0), proj_e.min(axis=0)
    pmax, pmin = proj_p.max(axis=0), proj_p.min(axis=0)
    ws = emax - emin
    hs = pmax - pmin
    i = int(np.argmin(ws * hs))  # first minimum, like the strict < loop
    ce = (emax[i] + emin[i]) / 2
    cp = (pmax[i] + pmin[i]) / 2
    ex, ey = e[i]
    px, py = p[i]
    # Width along the edge direction; height along perpendicular.
    # Up axis = the axis along "height", pointing up-ish.
    rr = RotatedRect(ce * ex + cp * px, ce * ey + cp * py, px, py, ws[i], hs[i])
    # Normalize: make the up axis the one closest to vertical, and point
    # it towards (0, -1) (mirrors orient_towards usage,
    # text_items.rs:26-29).
    if abs(rr.uy) < abs(rr.ux):
        # Swap axes: up becomes the perpendicular of current up.
        rr = RotatedRect(rr.cx, rr.cy, rr.uy, -rr.ux, rr.height, rr.width)
    return rr.orient_towards(0.0, -1.0)


def fill_polygon_mask(points: list[tuple[int, int]], bounds: Rect) -> np.ndarray:
    """Rasterize a polygon into a boolean mask over ``bounds`` (integral
    rect), using even-odd scanline with half-open [min, max) edge and
    span conventions (counterpart of Polygon::fill_iter used at
    recognition.rs:110-117)."""
    top, left = int(bounds.top), int(bounds.left)
    h, w = int(bounds.height), int(bounds.width)
    mask = np.zeros((h, w), dtype=bool)
    if not points or h <= 0 or w <= 0:
        return mask
    n = len(points)
    edges = []
    for i in range(n):
        x0, y0 = points[i]
        x1, y1 = points[(i + 1) % n]
        if y0 == y1:
            continue
        edges.append((float(x0), float(y0), float(x1), float(y1)))
    if not edges:
        return mask
    # All row-edge intersections in one vectorized pass; the per-row
    # span writing below sees the same sorted xs the scalar loop built.
    e = np.asarray(edges, dtype=np.float64)  # (k, 4): x0 y0 x1 y1
    yy = (top + np.arange(h, dtype=np.float64))[:, None]  # (h, 1)
    ylo = np.minimum(e[:, 1], e[:, 3])[None, :]
    yhi = np.maximum(e[:, 1], e[:, 3])[None, :]
    active = (ylo <= yy) & (yy < yhi)  # half-open edge span
    t = (yy - e[:, 1][None, :]) / (e[:, 3] - e[:, 1])[None, :]
    xs_all = e[:, 0][None, :] + t * (e[:, 2] - e[:, 0])[None, :]
    xs_all = np.where(active, xs_all, np.inf)
    xs_sorted = np.sort(xs_all, axis=1)
    counts = active.sum(axis=1)
    for row in range(h):
        c = int(counts[row])
        xs = xs_sorted[row]
        for j in range(0, c - 1, 2):
            a = int(math.ceil(xs[j]))
            b = int(math.ceil(xs[j + 1]))  # half-open [a, b)
            a = max(a, left)
            b = min(b, left + w)
            if b > a:
                mask[row, a - left : b - left] = True
    return mask
