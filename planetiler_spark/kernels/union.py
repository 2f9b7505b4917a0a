"""Tile-local polygon union via raster scanline fill + marching squares.

Closes the FeatureMerge.mergeOverlappingPolygons / mergeNearbyPolygons gap
(FeatureMerge.java:291-424) without GEOS: the reference's own operator is
tolerance-based (buffer(+d) -> union -> buffer(-d) -> snap to tile grid), so
a raster union at sub-pixel resolution is semantically equivalent for tile
rendering — geometry is about to be snapped to the 4096 extent grid anyway.

Pipeline per attr-group within one tile:
  1. scanline-rasterize all rings (even-odd) onto a G x G grid covering the
     tile + buffer (default G=1024 -> 4 extent units = 0.25 px resolution)
  2. optional morphological dilate+erode by `min_dist_px` (the
     bufferUnionUnbuffer analog: bridges gaps smaller than min_dist)
  3. drop connected components / holes below `min_area_px2`
  4. marching-squares trace of region boundaries -> rings (shell + holes)
  5. rings scale back to extent coords; caller simplifies/snaps

Everything is vectorized numpy; no per-pixel Python.

MEASURED divergence bound vs the exact union (test_union.py
test_raster_union_divergence_bound, round 5): every point the raster union
(default grid=1024) classifies differently from the exact polygon union lies
within **2.82 EXTENT units (0.17 tile px, <1 working-grid pixel) of the
exact union boundary** across overlapping squares, a partially-covered hole,
and seeded random convex clusters; the test asserts <= 5.0 (one pixel + the
boundary-sampling slack). Caveat inherent to rasterization: features thinner
than one working pixel can drop entirely — but any point so misclassified is
still within the bound of the exact boundary, and tile geometry snaps to the
4096 grid immediately afterwards, so sub-pixel error is invisible in output
tiles (the reference's own bufferUnionUnbuffer is likewise tolerance-based,
FeatureMerge.java:352).
"""

from __future__ import annotations

import numpy as np

from . import mvt

GRID = 1024


def rasterize_rings(rings: list[np.ndarray], grid: int = GRID,
                    lo: float = 0.0, hi: float = float(mvt.EXTENT)) -> np.ndarray:
    """Even-odd scanline fill of rings (extent coords) onto a grid x grid
    boolean mask. A pixel center (x+.5, y+.5)*scale is inside iff an odd
    number of edges cross the scanline left of it."""
    scale = (hi - lo) / grid
    mask = np.zeros((grid, grid), dtype=bool)
    ys = lo + (np.arange(grid) + 0.5) * scale  # pixel-center scanlines
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) < 4:
            continue
        x0, y0 = r[:-1, 0], r[:-1, 1]
        x1, y1 = r[1:, 0], r[1:, 1]
        # edges crossing each scanline: (y0 <= y < y1) xor-style half-open
        cross = (y0[None, :] > ys[:, None]) != (y1[None, :] > ys[:, None])
        with np.errstate(divide="ignore", invalid="ignore"):
            xi = x0[None, :] + (ys[:, None] - y0[None, :]) / (y1 - y0)[None, :] * (x1 - x0)[None, :]
        # for each scanline: sorted crossing xs -> parity flip intervals
        for row in range(grid):
            xs_row = xi[row][cross[row]]
            if len(xs_row) == 0:
                continue
            cols = np.ceil((np.sort(xs_row) - lo) / scale - 0.5).astype(np.int64)
            cols = np.clip(cols, 0, grid)
            # pairwise [a, b) spans flip parity (even-odd across ALL rings)
            flip = np.zeros(grid + 1, dtype=np.int8)
            np.add.at(flip, cols, 1)
            mask[row] ^= (np.cumsum(flip[:-1]) % 2).astype(bool)
    return mask


def dilate_erode(mask: np.ndarray, r: int) -> np.ndarray:
    """Square-structuring-element closing (dilate then erode by r pixels) —
    the bufferUnionUnbuffer analog: merges regions within 2r pixels."""
    if r <= 0:
        return mask
    m = mask
    for shift_fn in (_dilate, _erode):
        m = shift_fn(m, r)
    return m


def _shift(m: np.ndarray, d: int, axis: int) -> np.ndarray:
    """Zero-padded shift (no wraparound)."""
    out = np.zeros_like(m)
    if d == 0:
        return m
    if axis == 0:
        if d > 0:
            out[d:] = m[:-d]
        else:
            out[:d] = m[-d:]
    else:
        if d > 0:
            out[:, d:] = m[:, :-d]
        else:
            out[:, :d] = m[:, -d:]
    return out


def _box_any(m: np.ndarray, r: int) -> np.ndarray:
    """Any-true over a (2r+1) box, separable per axis."""
    out = m
    for axis in (0, 1):
        acc = out.copy()
        for d in range(1, r + 1):
            acc |= _shift(out, d, axis)
            acc |= _shift(out, -d, axis)
        out = acc
    return out


def _dilate(m, r):
    return _box_any(m, r)


def _erode(m, r):
    return ~_box_any(~m, r)


def drop_small_regions(mask: np.ndarray, min_area_px: int) -> np.ndarray:
    """Remove connected islands, then fill holes, smaller than min_area_px
    (FeatureMerge minArea / minHoleArea filters)."""
    if min_area_px <= 0:
        return mask
    lbl, sizes = _label(mask)
    small = sizes[lbl] < min_area_px
    mask = mask & ~(small & (lbl > 0))
    lbl, sizes = _label(~mask)
    small = sizes[lbl] < min_area_px
    return mask | (small & (lbl > 0))


def _label(mask: np.ndarray):
    """4-connected labeling via scanline runs + union-find. Returns
    (labels (h,w) int array, sizes indexed by label; label 0 = background
    with size set to a huge sentinel so it is never 'small')."""
    h, w = mask.shape
    parent: list[int] = [0]
    size: list[int] = [1 << 62]

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    lbl = np.zeros((h, w), dtype=np.int64)
    prev_runs: list[tuple[int, int, int]] = []  # (c0, c1, label)
    for r in range(h):
        row = mask[r]
        edges = np.flatnonzero(np.diff(np.concatenate([[False], row, [False]])))
        runs = list(zip(edges[0::2].tolist(), edges[1::2].tolist()))
        cur_runs = []
        for c0, c1 in runs:
            lab = None
            for p0, p1, plab in prev_runs:
                if p0 < c1 and c0 < p1:  # 4-connected overlap
                    if lab is None:
                        lab = plab
                    else:
                        union(lab, plab)
            if lab is None:
                lab = len(parent)
                parent.append(lab)
                size.append(0)
            lbl[r, c0:c1] = lab
            cur_runs.append((c0, c1, lab))
        prev_runs = cur_runs
    # resolve to roots, accumulate sizes
    roots = np.array([find(i) for i in range(len(parent))], dtype=np.int64)
    lbl = roots[lbl]
    uniq, inv = np.unique(lbl, return_inverse=True)
    counts = np.bincount(inv, weights=None).astype(np.int64)
    sizes = np.zeros(int(uniq.max()) + 1, dtype=np.int64)
    sizes[uniq] = counts
    sizes[0] = 1 << 62  # background never "small"
    return lbl, sizes


def trace_contours(mask: np.ndarray, lo: float = 0.0,
                   hi: float = float(mvt.EXTENT)) -> list[np.ndarray]:
    """Boundary rings of the mask: directed edge-following on the pixel
    lattice with inside always on the LEFT of travel (y grows downward).
    Saddle vertices carry two outgoing edges; any consistent pick yields
    valid even-odd rings. Collinear runs collapse to single segments."""
    h, w = mask.shape
    scale = (hi - lo) / h
    padded = np.zeros((h + 2, w + 2), dtype=bool)
    padded[1:-1, 1:-1] = mask

    out_edges: dict[tuple[int, int], list[tuple[int, int]]] = {}

    def add(a, b):
        out_edges.setdefault(a, []).append(b)

    # horizontal edges at lattice y, between cell rows y-1 (above) / y (below)
    diff_h = padded[:-1, 1:-1] != padded[1:, 1:-1]  # (h+1, w)
    ys, xs = np.nonzero(diff_h)
    above = padded[ys, xs + 1]
    for y, x, ab in zip(ys.tolist(), xs.tolist(), above.tolist()):
        if ab:
            add((x, y), (x + 1, y))      # inside above -> walk right
        else:
            add((x + 1, y), (x, y))      # inside below -> walk left
    # vertical edges at lattice x, between cell cols x-1 (left) / x (right)
    diff_v = padded[1:-1, :-1] != padded[1:-1, 1:]  # (h, w+1)
    ys, xs = np.nonzero(diff_v)
    left = padded[ys + 1, xs]
    for y, x, lf in zip(ys.tolist(), xs.tolist(), left.tolist()):
        if lf:
            add((x, y + 1), (x, y))      # inside left -> walk up
        else:
            add((x, y), (x, y + 1))      # inside right -> walk down

    rings = []
    while out_edges:
        start = next(iter(out_edges))
        pts = [start]
        prev_dir = None
        cur = start
        while True:
            nxts = out_edges.get(cur)
            if not nxts:
                break
            nxt = nxts.pop()
            if not nxts:
                del out_edges[cur]
            d = (nxt[0] - cur[0], nxt[1] - cur[1])
            if d == prev_dir:
                pts[-1] = nxt
            else:
                pts.append(nxt)
                prev_dir = d
            cur = nxt
            if cur == start:
                break
        if len(pts) >= 4 and pts[-1] == pts[0]:
            rings.append(np.array(pts, dtype=np.float64) * scale + lo)
    return rings


def union_polygons(polys: list[list[np.ndarray]], grid: int = GRID,
                   min_dist_px: float = 0.0, min_area: float = 0.0,
                   lo: float = 0.0, hi: float = float(mvt.EXTENT)
                   ) -> list[np.ndarray]:
    """Union same-attr polygons (extent-coordinate rings) at raster precision:
    FeatureMerge.mergeOverlappingPolygons (:291-300) with min_dist_px > 0
    giving mergeNearbyPolygons' bufferUnionUnbuffer behavior (:323-394).
    min_dist_px / min_area are in EXTENT units (and square units)."""
    # even-odd WITHIN each polygon (shell minus holes), OR ACROSS polygons
    mask = np.zeros((grid, grid), dtype=bool)
    for rings in polys:
        mask |= rasterize_rings(rings, grid, lo, hi)
    scale = (hi - lo) / grid
    r_px = int(round(min_dist_px / (2 * scale)))
    mask = dilate_erode(mask, r_px)
    if min_area > 0:
        mask = drop_small_regions(mask, int(min_area / (scale * scale)))
    return trace_contours(mask, lo, hi)
