"""Pure-numpy geometry kernels (no shapely/GEOS in this environment).

Implements the geometry semantics the engine needs, re-derived from the
reference's JTS usage (all paths under /root/reference/planetiler-core/src/main/java/com/onthegomap/planetiler/):

  - point-in-polygon + nearest-fallback:  geo/PolygonIndex.java:20-145
    (STRtree envelope query + exact contains; here: bbox grid index + even-odd
    ray cast, vectorized over all points per polygon)
  - Douglas-Peucker simplification:       geo/DouglasPeuckerSimplifier.java:33-100
    (iterative DP on squared segment distance, min-4-point polygon-ring guard)
  - rectangle clipping (Sutherland-Hodgman / Cohen-style), the primitive behind
    stripe tile slicing:                  render/TiledGeometry.java:220-231
    (intersectX/intersectY linear interpolation)
  - ring area / orientation / centroid:   geo/GeoUtils.java:319-329 (orientation fix)
  - WKB codec for Point/LineString/Polygon/MultiPolygon (standard OGC WKB,
    little-endian) so geometry travels as a Spark `binary` column.

Everything operates on float64 numpy arrays; polygons are (N,2) ring arrays,
first ring = shell, rest = holes (shell CCW-or-CW agnostic: even-odd rule).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

# --- WKB ---------------------------------------------------------------------

_WKB_POINT = 1
_WKB_LINESTRING = 2
_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6


def wkb_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, _WKB_POINT, x, y)


def wkb_linestring(coords: np.ndarray) -> bytes:
    coords = np.asarray(coords, dtype="<f8")
    return struct.pack("<BII", 1, _WKB_LINESTRING, len(coords)) + coords.tobytes()


def wkb_polygon(rings: list[np.ndarray]) -> bytes:
    out = [struct.pack("<BII", 1, _WKB_POLYGON, len(rings))]
    for r in rings:
        r = np.asarray(r, dtype="<f8")
        out.append(struct.pack("<I", len(r)) + r.tobytes())
    return b"".join(out)


def wkb_multipolygon(polys: list[list[np.ndarray]]) -> bytes:
    out = [struct.pack("<BII", 1, _WKB_MULTIPOLYGON, len(polys))]
    for rings in polys:
        out.append(wkb_polygon(rings))
    return b"".join(out)


def parse_wkb(buf: bytes):
    """Parse WKB -> (geom_type:str, data). Point -> (x,y); LineString -> (N,2);
    Polygon -> [rings]; MultiPolygon -> [[rings], ...]. Little/big endian supported."""
    geom, _ = _parse_wkb_at(memoryview(buf), 0)
    return geom


def _parse_wkb_at(mv, off):
    bo = "<" if mv[off] == 1 else ">"
    (typ,) = struct.unpack_from(bo + "I", mv, off + 1)
    typ = typ & 0xFF  # ignore SRID/dimension flags
    off += 5
    if typ == _WKB_POINT:
        x, y = struct.unpack_from(bo + "dd", mv, off)
        return ("point", (x, y)), off + 16
    if typ == _WKB_LINESTRING:
        (n,) = struct.unpack_from(bo + "I", mv, off)
        off += 4
        arr = np.frombuffer(mv, dtype=bo + "f8", count=2 * n, offset=off).reshape(n, 2).astype(np.float64)
        return ("linestring", arr), off + 16 * n
    if typ == _WKB_POLYGON:
        (nrings,) = struct.unpack_from(bo + "I", mv, off)
        off += 4
        rings = []
        for _ in range(nrings):
            (n,) = struct.unpack_from(bo + "I", mv, off)
            off += 4
            rings.append(np.frombuffer(mv, dtype=bo + "f8", count=2 * n, offset=off).reshape(n, 2).astype(np.float64))
            off += 16 * n
        return ("polygon", rings), off
    if typ == _WKB_MULTIPOLYGON:
        (np_,) = struct.unpack_from(bo + "I", mv, off)
        off += 4
        polys = []
        for _ in range(np_):
            (_g, data), off = _parse_wkb_at(mv, off)
            polys.append(data)
        return ("multipolygon", polys), off
    raise ValueError(f"unsupported WKB type {typ}")


# --- tile-local parts codec ----------------------------------------------------
# Serialize a list of int32 (N,2) coordinate parts (rings / line pieces) into
# one binary column value, so sliced geometry travels the shuffle compactly
# (the reference ships msgpack'd commands the same way, FeatureGroup.java:252).

def pack_parts(parts: list[np.ndarray]) -> bytes:
    out = [struct.pack("<I", len(parts))]
    for p in parts:
        a = np.ascontiguousarray(p, dtype="<i4")
        out.append(struct.pack("<I", len(a)))
        out.append(a.tobytes())
    return b"".join(out)


def unpack_parts(buf: bytes) -> list[np.ndarray]:
    mv = memoryview(buf)
    (n,) = struct.unpack_from("<I", mv, 0)
    off = 4
    parts = []
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", mv, off)
        off += 4
        parts.append(np.frombuffer(mv, dtype="<i4", count=2 * ln, offset=off)
                     .reshape(ln, 2).astype(np.int64))
        off += 8 * ln
    return parts


# --- ring math ----------------------------------------------------------------

def ring_signed_area(ring: np.ndarray) -> float:
    """Shoelace; positive = CCW in a y-up frame. World coords are y-down, so
    'outer CCW after Y-flip' (GeoUtils.java:319-329) == negative signed area here."""
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def line_centroid(line: np.ndarray) -> tuple[float, float]:
    """LENGTH-WEIGHTED linestring centroid (JTS Centroid line semantics —
    ADVICE r2: the unweighted vertex mean diverges when segment lengths
    vary): sum of segment midpoints weighted by segment length."""
    seg = np.sqrt(((line[1:] - line[:-1]) ** 2).sum(axis=1))
    total = seg.sum()
    if total == 0:
        return float(line[:, 0].mean()), float(line[:, 1].mean())
    mid = (line[1:] + line[:-1]) / 2.0
    return (float((mid[:, 0] * seg).sum() / total),
            float((mid[:, 1] * seg).sum() / total))


def polygon_centroid(rings: list[np.ndarray]) -> tuple[float, float]:
    """Area centroid honoring holes (JTS Centroid polygon semantics —
    ADVICE r2: the shell-only centroid ignored holes): hole areas subtract
    from both the moment and the mass; degenerate (zero-area) polygons fall
    back to the shell centroid."""
    ax = abs(ring_signed_area(rings[0]))
    cx0, cy0 = ring_centroid(rings[0])
    num_x, num_y, den = ax * cx0, ax * cy0, ax
    for r in rings[1:]:
        if len(r) < 4:
            continue
        a = abs(ring_signed_area(r))
        cx, cy = ring_centroid(r)
        num_x -= a * cx
        num_y -= a * cy
        den -= a
    if abs(den) < 1e-18:
        return ring_centroid(rings[0])
    return num_x / den, num_y / den


def ring_centroid(ring: np.ndarray) -> tuple[float, float]:
    a = ring_signed_area(ring)
    if abs(a) < 1e-18:
        return float(ring[:, 0].mean()), float(ring[:, 1].mean())
    x, y = ring[:, 0], ring[:, 1]
    cross = x[:-1] * y[1:] - x[1:] * y[:-1]
    cx = float(np.sum((x[:-1] + x[1:]) * cross) / (6 * a))
    cy = float(np.sum((y[:-1] + y[1:]) * cross) / (6 * a))
    return cx, cy


def ensure_orientation(ring: np.ndarray, ccw: bool) -> np.ndarray:
    area = ring_signed_area(ring)
    if (area > 0) != ccw:
        return ring[::-1].copy()
    return ring


def line_length(coords: np.ndarray) -> float:
    d = np.diff(coords, axis=0)
    return float(np.sqrt((d * d).sum(axis=1)).sum())


# --- misc scalar geometry (GeoUtils.java) --------------------------------------

def is_convex(ring: np.ndarray, tolerance: float = 0.1) -> bool:
    """GeoUtils.isConvex:497-563 — all cross products share a sign, allowing
    slightly-concave corners within a relative tolerance of the dominant turn."""
    pts = ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring
    if len(pts) < 3:
        return False
    a = np.diff(np.vstack([pts, pts[:2]]), axis=0)
    cross = a[:-1, 0] * a[1:, 1] - a[:-1, 1] * a[1:, 0]
    scale = np.abs(cross).max()
    if scale == 0:
        return False
    neg = cross < -tolerance * scale
    pos = cross > tolerance * scale
    return not (neg.any() and pos.any())


def point_along_offset(a: np.ndarray, b: np.ndarray, ratio: float,
                       offset: float) -> np.ndarray:
    """GeoUtils.pointAlongOffset:480 — point at `ratio` along segment a->b,
    displaced `offset` perpendicular (to the left of travel)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    p = a + ratio * (b - a)
    d = b - a
    ln = float(np.hypot(*d))
    if ln == 0:
        return p
    normal = np.array([-d[1], d[0]]) / ln
    return p + offset * normal


def polygon_to_linestring(rings: list[np.ndarray]) -> list[np.ndarray]:
    """GeoUtils.polygonToLineString:443 — polygon boundary as linestrings."""
    return [r.copy() for r in rings]


def innermost_point(rings: list[np.ndarray], tolerance: float = 0.01) -> tuple[float, float]:
    """Pole of inaccessibility (WithGeometry.innermostPoint:? via polylabel):
    iterative grid refinement maximizing distance to the boundary. `tolerance`
    is relative to the bbox diagonal."""
    shell = rings[0]
    minx, miny = shell[:, 0].min(), shell[:, 1].min()
    maxx, maxy = shell[:, 0].max(), shell[:, 1].max()
    diag = float(np.hypot(maxx - minx, maxy - miny))
    if diag == 0:
        return float(minx), float(miny)
    # coarse-to-fine grid: evaluate cells, refine around the best
    best_xy = (float((minx + maxx) / 2), float((miny + maxy) / 2))
    best_d = -np.inf
    cx0, cy0, cx1, cy1 = minx, miny, maxx, maxy
    for _ in range(12):
        xs = np.linspace(cx0, cx1, 9)
        ys = np.linspace(cy0, cy1, 9)
        gx, gy = np.meshgrid(xs, ys)
        px, py = gx.ravel(), gy.ravel()
        inside = points_in_polygon(px, py, rings)
        if inside.any():
            d = dist_to_boundary(px[inside], py[inside], rings)
            j = int(np.argmax(d))
            if d[j] > best_d:
                best_d = float(d[j])
                best_xy = (float(px[inside][j]), float(py[inside][j]))
        span_x = (cx1 - cx0) / 4
        span_y = (cy1 - cy0) / 4
        if np.hypot(span_x, span_y) < tolerance * diag:
            break
        cx0, cx1 = best_xy[0] - span_x, best_xy[0] + span_x
        cy0, cy1 = best_xy[1] - span_y, best_xy[1] + span_y
    return best_xy


def polygon_self_intersects(rings: list[np.ndarray]) -> bool:
    """True if any two non-adjacent edges (within or across rings) PROPERLY
    cross — the bowtie/self-intersection test behind the repair chain
    (GeoUtils.snapAndFixPolygon:315-399 calls JTS isValid; proper crossings
    are the failure mode rounding/clipping actually produces). Vectorized
    all-pairs orientation test, O(E^2) — polygon rings here are small."""
    if sum(len(r) for r in rings) <= 40:
        # tiny fragments (the overwhelming case after tile clipping): a pure-
        # Python prologue + scalar pair loop with early exit is ~30x cheaper
        # than the numpy gather (asarray/roll/concatenate per ring cost more
        # than the whole O(E^2) test at E~5; same measured pattern as the
        # small-geometry clip kernels; identical float64 arithmetic)
        axl, ayl, bxl, byl, ridl, sidl, nszl = [], [], [], [], [], [], []
        for k, ring in enumerate(rings):
            pts = [(float(p[0]), float(p[1]))
                   for p in (ring.tolist() if isinstance(ring, np.ndarray) else ring)]
            if len(pts) >= 2 and pts[0] == pts[-1]:
                pts = pts[:-1]
            n = len(pts)
            if n < 2:
                continue
            for s in range(n):
                x0, y0 = pts[s]
                x1, y1 = pts[(s + 1) % n]
                axl.append(x0); ayl.append(y0)
                bxl.append(x1); byl.append(y1)
                ridl.append(k); sidl.append(s); nszl.append(n)
        m = len(axl)
        for i in range(m - 1):
            oxi, oyi, pxi, pyi = axl[i], ayl[i], bxl[i], byl[i]
            dxi, dyi = pxi - oxi, pyi - oyi
            for j in range(i + 1, m):
                if ridl[i] == ridl[j]:
                    dd = sidl[j] - sidl[i]
                    if dd <= 1 or dd == nszl[i] - 1:
                        continue
                d1 = dxi * (ayl[j] - oyi) - dyi * (axl[j] - oxi)
                d2 = dxi * (byl[j] - oyi) - dyi * (bxl[j] - oxi)
                if d1 * d2 >= 0:
                    continue
                dxj, dyj = bxl[j] - axl[j], byl[j] - ayl[j]
                d3 = dxj * (oyi - ayl[j]) - dyj * (oxi - axl[j])
                d4 = dxj * (pyi - ayl[j]) - dyj * (pxi - axl[j])
                if d3 * d4 < 0:
                    return True
        return False

    ax, ay, bx, by, rid, sid = [], [], [], [], [], []
    for k, ring in enumerate(rings):
        r = np.asarray(ring, dtype=np.float64)
        if len(r) < 2:
            continue
        closed = np.array_equal(r[0], r[-1])
        p = r[:-1] if closed else r
        n = len(p)
        if n < 2:
            continue
        nxt = np.roll(np.arange(n), -1)
        ax.append(p[:, 0]); ay.append(p[:, 1])
        bx.append(p[nxt, 0]); by.append(p[nxt, 1])
        rid.append(np.full(n, k)); sid.append(np.arange(n))
    if not ax:
        return False
    ax = np.concatenate(ax); ay = np.concatenate(ay)
    bx = np.concatenate(bx); by = np.concatenate(by)
    rid = np.concatenate(rid); sid = np.concatenate(sid)
    m = len(ax)
    sizes = np.array([np.sum(rid == k) for k in range(len(rings))])
    nsz = sizes[rid]

    def cross(ox, oy, px, py, qx, qy):
        return (px - ox) * (qy - oy) - (py - oy) * (qx - ox)

    # blockwise over row chunks: bounds the temporaries at (chunk x m) so a
    # pathological many-edge fragment can't allocate O(E^2) gigabytes
    # (ADVICE r2: polygon_self_intersects had no size guard)
    chunk = max(32, (1 << 22) // max(m, 1))
    for lo in range(0, m, chunk):
        s = slice(lo, min(lo + chunk, m))
        d1 = cross(ax[s, None], ay[s, None], bx[s, None], by[s, None], ax[None, :], ay[None, :])
        d2 = cross(ax[s, None], ay[s, None], bx[s, None], by[s, None], bx[None, :], by[None, :])
        d3 = cross(ax[None, :], ay[None, :], bx[None, :], by[None, :], ax[s, None], ay[s, None])
        d4 = cross(ax[None, :], ay[None, :], bx[None, :], by[None, :], bx[s, None], by[s, None])
        proper = (d1 * d2 < 0) & (d3 * d4 < 0)
        same_ring = rid[s, None] == rid[None, :]
        dd = np.abs(sid[s, None] - sid[None, :])
        adjacent = same_ring & ((dd <= 1) | (dd == nsz[s, None] - 1))
        if bool((proper & ~adjacent).any()):
            return True
    return False


def repair_polygon(rings: list[np.ndarray], lo: float, hi: float,
                   grid: int = 512, method: str = "raster"
                   ) -> list[np.ndarray]:
    """snapAndFixPolygon analog (GeoUtils.java:315-399) without GEOS:

    - valid input -> returned unchanged except orientation normalization
      (OrientationFixer: shells CCW, holes CW in tile coords);
    - self-intersecting input (bowtie etc.) -> EVEN-ODD regularization.
      method="raster" (default, the render-path choice): scanline-fill at
      `grid` resolution over [lo, hi) and re-trace with marching squares
      (sub-pixel precision — the geometry snaps to the 4096 grid next, so
      the raster error is invisible; kernels/union.py rationale).
      method="exact": kernels/polyclip even-odd regularization — the
      literal semantics JTS buffer(0) applies (every output vertex an
      input vertex or exact edge intersection; no grid).
    Returns [] when the repaired region is empty."""
    from . import union as un

    if not rings:
        return []
    if not polygon_self_intersects(rings):
        out = []
        for i, ring in enumerate(rings):
            r = np.asarray(ring, dtype=np.float64)
            if len(r) < 4:
                continue
            out.append(ensure_orientation(r, ccw=(i == 0)))
        return out
    if method == "exact":
        from . import polyclip as pcl
        window = [np.array([[lo, lo], [hi, lo], [hi, hi], [lo, hi],
                            [lo, lo]], dtype=np.float64)]
        # clip to [lo, hi) like the raster fill does (same spatial domain
        # on both methods)
        return pcl.boolean_rings([list(rings)], [window], op="inter")
    mask = un.rasterize_rings([np.asarray(r, dtype=np.float64) for r in rings],
                              grid, lo, hi)
    # trace_contours emits shells CW/holes CCW (image-space convention);
    # reverse to match the valid path's shells-CCW contract — the MVT
    # winding every other producer path (slice_polygon, ensure_orientation)
    # ships
    return [r[::-1] for r in un.trace_contours(mask, lo, hi)]


def point_on_surface(rings: list[np.ndarray]) -> tuple[float, float]:
    """Interior point (JTS InteriorPointArea analog — the backing of
    FeatureCollector.pointOnSurface:205): intersect the polygon with its
    horizontal bisector, take the midpoint of the WIDEST inside interval
    (even-odd crossing parity across all rings, so holes are honored)."""
    shell = rings[0]
    y = (float(shell[:, 1].min()) + float(shell[:, 1].max())) / 2.0
    xs = []
    for ring in rings:
        a = ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring
        x0, y0 = a[:, 0], a[:, 1]
        x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
        cross = ((y0 <= y) & (y1 > y)) | ((y1 <= y) & (y0 > y))
        if cross.any():
            t = (y - y0[cross]) / (y1[cross] - y0[cross])
            xs.append(x0[cross] + t * (x1[cross] - x0[cross]))
    if not xs:
        return ring_centroid(shell)
    X = np.sort(np.concatenate(xs))
    if len(X) < 2:
        return ring_centroid(shell)
    widths = X[1::2] - X[0::2]
    i = int(np.argmax(widths))
    return float((X[2 * i] + X[2 * i + 1]) / 2.0), y


# --- point in polygon (even-odd ray cast), vectorized over points --------------

def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd crossing test of many points against one closed ring."""
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    px = px[:, None]
    py = py[:, None]
    cond = (y0 > py) != (y1 > py)
    # x coordinate of edge at scanline py
    with np.errstate(divide="ignore", invalid="ignore"):
        xi = x0 + (py - y0) * (x1 - x0) / (y1 - y0)
    crossings = cond & (px < xi)
    return (crossings.sum(axis=1) % 2).astype(bool)


def points_in_polygon(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Even-odd over all rings: inside shell, outside holes."""
    inside = np.zeros(len(px), dtype=bool)
    for r in rings:
        inside ^= points_in_ring(px, py, r)
    return inside


def point_segment_dist_sq(px, py, x0, y0, x1, y1):
    """Vectorized squared distance from points to segments (broadcast-compatible).
    Same math as DouglasPeuckerSimplifier.getSqSegDist (DouglasPeuckerSimplifier.java:95)."""
    dx = x1 - x0
    dy = y1 - y0
    denom = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((px - x0) * dx + (py - y0) * dy) / denom
    t = np.where(denom > 0, np.clip(t, 0.0, 1.0), 0.0)
    cx = x0 + t * dx
    cy = y0 + t * dy
    return (px - cx) ** 2 + (py - cy) ** 2


def dist_to_boundary(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Unsigned distance from points to the polygon's ring boundary."""
    n = len(px)
    best = np.full(n, np.inf)
    for r in rings:
        x0, y0 = r[:-1, 0], r[:-1, 1]
        x1, y1 = r[1:, 0], r[1:, 1]
        d = point_segment_dist_sq(px[:, None], py[:, None], x0, y0, x1, y1).min(axis=1)
        best = np.minimum(best, d)
    return np.sqrt(best)


def dist_to_polygon(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Distance from points to polygon boundary (0 if inside).
    Mirrors PolygonIndex.getContainingOrNearest's JTS distance fallback (:93-124)."""
    best = dist_to_boundary(px, py, rings)
    best[points_in_polygon(px, py, rings)] = 0.0
    return best


# --- polygon grid index (replaces JTS STRtree, PolygonIndex.java:20-145) -------

@dataclass
class PolygonIndex:
    """Uniform-grid spatial index over polygons; built on the driver,
    broadcast to executors, probed with vectorized numpy inside pandas UDFs.

    Matches PolygonIndex.java semantics:
      - get_containing(points): all polygons whose interior contains each point
        (STRtree envelope candidates -> exact test, :52-60)
      - get_containing_or_nearest(points, within): containment first, else the
        nearest polygon within `within` distance (:93-124)

    Probe is cell-major, not polygon-major: at build time every polygon's
    edges are packed into one flat edge pool and a per-cell CSR slab maps
    each grid cell to (candidate poly ids, their pooled edge ids, per-poly
    segment starts). A batch probe sorts points by cell once, then walks the
    ~hundreds of OCCUPIED CELLS (not the tens of thousands of polygons),
    evaluating one (points-in-cell x packed-edges) crossing matrix per cell
    and reducing crossings to per-polygon parity with np.add.reduceat.
    Even-odd correctness: parity of TOTAL crossings across all of a
    polygon's rings equals the XOR of per-ring parities, so packing all
    rings into one segment is exact. Inputs per cell are contiguous
    (cell-sorted points, pooled-edge gathers), so the kernel is
    compute-dense rather than gather-bound — this is what lets the join
    scale with cores instead of hitting the shared-DRAM ceiling the
    polygon-major loop hit (BENCH/BASELINE.md round-2 analysis).
    """

    ids: list
    polys: list  # list of list-of-rings (float64 (N,2))
    bboxes: np.ndarray = field(init=False)  # (P,4) minx,miny,maxx,maxy
    cell: float = field(init=False)

    def __post_init__(self):
        bb = np.empty((len(self.polys), 4))
        for i, rings in enumerate(self.polys):
            shell = rings[0]
            bb[i] = (shell[:, 0].min(), shell[:, 1].min(), shell[:, 0].max(), shell[:, 1].max())
        self.bboxes = bb
        # cell ~ median bbox extent: ~1-4 covered cells per polygon
        spans = np.maximum(bb[:, 2] - bb[:, 0], bb[:, 3] - bb[:, 1])
        self.cell = float(max(np.median(spans), 1e-6)) if len(spans) else 1.0
        self._build_slabs()

    # -- build-time packing (driver-side, once; the whole object is broadcast) --

    def _build_slabs(self):
        """Flat edge pool + per-cell CSR slabs (tight for containment, padded
        by one full cell for the nearest-within fallback)."""
        ex0, ey0, ex1, ey1 = [], [], [], []
        estart = np.zeros(len(self.polys) + 1, dtype=np.int64)
        for i, rings in enumerate(self.polys):
            for r in rings:
                ex0.append(r[:-1, 0]); ey0.append(r[:-1, 1])
                ex1.append(r[1:, 0]); ey1.append(r[1:, 1])
            estart[i + 1] = estart[i] + sum(len(r) - 1 for r in rings)
        self._ex0 = np.concatenate(ex0) if ex0 else np.empty(0)
        self._ey0 = np.concatenate(ey0) if ey0 else np.empty(0)
        self._ex1 = np.concatenate(ex1) if ex1 else np.empty(0)
        self._ey1 = np.concatenate(ey1) if ey1 else np.empty(0)
        self._estart = estart
        self._cells_tight = self._bucket(pad=0.0)
        self._cells_pad = self._bucket(pad=self.cell)

    def _bucket(self, pad: float) -> dict:
        """cell_key -> (poly_ids asc, pooled edge_ids, per-poly seg starts).
        Fully vectorized build: (poly, cell) incidences via the offset-grid
        trick, pooled edge ids via one segmented arange, per-cell slabs as
        views into the shared arrays (no per-cell allocation)."""
        c = self.cell
        if not len(self.polys):
            return {}
        bb = self.bboxes
        cx0 = np.floor((bb[:, 0] - pad) / c).astype(np.int64)
        cx1 = np.floor((bb[:, 2] + pad) / c).astype(np.int64)
        cy0 = np.floor((bb[:, 1] - pad) / c).astype(np.int64)
        cy1 = np.floor((bb[:, 3] + pad) / c).astype(np.int64)
        ncx, ncy = cx1 - cx0 + 1, cy1 - cy0 + 1
        pidx_l, key_l = [], []
        for dx in range(int(ncx.max())):
            for dy in range(int(ncy.max())):
                m = (dx < ncx) & (dy < ncy)
                if not m.any():
                    continue
                pid = np.nonzero(m)[0].astype(np.int64)
                key = (cx0[pid] + dx) * np.int64(1 << 31) + (cy0[pid] + dy)
                pidx_l.append(pid)
                key_l.append(key)
        pidx = np.concatenate(pidx_l)
        keys = np.concatenate(key_l)
        o = np.lexsort((pidx, keys))  # cell-major, poly ids ascending per cell
        pidx, keys = pidx[o], keys[o]
        nedges = np.diff(self._estart)
        lens = nedges[pidx]
        ends = np.cumsum(lens)
        starts_out = ends - lens
        total = int(ends[-1]) if len(ends) else 0
        eids_all = (np.arange(total, dtype=np.int64)
                    - np.repeat(starts_out - self._estart[pidx], lens))
        run_keys, run_starts = np.unique(keys, return_index=True)
        run_bounds = np.append(run_starts, len(keys))
        out = {}
        for r, key in enumerate(run_keys):
            lo, hi = run_bounds[r], run_bounds[r + 1]
            elo = starts_out[lo]
            out[int(key)] = (pidx[lo:hi],
                             eids_all[elo:ends[hi - 1]],
                             starts_out[lo:hi] - elo)
        return out

    def _sorted_cells(self, px, py, pad: float = 0.0):
        """Sort point indices by cell key; return (order, keys_sorted)."""
        c = self.cell
        cx = np.floor(px / c).astype(np.int64)
        cy = np.floor(py / c).astype(np.int64)
        key = cx * np.int64(1 << 31) + cy
        order = np.argsort(key, kind="mergesort")
        return order, key[order]

    def _candidates(self, order, keys_sorted, minx, miny, maxx, maxy):
        """Point indices whose cell intersects the bbox's covered cell rect."""
        c = self.cell
        cx0, cx1 = int(np.floor(minx / c)), int(np.floor(maxx / c))
        cy0, cy1 = int(np.floor(miny / c)), int(np.floor(maxy / c))
        parts = []
        for cx in range(cx0, cx1 + 1):
            base = np.int64(cx) * np.int64(1 << 31)
            lo = np.searchsorted(keys_sorted, base + cy0, side="left")
            hi = np.searchsorted(keys_sorted, base + cy1, side="right")
            if hi > lo:
                parts.append(order[lo:hi])
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.concatenate(parts)

    def _cell_runs(self, px, py):
        """Cell-sort the points; return (order, run_keys, run_starts incl. end)."""
        order, keys_sorted = self._sorted_cells(px, py)
        if len(order) == 0:
            return order, np.empty(0, dtype=np.int64), np.zeros(1, dtype=np.int64)
        run_keys, run_starts = np.unique(keys_sorted, return_index=True)
        return order, run_keys, np.append(run_starts, len(order))

    # point-chunk size per cell: keeps the (chunk x edges) crossing matrix and
    # its temporaries L2-resident even for edge-dense cells
    _CHUNK = 256

    def get_containing(self, px: np.ndarray, py: np.ndarray):
        """Returns (point_idx, poly_idx) arrays for every containment pair."""
        order, run_keys, run_bounds = self._cell_runs(px, py)
        out_pt, out_poly = [], []
        cells = self._cells_tight
        for r, key in enumerate(run_keys):
            slab = cells.get(int(key))
            if slab is None:
                continue
            pids, eids, starts = slab
            pts = order[run_bounds[r]:run_bounds[r + 1]]
            x0, y0 = self._ex0[eids], self._ey0[eids]
            x1, y1 = self._ex1[eids], self._ey1[eids]
            for lo in range(0, len(pts), self._CHUNK):
                chunk = pts[lo:lo + self._CHUNK]
                cx = px[chunk][:, None]
                cy = py[chunk][:, None]
                cond = (y0 > cy) != (y1 > cy)
                with np.errstate(divide="ignore", invalid="ignore"):
                    xi = x0 + (cy - y0) * (x1 - x0) / (y1 - y0)
                crossings = (cond & (cx < xi)).view(np.uint8)
                parity = np.add.reduceat(crossings, starts, axis=1) & 1
                ppos, cpos = np.nonzero(parity.T)  # poly-major like the old loop
                if len(ppos):
                    out_pt.append(chunk[cpos])
                    out_poly.append(pids[ppos])
        if not out_pt:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        pt = np.concatenate(out_pt)
        poly = np.concatenate(out_poly)
        # deterministic output order: by (point, polygon)
        o = np.lexsort((poly, pt))
        return pt[o], poly[o]

    def get_containing_or_nearest(self, px: np.ndarray, py: np.ndarray, within: float):
        """Returns (point_idx, poly_idx, fallback_flag). Points contained by >=1
        polygon yield one row per containing polygon (fallback=False); points in
        no polygon yield their nearest polygon within `within` (fallback=True)."""
        pt, poly = self.get_containing(px, py)
        n = len(px)
        contained = np.zeros(n, dtype=bool)
        contained[pt] = True
        miss = np.nonzero(~contained)[0]
        if len(miss) == 0:
            return pt, poly, np.zeros(len(pt), dtype=bool)
        mx, my = px[miss], py[miss]
        best_d = np.full(len(miss), np.inf)
        best_i = np.full(len(miss), -1, dtype=np.int64)
        if within <= self.cell:
            # cell-major: the one-cell-padded slab is a superset of every
            # polygon within `within` of any point in the cell
            order, run_keys, run_bounds = self._cell_runs(mx, my)
            cells = self._cells_pad
            for r, key in enumerate(run_keys):
                slab = cells.get(int(key))
                if slab is None:
                    continue
                pids, eids, starts = slab
                pts = order[run_bounds[r]:run_bounds[r + 1]]
                x0, y0 = self._ex0[eids], self._ey0[eids]
                x1, y1 = self._ex1[eids], self._ey1[eids]
                for lo in range(0, len(pts), self._CHUNK):
                    chunk = pts[lo:lo + self._CHUNK]
                    d2 = point_segment_dist_sq(mx[chunk][:, None], my[chunk][:, None],
                                               x0, y0, x1, y1)
                    dpoly = np.sqrt(np.minimum.reduceat(d2, starts, axis=1))
                    # argmin keeps the FIRST (lowest poly id — pids ascending)
                    # on exact ties, matching the old sequential `d < best_d`
                    amin = np.argmin(dpoly, axis=1)
                    rows = np.arange(len(chunk))
                    best_d[chunk] = dpoly[rows, amin]
                    best_i[chunk] = pids[amin]
        else:
            # rare: fallback radius wider than the grid cell — polygon-major scan
            order, keys_sorted = self._sorted_cells(mx, my)
            for i, rings in enumerate(self.polys):
                minx, miny, maxx, maxy = self.bboxes[i]
                cand = self._candidates(order, keys_sorted,
                                        minx - within, miny - within,
                                        maxx + within, maxy + within)
                if len(cand) == 0:
                    continue
                cx, cy = mx[cand], my[cand]
                m = ((cx >= minx - within) & (cx <= maxx + within) &
                     (cy >= miny - within) & (cy <= maxy + within))
                cand = cand[m]
                if len(cand) == 0:
                    continue
                d = dist_to_polygon(mx[cand], my[cand], rings)
                upd = d < best_d[cand]
                best_d[cand] = np.where(upd, d, best_d[cand])
                best_i[cand] = np.where(upd, i, best_i[cand])
        ok = (best_i >= 0) & (best_d <= within)
        fb_pt = miss[ok]
        fb_poly = best_i[ok]
        return (np.concatenate([pt, fb_pt]),
                np.concatenate([poly, fb_poly]),
                np.concatenate([np.zeros(len(pt), dtype=bool), np.ones(len(fb_pt), dtype=bool)]))


# --- Douglas-Peucker simplification (DouglasPeuckerSimplifier.java:33-100) ------

def simplify_dp(coords: np.ndarray, tolerance: float, is_ring: bool = False) -> np.ndarray:
    """Iterative DP keeping points whose squared distance from the chord exceeds
    tolerance^2. Matches the reference's no-repair variant; rings keep >=4 points
    (DouglasPeuckerSimplifier.java:82-89 min-points guard)."""
    n = len(coords)
    if n <= 2 or tolerance < 0:
        return coords
    sq_tol = tolerance * tolerance
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    x, y = coords[:, 0], coords[:, 1]
    while stack:
        i0, i1 = stack.pop()
        if i1 - i0 < 2:
            continue
        seg = slice(i0 + 1, i1)
        d = point_segment_dist_sq(x[seg], y[seg], x[i0], y[i0], x[i1], y[i1])
        j = int(np.argmax(d))
        if d[j] > sq_tol:
            mid = i0 + 1 + j
            keep[mid] = True
            stack.append((i0, mid))
            stack.append((mid, i1))
    out = coords[keep]
    if is_ring and len(out) < 4:
        # keep enough points to stay a valid ring: fall back to the 4 extreme points
        idx = np.unique(np.clip(np.linspace(0, n - 1, 4).round().astype(int), 0, n - 1))
        out = coords[np.union1d(np.nonzero(keep)[0], idx)]
    return out


# --- rectangle clipping --------------------------------------------------------

_SMALL_RING = 64  # below this, scalar loops beat numpy's per-op overhead ~10x


def _clip_small(xs: list, ys: list, minx, miny, maxx, maxy):
    """4-pass Sutherland-Hodgman on Python float lists — same arithmetic as
    the vectorized path (bit-identical outputs), ~10x faster for tiny rings
    where numpy is pure overhead. Measured 17.5us vs 197.5us per 14-vertex
    clip; this runs per (boundary tile x feature x zoom) in the render
    stage, i.e. millions of times."""
    for axis, bound, keep_min in ((0, minx, True), (0, maxx, False),
                                  (1, miny, True), (1, maxy, False)):
        if not xs:
            return xs, ys
        vs = xs if axis == 0 else ys
        n = len(xs)
        nx: list = []
        ny: list = []
        for i in range(n):
            j = i + 1 if i + 1 < n else 0
            vi = vs[i]
            vj = vs[j]
            ins_i = vi >= bound if keep_min else vi <= bound
            ins_j = vj >= bound if keep_min else vj <= bound
            if ins_i:
                nx.append(xs[i])
                ny.append(ys[i])
            if ins_i != ins_j:
                t = (bound - vi) / (vj - vi)
                if axis == 0:
                    nx.append(bound)
                    ny.append(ys[i] + t * (ys[j] - ys[i]))
                else:
                    nx.append(xs[i] + t * (xs[j] - xs[i]))
                    ny.append(bound)
        xs, ys = nx, ny
    return xs, ys


def clip_polygon_rect(rings: list[np.ndarray], minx, miny, maxx, maxy) -> list[np.ndarray]:
    """Sutherland-Hodgman clip of each ring to an axis-aligned rect; linear edge
    interpolation identical to TiledGeometry.intersectX/intersectY (:220-231).
    Returns surviving rings (closed); degenerate rings dropped. Small rings
    take a scalar fast path; the arithmetic (and thus output) is identical."""
    out = []
    for ring in rings:
        closed = np.array_equal(ring[0], ring[-1])
        if len(ring) <= _SMALL_RING:
            poly = ring[:-1] if closed else ring
            xs, ys = _clip_small(poly[:, 0].tolist(), poly[:, 1].tolist(),
                                 minx, miny, maxx, maxy)
            if len(xs) >= 3:
                xs.append(xs[0])
                ys.append(ys[0])
                out.append(np.column_stack([xs, ys]))
            continue
        poly = ring[:-1] if closed else ring
        for axis, lo, is_min in ((0, minx, True), (0, maxx, False), (1, miny, True), (1, maxy, False)):
            if len(poly) == 0:
                break
            poly = _clip_half_plane(poly, axis, lo, is_min)
        if len(poly) >= 3:
            out.append(np.vstack([poly, poly[:1]]))
    return out


def _clip_half_plane(poly: np.ndarray, axis: int, bound: float, keep_min: bool) -> np.ndarray:
    """One Sutherland-Hodgman half-plane pass, fully vectorized: output =
    kept vertices interleaved with boundary intersections at their ring
    positions (no per-vertex Python — this runs millions of times per
    render stage)."""
    v = poly[:, axis]
    inside = (v >= bound) if keep_min else (v <= bound)
    if inside.all():
        return poly
    if not inside.any():
        return np.empty((0, 2))
    nxt_inside = np.concatenate((inside[1:], inside[:1]))
    cross = inside != nxt_inside
    counts = inside.astype(np.int64) + cross
    off = np.zeros(len(poly) + 1, dtype=np.int64)
    np.cumsum(counts, out=off[1:])
    out = np.empty((int(off[-1]), 2))
    out[off[:-1][inside]] = poly[inside]
    ci = np.nonzero(cross)[0]
    cj = (ci + 1) % len(poly)
    other = 1 - axis
    t = (bound - v[ci]) / (v[cj] - v[ci])
    dest = off[:-1][ci] + inside[ci]
    out[dest, axis] = bound
    out[dest, other] = poly[ci, other] + t * (poly[cj, other] - poly[ci, other])
    return out


def clip_line_rect(coords: np.ndarray, minx, miny, maxx, maxy) -> list[np.ndarray]:
    """Clip a polyline to a rect, returning the list of inside segments (possibly
    several pieces). Matches TiledGeometry sliceX/sliceY piecewise behavior."""
    pieces = []
    cur = []
    for i in range(len(coords) - 1):
        p0, p1 = coords[i], coords[i + 1]
        seg = _clip_segment(p0, p1, minx, miny, maxx, maxy)
        if seg is None:
            if len(cur) >= 2:
                pieces.append(np.asarray(cur))
            cur = []
            continue
        a, b = seg
        if not cur:
            cur = [a]
        elif not np.allclose(cur[-1], a):
            if len(cur) >= 2:
                pieces.append(np.asarray(cur))
            cur = [a]
        cur.append(b)
    if len(cur) >= 2:
        pieces.append(np.asarray(cur))
    return pieces


def _clip_segment(p0, p1, minx, miny, maxx, maxy):
    """Liang-Barsky segment/rect clip; returns (a, b) or None."""
    x0, y0 = p0
    x1, y1 = p1
    dx, dy = x1 - x0, y1 - y0
    t0, t1 = 0.0, 1.0
    for p, q in ((-dx, x0 - minx), (dx, maxx - x0), (-dy, y0 - miny), (dy, maxy - y0)):
        if p == 0:
            if q < 0:
                return None
            continue
        r = q / p
        if p < 0:
            if r > t1:
                return None
            t0 = max(t0, r)
        else:
            if r < t0:
                return None
            t1 = min(t1, r)
    a = np.array([x0 + t0 * dx, y0 + t0 * dy])
    b = np.array([x0 + t1 * dx, y0 + t1 * dy])
    return a, b
