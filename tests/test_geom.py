"""Geometry kernel tests — semantics mirror the reference's JTS-based operators
(PolygonIndexTest, DouglasPeuckerSimplifierTest, TiledGeometryTest patterns)."""

import numpy as np
import pytest

from planetiler_spark.kernels import geom as g


def square(cx=0.0, cy=0.0, r=1.0):
    return np.array([[cx - r, cy - r], [cx + r, cy - r], [cx + r, cy + r], [cx - r, cy + r], [cx - r, cy - r]])


# --- WKB round trip ---

def test_wkb_point_roundtrip():
    typ, (x, y) = g.parse_wkb(g.wkb_point(1.5, -2.25))
    assert typ == "point" and (x, y) == (1.5, -2.25)


def test_wkb_linestring_roundtrip():
    coords = np.array([[0.0, 0.0], [1.0, 2.0], [3.0, -4.0]])
    typ, arr = g.parse_wkb(g.wkb_linestring(coords))
    assert typ == "linestring"
    np.testing.assert_array_equal(arr, coords)


def test_wkb_polygon_roundtrip():
    shell = square(r=2.0)
    hole = square(r=0.5)
    typ, rings = g.parse_wkb(g.wkb_polygon([shell, hole]))
    assert typ == "polygon" and len(rings) == 2
    np.testing.assert_array_equal(rings[0], shell)
    np.testing.assert_array_equal(rings[1], hole)


def test_wkb_multipolygon_roundtrip():
    p1 = [square(0, 0, 1)]
    p2 = [square(5, 5, 2), square(5, 5, 0.5)]
    typ, polys = g.parse_wkb(g.wkb_multipolygon([p1, p2]))
    assert typ == "multipolygon" and len(polys) == 2
    assert len(polys[1]) == 2
    np.testing.assert_array_equal(polys[1][1], square(5, 5, 0.5))


# --- PIP ---

def test_points_in_polygon_with_hole():
    rings = [square(r=2.0), square(r=0.5)]
    px = np.array([0.0, 1.0, 3.0, 0.4])
    py = np.array([0.0, 1.0, 0.0, 0.0])
    # center is inside the hole -> outside; (1,1) inside; (3,0) outside; (0.4,0) in hole -> out
    np.testing.assert_array_equal(g.points_in_polygon(px, py, rings), [False, True, False, False])


def test_polygon_index_containing_overlap():
    # two overlapping squares — points in the overlap match both (PolygonIndex.getContaining :52)
    idx = g.PolygonIndex(ids=["a", "b"], polys=[[square(0, 0, 1)], [square(1, 0, 1)]])
    pt, poly = idx.get_containing(np.array([0.5, -0.5, 1.5, 5.0]), np.array([0.0, 0.0, 0.0, 0.0]))
    pairs = sorted(zip(pt.tolist(), poly.tolist()))
    assert pairs == [(0, 0), (0, 1), (1, 0), (2, 1)]


def test_polygon_index_nearest_fallback():
    # PolygonIndex.getContainingOrNearest :93-124 — miss falls back to nearest within range
    idx = g.PolygonIndex(ids=["a"], polys=[[square(0, 0, 1)]])
    pt, poly, fb = idx.get_containing_or_nearest(np.array([0.0, 1.5, 9.0]), np.array([0.0, 0.0, 0.0]), within=1.0)
    rows = sorted(zip(pt.tolist(), poly.tolist(), fb.tolist()))
    assert rows == [(0, 0, False), (1, 0, True)]  # 9.0 beyond `within` -> dropped


def test_dist_to_polygon():
    d = g.dist_to_polygon(np.array([0.0, 2.0, 0.0]), np.array([0.0, 0.0, 3.0]), [square(r=1.0)])
    np.testing.assert_allclose(d, [0.0, 1.0, 2.0])


# --- DP simplify ---

def test_simplify_dp_collinear():
    line = np.array([[0.0, 0], [1, 0.001], [2, 0], [3, -0.001], [4, 0]])
    out = g.simplify_dp(line, 0.01)
    np.testing.assert_array_equal(out, [[0, 0], [4, 0]])


def test_simplify_dp_keeps_spike():
    line = np.array([[0.0, 0], [1, 0], [2, 5], [3, 0], [4, 0]])
    out = g.simplify_dp(line, 0.5)
    assert any((out == [2, 5]).all(axis=1))


def test_simplify_ring_min_points():
    ring = square(r=1.0)
    out = g.simplify_dp(ring, 100.0, is_ring=True)  # huge tolerance would collapse it
    assert len(out) >= 4  # DouglasPeuckerSimplifier.java:82-89 guard


# --- orientation / area / centroid ---

def test_ring_area_and_orientation():
    ccw = square(r=1.0)  # this winding is CCW in y-up
    assert g.ring_signed_area(ccw) == pytest.approx(4.0)
    cw = ccw[::-1]
    assert g.ring_signed_area(cw) == pytest.approx(-4.0)
    assert g.ring_signed_area(g.ensure_orientation(cw, ccw=True)) > 0


def test_ring_centroid():
    cx, cy = g.ring_centroid(square(3, -2, 1))
    assert (cx, cy) == (pytest.approx(3.0), pytest.approx(-2.0))


# --- clipping ---

def test_clip_polygon_rect_partial():
    rings = g.clip_polygon_rect([square(0, 0, 2)], 0, 0, 10, 10)
    assert len(rings) == 1
    r = rings[0]
    assert r[:, 0].min() == 0 and r[:, 1].min() == 0
    assert r[:, 0].max() == 2 and r[:, 1].max() == 2
    # area of the surviving quadrant
    assert abs(g.ring_signed_area(r)) == pytest.approx(4.0)


def test_clip_polygon_rect_outside():
    assert g.clip_polygon_rect([square(10, 10, 1)], 0, 0, 5, 5) == []


def test_clip_polygon_rect_covering():
    # rect entirely inside the polygon -> full rect survives
    rings = g.clip_polygon_rect([square(0, 0, 100)], -1, -1, 1, 1)
    assert len(rings) == 1
    assert abs(g.ring_signed_area(rings[0])) == pytest.approx(4.0)


def test_clip_line_pieces():
    # zigzag crossing the box twice -> two pieces (TiledGeometry slice behavior)
    line = np.array([[-2.0, 0.5], [2.0, 0.5], [2.0, 3.0], [-2.0, 3.0], [-2.0, 0.8], [2.0, 0.8]])
    pieces = g.clip_line_rect(line, 0, 0, 1, 1)
    assert len(pieces) == 2
    for p in pieces:
        assert (p[:, 0] >= 0).all() and (p[:, 0] <= 1).all()


def test_clip_line_fully_inside():
    line = np.array([[0.1, 0.1], [0.9, 0.9]])
    pieces = g.clip_line_rect(line, 0, 0, 1, 1)
    assert len(pieces) == 1
    np.testing.assert_allclose(pieces[0], line)


# --- misc scalar geometry (GeoUtils.java isConvex/pointAlongOffset/innermost) ---

def test_is_convex():
    sq = square(0, 0, 2)
    assert g.is_convex(sq)
    concave = np.array([[0, 0], [4, 0], [2, 1], [4, 4], [0, 4], [0, 0]], dtype=float)
    assert not g.is_convex(concave)
    assert g.is_convex(sq[::-1])  # orientation-agnostic


def test_point_along_offset():
    p = g.point_along_offset(np.array([0.0, 0.0]), np.array([10.0, 0.0]), 0.5, 2.0)
    np.testing.assert_allclose(p, [5.0, 2.0])
    p = g.point_along_offset(np.array([0.0, 0.0]), np.array([0.0, 10.0]), 0.25, 1.0)
    np.testing.assert_allclose(p, [-1.0, 2.5])


def test_innermost_point_centered_square():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)
    x, y = g.innermost_point([sq])
    assert abs(x - 5) < 0.2 and abs(y - 5) < 0.2


def test_innermost_point_with_hole():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], dtype=float)
    x, y = g.innermost_point([sq, hole])
    assert not (4 < x < 6 and 4 < y < 6)  # not inside the hole
    assert g.points_in_polygon(np.array([x]), np.array([y]), [sq, hole])[0]


def test_polygon_to_linestring():
    sq = square(0, 0, 1)
    lines = g.polygon_to_linestring([sq, sq * 0.5])
    assert len(lines) == 2
    np.testing.assert_allclose(lines[0], sq)


# --- polygon validity / repair chain (GeoUtils.snapAndFixPolygon:315-399) ----

def test_self_intersection_detection():
    import numpy as np
    from planetiler_spark.kernels import geom as gk
    bowtie = np.array([[0, 0], [4, 0], [0, 4], [4, 4], [0, 0]], dtype=float)
    square = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
    hole = np.array([[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]], dtype=float)
    assert gk.polygon_self_intersects([bowtie])
    assert not gk.polygon_self_intersects([square])
    assert not gk.polygon_self_intersects([square, hole])
    # hole crossing the shell boundary: cross-ring intersection detected
    esc = np.array([[3, 3], [6, 3], [6, 5], [3, 5], [3, 3]], dtype=float)
    assert gk.polygon_self_intersects([square, esc])


def test_repair_bowtie():
    import numpy as np
    from planetiler_spark.kernels import geom as gk
    bowtie = np.array([[0, 0], [4, 0], [0, 4], [4, 4], [0, 0]], dtype=float)
    fixed = gk.repair_polygon([bowtie], 0.0, 4.0, grid=256)
    assert fixed, "repair produced no rings"
    assert not gk.polygon_self_intersects(fixed)
    # even-odd bowtie = two triangles of area 4 each (raster tolerance 5%)
    area = sum(abs(gk.ring_signed_area(r)) for r in fixed)
    assert abs(area - 8.0) < 0.4, area


def test_repair_valid_passthrough():
    import numpy as np
    from planetiler_spark.kernels import geom as gk
    square = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
    hole = np.array([[1, 1], [1, 3], [3, 3], [3, 1], [1, 1]], dtype=float)
    out = gk.repair_polygon([square, hole], 0.0, 4.0)
    assert len(out) == 2
    # orientation normalized: shell CCW (positive signed area), hole CW
    assert gk.ring_signed_area(out[0]) > 0
    assert gk.ring_signed_area(out[1]) < 0
    # vertex sets preserved (no resampling on the valid path)
    assert {tuple(p) for p in out[0]} == {tuple(p) for p in square}


def test_line_centroid_length_weighted():
    # one long + one short segment: the vertex mean would sit at x=4/3,
    # the length-weighted centroid at x=(10*5 + 1*10.5)/11
    line = np.array([[0.0, 0.0], [10.0, 0.0], [11.0, 0.0]])
    cx, cy = g.line_centroid(line)
    assert abs(cx - (10 * 5 + 1 * 10.5) / 11) < 1e-12 and cy == 0.0


def test_polygon_centroid_honors_holes():
    shell = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
    hole = np.array([[2, 1], [3, 1], [3, 3], [2, 3], [2, 1]], dtype=float)
    cx, cy = g.polygon_centroid([shell, hole])
    # mass 16 at (2,2) minus mass 2 at (2.5,2): cx = (32 - 5)/14
    assert abs(cx - 27 / 14) < 1e-12 and abs(cy - 2.0) < 1e-12
    # shell-only unchanged
    cx0, cy0 = g.polygon_centroid([shell])
    assert (cx0, cy0) == (2.0, 2.0)


def test_repair_bowtie_exact():
    """method="exact" = the literal JTS buffer(0) even-odd regularization:
    the bowtie splits into two triangles meeting at the exact crossing
    (2,2), total area exactly 8, shells CCW like the valid path."""
    import numpy as np
    from planetiler_spark.kernels import geom as gk
    bowtie = np.array([[0, 0], [4, 0], [0, 4], [4, 4], [0, 0]], dtype=float)
    fixed = gk.repair_polygon([bowtie], 0.0, 4.0, method="exact")
    assert not gk.polygon_self_intersects(fixed)
    assert sum(gk.ring_signed_area(r) for r in fixed) == 8.0
    assert all(gk.ring_signed_area(r) > 0 for r in fixed)
    pts = {tuple(p) for r in fixed for p in r}
    assert (2.0, 2.0) in pts  # the exact self-intersection vertex
