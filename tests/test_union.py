"""Raster polygon union tests (FeatureMerge.mergeOverlappingPolygons /
mergeNearbyPolygons semantics at tile raster precision)."""

import numpy as np
import pytest

from planetiler_spark.kernels import geom as gk
from planetiler_spark.kernels import union as un

G = 256  # test grid (tile extent still 0..4096)
PX = 4096 / G  # extent units per pixel


def sq(x0, y0, s):
    return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]], dtype=float)


def area_of(rings):
    """Traced rings carry orientation (inside-on-left, y-down): outer rings
    have negative shoelace area, holes positive — total = -sum(signed)."""
    return -sum(gk.ring_signed_area(r) for r in rings)


def test_rasterize_single_square():
    mask = un.rasterize_rings([sq(1024, 1024, 2048)], grid=G)
    frac = mask.mean()
    assert abs(frac - 0.25) < 0.01  # 2048^2 / 4096^2


def test_union_overlapping_squares():
    out = un.union_polygons([[sq(1000, 1000, 1200)], [sq(1800, 1000, 1200)]], grid=G)
    assert len(out) == 1  # merged into one region
    a = abs(gk.ring_signed_area(out[0]))
    want = 1200 * 1200 * 2 - 400 * 1200  # overlap 400 wide
    assert a == pytest.approx(want, rel=0.05)


def test_union_disjoint_stays_separate():
    out = un.union_polygons([[sq(200, 200, 600)], [sq(3000, 3000, 600)]], grid=G)
    assert len(out) == 2
    total = sum(abs(gk.ring_signed_area(r)) for r in out)
    assert total == pytest.approx(2 * 600 * 600, rel=0.05)


def test_union_preserves_hole():
    donut = [sq(500, 500, 3000), sq(1500, 1500, 1000)]  # shell + hole
    out = un.union_polygons([donut], grid=G)
    assert len(out) == 2  # boundary + hole boundary
    want = 3000 * 3000 - 1000 * 1000
    assert area_of(out) == pytest.approx(want, rel=0.05)


def test_nearby_merge_bridges_gap():
    # 100-extent-unit gap (< min_dist) bridges; without min_dist it stays split
    a, b = [sq(1000, 1000, 800)], [sq(1900, 1000, 800)]
    split = un.union_polygons([a, b], grid=G)
    assert len(split) == 2
    merged = un.union_polygons([a, b], grid=G, min_dist_px=200)
    assert len(merged) == 1


def test_min_area_drops_specks():
    out = un.union_polygons([[sq(1000, 1000, 2000)], [sq(3500, 3500, 40)]],
                            grid=G, min_area=100 * 100)
    assert len(out) == 1  # 40x40 speck dropped


def test_traced_rings_closed_and_on_grid():
    out = un.union_polygons([[sq(1000, 1000, 1000)]], grid=G)
    for r in out:
        assert np.array_equal(r[0], r[-1])
        # vertices on the pixel lattice
        assert np.allclose(r % PX, 0)
