"""Render-stage slicing tests — semantics from TiledGeometry.java
(slicePoint:245-260 buffer duplication, sliceWorldCopy:332 antimeridian wrap,
FeatureRenderer.emitFilledTiles:290-315 interior fill)."""

import numpy as np

from planetiler_spark.kernels import mvt
from planetiler_spark.operators import render as R


def test_point_center_single_tile():
    idx, tx, ty, ex, ey = R.slice_points(np.array([0.5 + 1 / 8]), np.array([0.5 + 1 / 8]), 2)
    assert len(idx) == 1
    assert (tx[0], ty[0]) == (2, 2)
    assert (ex[0], ey[0]) == (2048, 2048)


def test_point_near_edge_duplicates_into_neighbor():
    # just inside tile (1,1) of z1, within 4px buffer of the left edge
    wx = np.array([0.5 + 0.001])
    wy = np.array([0.75])
    idx, tx, ty, ex, ey = R.slice_points(wx, wy, 1)
    pairs = set(zip(tx.tolist(), ty.tolist()))
    assert (1, 1) in pairs and (0, 1) in pairs  # duplicated left
    # neighbor copy sits past the right edge of tile (0,1) in its local frame
    i = list(zip(tx.tolist(), ty.tolist())).index((0, 1))
    assert ex[i] > mvt.EXTENT


def test_point_corner_four_tiles():
    eps = 1e-4
    idx, tx, ty, ex, ey = R.slice_points(np.array([0.5 + eps]), np.array([0.5 + eps]), 1)
    assert len(idx) == 4  # corner -> 4 tiles


def test_antimeridian_wrap():
    # near wx=0 at z2 -> left neighbor wraps to x=3
    idx, tx, ty, ex, ey = R.slice_points(np.array([0.0001]), np.array([0.6]), 2)
    pairs = dict(zip(zip(tx.tolist(), ty.tolist()), ex.tolist()))
    assert (0, 2) in pairs and (3, 2) in pairs
    assert pairs[(3, 2)] > mvt.EXTENT  # local frame of the wrapped tile


def test_y_clamp_no_offmap_tiles():
    idx, tx, ty, ex, ey = R.slice_points(np.array([0.5]), np.array([0.00001]), 3)
    assert (ty >= 0).all()


def test_slice_polygon_fill_and_edges():
    # big square covering z3 tiles [2..5]^2 entirely, in world coords
    ring = np.array([[0.25, 0.25], [0.75, 0.25], [0.75, 0.75], [0.25, 0.75], [0.25, 0.25]])
    out = list(R.slice_polygon([ring], 3))
    kinds = {(tx, ty): kind for tx, ty, kind, _ in out}
    # interior tile fully covered -> fill, boundary tile -> clip
    assert kinds[(3, 3)] == "fill"
    assert kinds[(2, 2)] == "clip"
    # clip parts are integer extent coords within tile+buffer
    for tx, ty, kind, parts in out:
        if kind == "clip":
            for p in parts:
                assert p.dtype == np.int64
                assert np.array_equal(p[0], p[-1])  # closed


def test_slice_polygon_covered_count():
    ring = np.array([[0.25, 0.25], [0.75, 0.25], [0.75, 0.75], [0.25, 0.75], [0.25, 0.25]])
    out = list(R.slice_polygon([ring], 3))
    # 4x4 core tiles + 1-tile buffer ring where the buffered clip is nonempty
    tiles = {(tx, ty) for tx, ty, _, _ in out}
    assert {(x, y) for x in range(2, 6) for y in range(2, 6)} <= tiles


def test_slice_line_pieces_and_min_size():
    line = np.array([[0.2, 0.5], [0.8, 0.5]])
    out = list(R.slice_line(line, 3))
    tiles = {(tx, ty) for tx, ty, _ in out}
    assert tiles >= {(x, 4) for x in range(2, 6)}
    # below min pixel size at z0 -> nothing (FeatureRenderer.java:71-95 prefilter)
    tiny = np.array([[0.5, 0.5], [0.5 + 1e-5, 0.5]])
    assert list(R.slice_line(tiny, 0)) == []


def test_simplify_applied_per_zoom():
    # noisy line collapses to 2 points at low zoom after DP
    t = np.linspace(0, 1, 101)
    line = np.stack([0.25 + 0.5 * t, 0.5 + 1e-7 * np.sin(t * 50)], axis=1)
    out = list(R.slice_line(line, 1))
    for _, _, parts in out:
        for p in parts:
            assert len(p) == 2
