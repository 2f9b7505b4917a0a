"""Line/ring kernel tests — VWSimplifier, MidpointSmoother, LineSplitter,
LoopLineMerger, OsmMultipolygon semantics (reference test models:
LoopLineMergerTest.java 547 LoC, OsmMultipolygonTest.java 432 LoC)."""

import numpy as np
import pytest

from planetiler_spark.kernels import geom as gk
from planetiler_spark.kernels import lines as lk


# --- VW simplify -------------------------------------------------------------

def test_vw_removes_collinear_and_tiny():
    line = np.array([[0, 0], [1, 0.001], [2, 0], [3, 2], [4, 0]], dtype=float)
    out = lk.vw_simplify(line, tolerance=0.1)
    # tiny bump at x=1 gone, big spike at x=3 kept
    assert [0, 2, 3, 4] == sorted(set(out[:, 0].astype(int).tolist()))


def test_vw_keeps_endpoints_and_min_ring():
    ring = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)
    out = lk.vw_simplify(ring, tolerance=10.0, is_ring=True)
    assert len(out) >= 4  # min-4-point ring guard (like DP's :82-89)
    line = np.array([[0, 0], [5, 0.01], [10, 0]])
    out = lk.vw_simplify(line, tolerance=1.0)
    assert np.array_equal(out[[0, -1]], line[[0, -1]])


def test_vw_weight_preserves_spikes():
    # near-reversal spike at x~1.05: triangle area 0.1; weighted effective
    # area ~0.19 (cos ~ -1 doubles it). tol^2 = 0.144 sits between the two.
    spike = np.array([[0, 0], [1, 0], [1.05, 2], [1.1, 0], [2, 0]], dtype=float)
    tol = 0.38
    base = lk.vw_simplify(spike, tol)
    weighted = lk.vw_simplify(spike, tol, weight=0.9)
    assert not any(p[1] == 2 for p in base)      # spike dropped unweighted
    assert any(p[1] == 2 for p in weighted)      # spike survives weighted


# --- midpoint smoothing ------------------------------------------------------

def test_midpoint_smooth_open():
    line = np.array([[0, 0], [1, 1], [2, 0]], dtype=float)
    out = lk.midpoint_smooth(line)
    np.testing.assert_allclose(out, [[0, 0], [0.5, 0.5], [1.5, 0.5], [2, 0]])


def test_midpoint_smooth_ring_stays_closed():
    ring = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], dtype=float)
    out = lk.midpoint_smooth(ring, is_ring=True)
    np.testing.assert_allclose(out[0], out[-1])
    assert abs(gk.ring_signed_area(out)) < abs(gk.ring_signed_area(ring))


# --- substring ---------------------------------------------------------------

def test_line_substring_halves():
    line = np.array([[0, 0], [10, 0]], dtype=float)
    np.testing.assert_allclose(lk.line_substring(line, 0.25, 0.75), [[2.5, 0], [7.5, 0]])


def test_line_substring_multi_segment():
    line = np.array([[0, 0], [1, 0], [2, 0], [3, 0]], dtype=float)
    out = lk.line_substring(line, 1 / 6, 5 / 6)
    np.testing.assert_allclose(out, [[0.5, 0], [1, 0], [2, 0], [2.5, 0]])
    assert gk.line_length(out) == pytest.approx(2.0)


# --- stroke merge ------------------------------------------------------------

def test_merge_two_touching_lines():
    a = np.array([[0, 0], [1, 0]], dtype=float)
    b = np.array([[1, 0], [2, 0]], dtype=float)
    out = lk.merge_line_strings([a, b])
    assert len(out) == 1
    np.testing.assert_allclose(out[0], [[0, 0], [1, 0], [2, 0]])


def test_merge_reversed_and_chained():
    a = np.array([[0, 0], [1, 0]], dtype=float)
    b = np.array([[2, 0], [1, 0]], dtype=float)  # reversed
    c = np.array([[2, 0], [3, 1]], dtype=float)
    out = lk.merge_line_strings([a, b, c])
    assert len(out) == 1
    assert len(out[0]) == 4


def test_merge_stops_at_junction():
    # T junction: 3 edges meet at (1,0) -> no chain through it
    a = np.array([[0, 0], [1, 0]], dtype=float)
    b = np.array([[1, 0], [2, 0]], dtype=float)
    c = np.array([[1, 0], [1, 1]], dtype=float)
    out = lk.merge_line_strings([a, b, c])
    assert len(out) == 3


def test_merge_removes_stubs_then_merges():
    a = np.array([[0, 0], [5, 0]], dtype=float)
    b = np.array([[5, 0], [10, 0]], dtype=float)
    stub = np.array([[5, 0], [5, 0.1]], dtype=float)  # short dangler at junction
    out = lk.merge_line_strings([a, b, stub], stub_min_length=0.5)
    assert len(out) == 1
    assert gk.line_length(out[0]) == pytest.approx(10.0)


def test_merge_min_length_filter_and_order():
    a = np.array([[0, 0], [0.1, 0]], dtype=float)  # isolated, too short
    b = np.array([[5, 5], [9, 5]], dtype=float)
    out = lk.merge_line_strings([a, b], min_length=1.0)
    assert len(out) == 1
    np.testing.assert_allclose(out[0], b)


# --- multipolygon assembly ---------------------------------------------------

def _square(x0, y0, s):
    return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]], dtype=float)


def test_assemble_closed_ring_from_pieces():
    sq = _square(0, 0, 4)
    pieces = [sq[0:3], sq[2:5]]  # two open ways forming the square
    polys = lk.assemble_multipolygon(pieces)
    assert len(polys) == 1
    assert abs(gk.ring_signed_area(polys[0][0])) == pytest.approx(16.0)


def test_assemble_outer_with_hole():
    outer = _square(0, 0, 10)
    hole = _square(4, 4, 2)
    polys = lk.assemble_multipolygon([outer, hole])
    assert len(polys) == 1
    assert len(polys[0]) == 2  # shell + hole
    assert abs(gk.ring_signed_area(polys[0][0])) > abs(gk.ring_signed_area(polys[0][1]))


def test_assemble_island_in_hole():
    outer = _square(0, 0, 10)
    hole = _square(2, 2, 6)
    island = _square(4, 4, 1)
    polys = lk.assemble_multipolygon([outer, hole, island])
    # island (depth 2) is its own polygon (imposm3 nesting rule)
    assert len(polys) == 2
    assert len(polys[0]) == 2
    assert len(polys[1]) == 1


def test_assemble_two_disjoint_outers():
    polys = lk.assemble_multipolygon([_square(0, 0, 2), _square(10, 10, 3)])
    assert len(polys) == 2


def test_assemble_reversed_pieces():
    sq = _square(0, 0, 4)
    pieces = [sq[0:3][::-1], sq[2:5]]  # first piece reversed
    polys = lk.assemble_multipolygon(pieces)
    assert len(polys) == 1


# --- multipolygon member ordering (FeatureMerge.mergeGeometries:141-162) ------

def test_merge_multipolygon_hilbert_order_deterministic():
    from planetiler_spark.operators import merge as mg
    a = [_square(100, 100, 50)]
    b = [_square(3000, 3000, 50)]
    c = [_square(100, 3000, 50)]
    out1 = mg.merge_multipolygon([a, b, c])
    out2 = mg.merge_multipolygon([c, a, b])  # different input order
    for p1, p2 in zip(out1, out2):
        np.testing.assert_allclose(p1[0], p2[0])
    assert len(out1) == 3
