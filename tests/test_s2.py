"""S2 cell-id kernel invariants (kernels/s2.py). The s2geometry library is
not in this container, so the construction is pinned structurally: canonical
face-cell tokens, round-trip inversion, parent hierarchy, Hilbert-curve
adjacency, and exact partition of the face grid."""

import numpy as np
import pytest

from planetiler_spark.kernels import s2


def test_face_cell_tokens():
    # level-0 cells are the six cube faces; their canonical tokens are
    # 1,3,5,7,9,b (id = face<<61 | 1<<60)
    lons = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    lats = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    ids = s2.cell_id(lons, lats, 0)
    assert s2.token(ids) == ["1", "3", "5", "7", "9", "b"]


def test_level_and_trailing_bit():
    rng = np.random.default_rng(0)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-89, 89, 500)
    for lv in (0, 1, 5, 12, 30):
        ids = s2.cell_id(lon, lat, lv)
        assert np.all(s2.cell_level(ids) == lv)
        # valid id: exactly one trailing bit at the level position
        lsb = ids & (~ids + np.uint64(1))
        assert np.all(lsb == np.uint64(1 << (2 * (30 - lv))))


def test_center_roundtrip():
    """cell_center -> cell_id must return the SAME cell at every level."""
    rng = np.random.default_rng(1)
    lon = rng.uniform(-180, 180, 300)
    lat = rng.uniform(-89, 89, 300)
    for lv in (2, 8, 16, 24):
        ids = s2.cell_id(lon, lat, lv)
        clon, clat = s2.cell_center(ids)
        again = s2.cell_id(clon, clat, lv)
        assert np.array_equal(ids, again)


def test_parent_hierarchy():
    rng = np.random.default_rng(2)
    lon = rng.uniform(-180, 180, 300)
    lat = rng.uniform(-89, 89, 300)
    fine = s2.cell_id(lon, lat, 20)
    for lv in (15, 10, 4, 0):
        coarse = s2.cell_id(lon, lat, lv)
        assert np.array_equal(s2.parent(fine, lv), coarse)


def test_hilbert_curve_adjacency():
    """Consecutive curve positions within a face are edge-adjacent in (i,j):
    the defining property of the Hilbert traversal (catches any wrong table
    entry immediately)."""
    level = 6
    for face in range(6):
        pos = np.arange(4 ** level, dtype=np.int64)
        i, j = s2.pos_to_face_ij(np.full_like(pos, face), pos, level)
        shift = 30 - level
        i, j = i >> shift, j >> shift
        di = np.abs(np.diff(i))
        dj = np.abs(np.diff(j))
        assert np.all(di + dj == 1), f"face {face}: curve not continuous"
        # and the traversal visits every cell of the face grid exactly once
        assert len(np.unique(i * (1 << level) + j)) == 4 ** level


def test_ij_pos_inverse():
    rng = np.random.default_rng(3)
    face = rng.integers(0, 6, 1000)
    i = rng.integers(0, 1 << 30, 1000)
    j = rng.integers(0, 1 << 30, 1000)
    pos = s2.face_ij_to_pos(face, i, j, 30)
    i2, j2 = s2.pos_to_face_ij(face, pos, 30)
    assert np.array_equal(i, i2) and np.array_equal(j, j2)


def test_uv_st_inverse():
    u = np.linspace(-1, 1, 1001)
    assert np.allclose(s2.st_to_uv(s2.uv_to_st(u)), u, atol=1e-14)


def test_spark_column_function(spark):
    from pyspark.sql import functions as F

    from planetiler_spark.functions.geo import s2_cell_of

    df = spark.createDataFrame(
        [(0.0, 0.0), (2.35, 48.85), (139.69, 35.69)], "lon double, lat double")
    rows = (df.withColumn("cell", s2_cell_of("lon", "lat", F.lit(12)))
            .collect())
    got = np.array([r.cell for r in rows]).astype(np.uint64)
    want = s2.cell_id(np.array([0.0, 2.35, 139.69]),
                      np.array([0.0, 48.85, 35.69]), 12)
    assert np.array_equal(got, want)
