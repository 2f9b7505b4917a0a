"""Hex cell kernel (kernels/hex.py — planar aperture-7 H3 analog) and the
knn_hex ring-expansion join (plans/queries.knn_hex)."""

import numpy as np
import pytest

from planetiler_spark.kernels import hex as H

SF = "/root/testdata/sf0.01"

rng = np.random.default_rng(42)
WX = rng.uniform(0.02, 0.98, 5000)
WY = rng.uniform(0.02, 0.98, 5000)


def test_roundtrip_center_same_cell_every_res():
    for res in (0, 1, 3, 7, 12, 19):
        k = H.hex_cell(WX, WY, res)
        cx, cy = H.cell_center(k)
        assert np.array_equal(H.hex_cell(cx, cy, res), k)


def test_point_within_circumradius_of_center():
    for res in (3, 8, 15):
        k = H.hex_cell(WX, WY, res)
        cx, cy = H.cell_center(k)
        d = np.hypot(WX - cx, WY - cy)
        assert (d <= float(H.res_radius(res)) + 1e-12).all()


def test_pack_unpack_roundtrip_and_res_bounds():
    q = np.array([-5, 0, 123456, -(1 << 26)])
    r = np.array([7, -1, -99999, (1 << 26)])
    res = np.array([0, 3, 12, 19])
    qq, rr, ss = H.unpack(H.pack(q, r, res))
    assert np.array_equal(q, qq) and np.array_equal(r, rr) and np.array_equal(res, ss)
    with pytest.raises(ValueError):
        H.hex_cell(WX[:4], WY[:4], 20)
    with pytest.raises(ValueError):
        H.pack(np.array([1 << 27]), np.array([0]), np.array([1]))


def test_disk_and_ring_sizes():
    for k in (1, 2, 5, 8):
        assert len(H.disk_offsets(k)) == 3 * k * (k + 1) + 1
        assert len(H.ring_offsets(k)) == 6 * k
    # disk(k) = union of rings 0..k, disjoint
    d = {tuple(x) for x in H.disk_offsets(3)}
    rings = [{(0, 0)}] + [{tuple(x) for x in H.ring_offsets(i)} for i in (1, 2, 3)]
    assert d == set().union(*rings)
    assert sum(len(s) for s in rings) == len(d)


def test_neighbors_are_at_sqrt3_R():
    res = 5
    keys = H.hex_cell(WX[:200], WY[:200], res)
    nb = H.neighbors(keys)
    assert nb.shape == (200, 6)
    cx, cy = H.cell_center(keys)
    nx, ny = H.cell_center(nb)
    d = np.hypot(nx - cx[:, None], ny - cy[:, None])
    R = float(H.res_radius(res))
    assert np.allclose(d, np.sqrt(3.0) * R, rtol=1e-9)
    assert (H.hex_distance(np.repeat(keys, 6), nb.ravel()) == 1).all()


def test_hex_distance_metric():
    res = 4
    a = H.hex_cell(WX[:300], WY[:300], res)
    b = H.hex_cell(WX[300:600], WY[300:600], res)
    c = H.hex_cell(WX[600:900], WY[600:900], res)
    dab, dba = H.hex_distance(a, b), H.hex_distance(b, a)
    assert np.array_equal(dab, dba)
    assert (H.hex_distance(a, a) == 0).all()
    assert (H.hex_distance(a, c) <= dab + H.hex_distance(b, c)).all()


def test_aperture_is_seven():
    # enumerate a FULL disk of res-6 cells and count children per parent:
    # interior parents must hold exactly 7 on average (aperture 7)
    res = 6
    center = H.hex_cell(np.array([0.5]), np.array([0.5]), res)
    q, r, _ = H.unpack(center)
    offs = H.disk_offsets(24)
    keys = H.pack(q + offs[:, 0], r + offs[:, 1], np.full(len(offs), res))
    parents = H.parent(keys)
    uniq, counts = np.unique(parents, return_counts=True)
    # drop boundary parents (not fully covered by the enumerated disk)
    interior = counts[counts == counts.max()]
    assert counts.max() == 7
    # most covered parents are exactly 7-child
    assert (counts == 7).sum() >= 0.6 * len(uniq)


def test_parent_agreement_rate_is_h3_like():
    # H3's aperture-7 containment is approximate: a point near a child edge
    # can round to a different coarse cell than its child's parent. The
    # agreement rate must still be high (measured ~0.93).
    res = 6
    k = H.hex_cell(WX, WY, res)
    agree = (H.parent(k) == H.hex_cell(WX, WY, res - 1)).mean()
    assert agree >= 0.85


def test_rotation_is_h3_aperture_angle():
    assert abs(np.degrees(H.APERTURE_ROT) - 19.106605350869094) < 1e-9


def test_finality_bound_conservative():
    # the kNN bound: every point of every cell at hex distance > k is at
    # least min_dist_outside_disk(k) away from any point of the center cell
    res, k = 4, 2
    bound = H.min_dist_outside_disk(k, res)
    R = float(H.res_radius(res))
    center = H.hex_cell(np.array([0.5]), np.array([0.5]), res)
    q, r, _ = H.unpack(center)
    offs = H.ring_offsets(k + 1)
    ring = H.pack(q + offs[:, 0], r + offs[:, 1], np.full(len(offs), res))
    cx, cy = H.cell_center(center)
    rx, ry = H.cell_center(ring)
    min_center_d = np.hypot(rx - cx, ry - cy).min()
    assert min_center_d - 2 * R >= bound - 1e-12


def test_spark_column_function_matches_kernel(spark):
    import pandas as pd
    from pyspark.sql import functions as F
    from planetiler_spark.functions import geo as G

    pdf = pd.DataFrame({"wx": WX[:500], "wy": WY[:500]})
    out = (spark.createDataFrame(pdf)
           .withColumn("hk", G.hex_cell_of(F.col("wx"), F.col("wy"), F.lit(4)))
           .toPandas())
    expect = H.hex_cell(out["wx"].to_numpy(), out["wy"].to_numpy(), 4)
    assert np.array_equal(out["hk"].to_numpy(), expect)


def test_knn_hex_equals_bruteforce(spark):
    from planetiler_spark.plans.queries import knn_bruteforce, knn_hex

    brute = {tuple(r) for r in knn_bruteforce(spark, SF).collect()}
    hexed = {tuple(r) for r in knn_hex(spark, SF).collect()}
    assert hexed == brute
    assert len(brute) > 0
