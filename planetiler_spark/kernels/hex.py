"""Hexagonal cell grid from scratch — the H3-analog join key (vectorized numpy).

The north_star names "H3/S2 cells" as discretized join keys and "kNN answered
by H3 ring-expansion joins". kernels/s2.py supplies the true spherical S2
quad-tree; this module supplies the hexagonal side: a planar APERTURE-7
ROTATED hex hierarchy over world-mercator [0,1]^2 — the same construction H3
uses on each icosahedron face (uber's public H3 docs: each finer resolution
scales the lattice by sqrt(7) and rotates it by arctan(sqrt(3)/5) ~= 19.1066
degrees so that 7 fine cells nest approximately in each coarse cell), minus
the icosahedral gnomonic faces (this engine's world plane is the mercator
square, matching every other operator's coordinate system).

Public hex-grid math (axial/cube coordinates, cube rounding, ring/disk
enumeration) follows the standard public formulation (e.g. the Red Blob
Games hex reference, and H3's own documentation):

  pointy-top axial:  q = (sqrt(3)/3 * x - 1/3 * y) / R,  r = (2/3 * y) / R
  center:            x = R * sqrt(3) * (q + r/2),        y = R * 3/2 * r
  hex distance:      (|dq| + |dr| + |dq + dr|) / 2
  disk(k) size:      3k(k+1) + 1,   ring(k) size: 6k

Key packing (int64): [res:6][q + 2^27 : 28][r + 2^27 : 28] — resolutions
0..19 keep |q|,|r| < 2^27 over the world square (R_19 ~ 4.7e-9 world units
~ 1.9 cm at the equator).

Scale shape: cell assignment is one fused numpy pass per Arrow batch
(functions/geo.hex_cell_of); ring-expansion kNN joins replicate the SMALL
side into disk(k) neighbor cells (3k(k+1)+1 copies — 25% fewer than the
square grid's (2k+1)^2 at equal radius) and equi-join on the packed key, so
Catalyst plans a plain (broadcast) hash join. Distance-bound finality: a
point in cell C is >= (3/2)*h*R - 2R from any point in a cell at hex
distance h (ring-h centers form a hexagon with inradius (3/2)*h*R; points
deviate <= R from their centers).

Reference analog: the reference's PointIndex (PointIndex.java:48-106) is the
square-grid version of this ring expansion; there is no hex analog in the
reference — this is graft-axis surface named by the brief.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 19
R0 = 0.5                                  # res-0 circumradius (world units)
APERTURE_ROT = np.arctan2(np.sqrt(3.0), 5.0)   # 19.106605 degrees
SQRT7 = np.sqrt(7.0)
_OFF = 1 << 27
_MASK = (1 << 28) - 1


def res_radius(res) -> np.ndarray:
    """Circumradius of a res-`res` cell in world units."""
    return R0 / SQRT7 ** np.asarray(res, dtype=np.float64)


def _frame(res):
    """(cos, sin, R) of the res-local rotated frame."""
    res = np.asarray(res, dtype=np.float64)
    phi = res * APERTURE_ROT
    return np.cos(phi), np.sin(phi), R0 / SQRT7 ** res


def _cube_round(qf: np.ndarray, rf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Fractional axial -> nearest hex (cube rounding, vectorized)."""
    sf = -qf - rf
    q = np.rint(qf)
    r = np.rint(rf)
    s = np.rint(sf)
    dq = np.abs(q - qf)
    dr = np.abs(r - rf)
    ds = np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


def hex_axial(wx, wy, res) -> tuple[np.ndarray, np.ndarray]:
    """World (wx, wy) in [0,1]^2 -> integer axial (q, r) at resolution res."""
    wx = np.asarray(wx, dtype=np.float64) - 0.5
    wy = np.asarray(wy, dtype=np.float64) - 0.5
    c, s, radius = _frame(res)
    x = (c * wx + s * wy) / radius      # rotate by -phi into the res frame
    y = (-s * wx + c * wy) / radius
    qf = (np.sqrt(3.0) / 3.0) * x - y / 3.0
    rf = (2.0 / 3.0) * y
    return _cube_round(qf, rf)


def pack(q, r, res) -> np.ndarray:
    """Axial (q, r) + res -> packed int64 cell key."""
    q = np.asarray(q, dtype=np.int64)
    r = np.asarray(r, dtype=np.int64)
    res = np.asarray(res, dtype=np.int64)
    if not ((np.abs(q) < _OFF).all() and (np.abs(r) < _OFF).all()):
        raise ValueError("axial coordinate out of 28-bit packing range")
    return (res << 56) | ((q + _OFF) << 28) | (r + _OFF)


def unpack(key) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Packed key -> (q, r, res)."""
    key = np.asarray(key, dtype=np.int64)
    res = key >> 56
    q = ((key >> 28) & _MASK) - _OFF
    r = (key & _MASK) - _OFF
    return q, r, res


def hex_cell(wx, wy, res) -> np.ndarray:
    """World point -> packed hex cell key at resolution res (0..19)."""
    res_a = np.asarray(res, dtype=np.int64)
    if (res_a < 0).any() or (res_a > MAX_RES).any():
        raise ValueError(f"hex resolution out of range 0..{MAX_RES}")
    q, r = hex_axial(wx, wy, res)
    return pack(q, r, np.broadcast_to(res_a, q.shape))


def cell_center(key) -> tuple[np.ndarray, np.ndarray]:
    """Packed key -> world (wx, wy) of the cell center."""
    q, r, res = unpack(key)
    c, s, radius = _frame(res)
    x = radius * np.sqrt(3.0) * (q + r / 2.0)
    y = radius * 1.5 * r
    return (c * x - s * y) + 0.5, (s * x + c * y) + 0.5   # rotate by +phi


def hex_distance(k1, k2) -> np.ndarray:
    """Hex (axial) distance between two same-resolution cell keys."""
    q1, r1, res1 = unpack(k1)
    q2, r2, res2 = unpack(k2)
    if np.any(res1 != res2):
        raise ValueError("hex_distance requires equal resolutions")
    dq = q1 - q2
    dr = r1 - r2
    return (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2


def disk_offsets(k: int) -> np.ndarray:
    """(dq, dr) of every cell with hex distance <= k: shape (3k(k+1)+1, 2)."""
    rng = np.arange(-k, k + 1, dtype=np.int64)
    dq, dr = np.meshgrid(rng, rng, indexing="ij")
    dq, dr = dq.ravel(), dr.ravel()
    keep = (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2 <= k
    return np.stack([dq[keep], dr[keep]], axis=1)


def ring_offsets(k: int) -> np.ndarray:
    """(dq, dr) of the 6k cells at hex distance exactly k (k >= 1)."""
    offs = disk_offsets(k)
    d = (np.abs(offs[:, 0]) + np.abs(offs[:, 1]) + np.abs(offs[:, 0] + offs[:, 1])) // 2
    return offs[d == k]


def neighbors(key) -> np.ndarray:
    """The 6 adjacent cell keys of each input key: shape (n, 6)."""
    q, r, res = unpack(key)
    offs = ring_offsets(1)
    return pack(q[..., None] + offs[:, 0], r[..., None] + offs[:, 1],
                res[..., None] * np.ones(6, dtype=np.int64))


def parent(key) -> np.ndarray:
    """Coarser-by-one cell containing each cell's CENTER — H3's approximate
    aperture-7 containment (a child near a coarse edge can overhang; ~7
    children nest per parent on average, exactly like H3)."""
    q, r, res = unpack(key)
    if (res < 1).any():
        raise ValueError("res-0 cells have no parent")
    wx, wy = cell_center(key)
    return hex_cell(wx, wy, res - 1)


def min_dist_outside_disk(k: int, res: int) -> float:
    """Lower bound on the world-space distance from any point in a cell to any
    point in a cell at hex distance > k (the kNN finality bound): ring-(k+1)
    centers are >= (3/2)(k+1)R away, and each point is within R of its own
    center."""
    radius = float(res_radius(res))
    return max(0.0, (1.5 * (k + 1) - 2.0) * radius)
