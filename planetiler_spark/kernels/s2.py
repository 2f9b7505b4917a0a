"""S2 cell ids from scratch — vectorized numpy (no s2geometry dependency).

The north_star names "H3/S2 cells" as the discretized join keys; knn_grid
already implements the ring-expansion equi-join on square cells, and this
module supplies true spherical S2 cell ids for the same pattern: the public
s2geometry quad-tree construction (6 cube faces, quadratic ST projection,
level-30 leaf grid, Hilbert curve position, 64-bit id = face(3b) +
position(2*level bits) + trailing 1).

Public-spec constants (s2geometry docs / C++ reference implementation):
  - quadratic UV<->ST: st = sqrt(1+3u)/2 for u>=0 else 1-sqrt(1-3u)/2
  - Hilbert tables: kPosToIJ / kPosToOrientation with swap=1, invert=2;
    initial orientation of face f = (f & kSwapMask)
  - id layout: [face:3][curve position:2*30][1][zeros]

Verified WITHOUT the library (not in this container) by structural
invariants that pin the construction (tests/test_s2.py):
  - face cells: level-0 tokens are exactly "1","3","5","7","9","b"
  - inversion: cell_center -> same cell at every level
  - hierarchy: parent(child) == ancestor at every coarser level
  - curve continuity: consecutive positions at one level are edge/corner
    adjacent in (face,i,j) space
  - coverage: the 4^k cells of a face partition its (i,j) grid
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_SWAP = 1
_INVERT = 2

# canonical Hilbert sub-cell orderings (s2geometry kPosToIJ):
# kPosToIJ[orientation][position] = ij  (ij = i*2 + j of the sub-cell)
_POS_TO_IJ = np.array([
    [0, 1, 3, 2],   # canonical order
    [0, 2, 3, 1],   # axes swapped
    [3, 2, 0, 1],   # bits inverted
    [3, 1, 0, 2],   # swapped & inverted
], dtype=np.int64)
# orientation modifier picked up at each position
_POS_TO_ORIENTATION = np.array([_SWAP, 0, 0, _INVERT | _SWAP], dtype=np.int64)
# inverse: _IJ_TO_POS[orientation][ij] = position
_IJ_TO_POS = np.empty((4, 4), dtype=np.int64)
for _o in range(4):
    for _p in range(4):
        _IJ_TO_POS[_o, _POS_TO_IJ[_o, _p]] = _p


def lonlat_to_xyz(lon_deg, lat_deg):
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    cl = np.cos(lat)
    return cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)


def xyz_to_face_uv(x, y, z):
    """Largest-absolute-component face + gnomonic (u, v) on that face,
    matching s2geometry's face/axis conventions."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay,
                    np.where(ax >= az, 0, 2),
                    np.where(ay >= az, 1, 2))
    # negative major axis -> opposite face (face + 3)
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face).astype(np.int64)
    u = np.empty_like(np.asarray(x, dtype=np.float64))
    v = np.empty_like(u)
    # s2 face axes: face 0: u=y/x,  v=z/x;   face 1: u=-x/y, v=z/y
    #               face 2: u=-x/z, v=-y/z;  face 3: u=z/x,  v=y/x (x<0)
    #               face 4: u=z/y,  v=-x/y (y<0); face 5: u=-y/z, v=-x/z (z<0)
    f = face
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [f == 0, f == 1, f == 2, f == 3, f == 4, f == 5],
            [y / x, -x / y, -x / z, z / x, z / y, -y / z])
        v = np.select(
            [f == 0, f == 1, f == 2, f == 3, f == 4, f == 5],
            [z / x, z / y, -y / z, y / x, -x / y, -x / z])
    return face, u, v


def uv_to_st(u):
    """Quadratic projection (the s2geometry default S2_QUADRATIC_PROJECTION)."""
    u = np.asarray(u, dtype=np.float64)
    with np.errstate(invalid="ignore"):  # the unselected branch may sqrt(<0)
        return np.where(u >= 0,
                        0.5 * np.sqrt(1.0 + 3.0 * u),
                        1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def st_to_uv(s):
    s = np.asarray(s, dtype=np.float64)
    return np.where(s >= 0.5,
                    (1.0 / 3.0) * (4.0 * s * s - 1.0),
                    (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)))


def st_to_ij(s):
    """ST in [0,1] -> leaf-grid coordinate in [0, 2^30)."""
    return np.clip((np.asarray(s) * (1 << MAX_LEVEL)).astype(np.int64),
                   0, (1 << MAX_LEVEL) - 1)


def face_ij_to_pos(face, i, j, level: int = MAX_LEVEL):
    """Hilbert curve position of (i, j) within `face`, using the top `level`
    bits of i/j — vectorized over all inputs, looping only the 30 levels."""
    face = np.asarray(face, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    orient = face & _SWAP
    pos = np.zeros_like(i)
    for k in range(MAX_LEVEL - 1, MAX_LEVEL - 1 - level, -1):
        ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        p = _IJ_TO_POS[orient, ij]
        pos = (pos << 2) | p
        orient = orient ^ _POS_TO_ORIENTATION[p]
    return pos


def pos_to_face_ij(face, pos, level: int = MAX_LEVEL):
    """Inverse of face_ij_to_pos: curve position -> (i, j) at leaf resolution
    (sub-`level` bits zero)."""
    face = np.asarray(face, dtype=np.int64)
    pos = np.asarray(pos, dtype=np.int64)
    orient = face & _SWAP
    i = np.zeros_like(pos)
    j = np.zeros_like(pos)
    for k in range(level):
        p = (pos >> (2 * (level - 1 - k))) & 3
        ij = _POS_TO_IJ[orient, p]
        i = (i << 1) | (ij >> 1)
        j = (j << 1) | (ij & 1)
        orient = orient ^ _POS_TO_ORIENTATION[p]
    shift = MAX_LEVEL - level
    return i << shift, j << shift


def cell_id(lon_deg, lat_deg, level: int = MAX_LEVEL) -> np.ndarray:
    """lon/lat arrays -> uint64 S2 cell ids at `level`
    ([face:3][pos:2*level][1][0...])."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    x, y, z = lonlat_to_xyz(lon_deg, lat_deg)
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))
    pos = face_ij_to_pos(face, i, j, level)
    lsb_shift = 2 * (MAX_LEVEL - level)
    raw = (face.astype(np.uint64) << np.uint64(61)) \
        | (pos.astype(np.uint64) << np.uint64(lsb_shift + 1)) \
        | (np.uint64(1) << np.uint64(lsb_shift))
    return raw


def cell_level(ids) -> np.ndarray:
    """Level of each id (from the trailing set bit). lsb is an exact power of
    two <= 2^60, so float64 log2 is exact."""
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = ids & (~ids + np.uint64(1))
    nz = np.round(np.log2(lsb.astype(np.float64))).astype(np.int64)
    return MAX_LEVEL - nz // 2


def parent(ids, level: int) -> np.ndarray:
    """Ancestor of each id at a coarser `level`: clear position bits at and
    below the new lsb, then set the new lsb."""
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (ids & ~(lsb + lsb - np.uint64(1))) | lsb


def face_uv_to_xyz(face, u, v):
    """Canonical s2geometry face axes (faceUVtoXYZ): the exact inverse of
    xyz_to_face_uv's per-face u/v definitions."""
    face = np.asarray(face, dtype=np.int64)
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    one = np.ones_like(u)
    sel = [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5]
    x = np.select(sel, [one, -u, -u, -one, v, v])
    y = np.select(sel, [u, one, -v, -v, -one, u])
    z = np.select(sel, [v, v, one, -u, -u, -one])
    return x, y, z


def cell_center(ids):
    """(lon, lat) of each cell's center (midpoint of its (i, j) extent)."""
    ids = np.asarray(ids, dtype=np.uint64)
    levels = cell_level(ids)
    if len(ids) and not np.all(levels == levels[0]):
        raise ValueError("cell_center expects uniform-level ids")
    level = int(levels[0]) if len(ids) else MAX_LEVEL
    face = (ids >> np.uint64(61)).astype(np.int64)
    pos = ((ids >> np.uint64(2 * (MAX_LEVEL - level) + 1))
           & np.uint64((1 << (2 * level)) - 1 if level else 0)).astype(np.int64)
    i, j = pos_to_face_ij(face, pos, level)
    half = (1 << (MAX_LEVEL - level)) // 2
    s = (i + (half if half else 0.5)) / float(1 << MAX_LEVEL)
    t = (j + (half if half else 0.5)) / float(1 << MAX_LEVEL)
    x, y, z = face_uv_to_xyz(face, st_to_uv(s), st_to_uv(t))
    lon = np.degrees(np.arctan2(y, x))
    lat = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
    return lon, lat


def token(ids) -> list[str]:
    """Canonical S2 token: hex of the id with trailing zeros stripped."""
    out = []
    for v in np.asarray(ids, dtype=np.uint64):
        h = f"{int(v):016x}".rstrip("0")
        out.append(h if h else "X")
    return out
