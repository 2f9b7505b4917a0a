"""Vectorized tile math — bit-faithful to the reference's scalar kernels.

Reference lineage (all under /root/reference/planetiler-core/src/main/java/com/onthegomap/planetiler/):
  - world web-mercator projection: geo/GeoUtils.java:164-198 (getWorldX/getWorldY, clamps at
    MAX_LAT=getWorldLat(-0.1) / MIN_LAT=getWorldLat(1.1))
  - flat location packing:         geo/GeoUtils.java:204-236 (encodeFlatLocation, decodeWorldX/Y)
  - TMS tile ids:                  geo/TileCoord.java:31-44 (ZOOM_START_INDEX), :86-90 (encode),
                                   :163-175 (tmsPositionToXY / tmsXYToPosition), :77-82 (aroundLngLat)
  - Hilbert curve:                 util/Hilbert.java:53-127 (public-domain algorithm by
                                   github.com/rawrunprotected/hilbert_curves)
  - 64-bit sort key:               collection/FeatureGroup.java:56-59, :168-196
  - label grid id:                 geo/GeoUtils.java:401-427 (wrapDouble, longPair, labelGridId)
  - zigzag codec:                  VectorTile.java:202-210
  - haversine:                     geo/GeoUtils.java:636-662 (metersBetween)

All functions accept & return numpy arrays (broadcasting scalars fine) and use
int64/uint32 arithmetic that matches Java semantics exactly.
"""

from __future__ import annotations

import numpy as np

MAX_MAXZOOM = 16  # config/PlanetilerConfig.java:80

# --- zoom start index: ZOOM_START_INDEX[z] = sum_{i<z} 4^i (TileCoord.java:31-44) ---
ZOOM_START_INDEX = np.zeros(MAX_MAXZOOM + 1, dtype=np.int64)
_idx = 0
for _z in range(MAX_MAXZOOM + 1):
    ZOOM_START_INDEX[_z] = _idx
    _idx += 1 << (2 * _z)

SORT_KEY_BITS = 22
SORT_KEY_MAX = (1 << (SORT_KEY_BITS - 1)) - 1
SORT_KEY_MIN = -(1 << (SORT_KEY_BITS - 1))
_SORT_KEY_MASK = (1 << SORT_KEY_BITS) - 1
TILE_ID_BITS = 33

_HALF_QUANTIZED_WORLD_SIZE = float(2.0**31 / 2)  # GeoUtils.java QUANTIZED_WORLD_SIZE/2 = 2^30
_LOWER_32 = np.int64((1 << 32) - 1)

EARTH_RADIUS_METERS = 6371008.8  # GeoUtils.java AVERAGE_EARTH_RADIUS_METERS
WORLD_CIRCUMFERENCE_METERS = 40075016.686


# ---------------------------------------------------------------------------
# world mercator projection (GeoUtils.java:164-198)
# ---------------------------------------------------------------------------

def get_world_lon(x):
    return np.asarray(x, dtype=np.float64) * 360.0 - 180.0


def get_world_lat(y):
    n = np.pi - 2.0 * np.pi * np.asarray(y, dtype=np.float64)
    return np.degrees(np.arctan(0.5 * (np.exp(n) - np.exp(-n))))


# clamps: MAX_LAT = getWorldLat(-0.1), MIN_LAT = getWorldLat(1.1) (GeoUtils.java:100-101)
MAX_LAT = float(get_world_lat(-0.1))
MIN_LAT = float(get_world_lat(1.1))


def get_world_x(longitude):
    return (np.asarray(longitude, dtype=np.float64) + 180.0) / 360.0


def get_world_y(latitude):
    lat = np.asarray(latitude, dtype=np.float64)
    sin = np.sin(np.radians(np.clip(lat, MIN_LAT, MAX_LAT)))
    y = 0.5 - 0.25 * np.log((1.0 + sin) / (1.0 - sin)) / np.pi
    y = np.where(lat <= MIN_LAT, 1.1, y)
    y = np.where(lat >= MAX_LAT, -0.1, y)
    return y


def encode_flat_location(lon, lat):
    """Pack lon/lat into one int64 at 31-bit precision (GeoUtils.java:204-213)."""
    wx = get_world_x(lon) + 1.0
    wy = get_world_y(lat) + 1.0
    x = np.trunc(wx * _HALF_QUANTIZED_WORLD_SIZE).astype(np.int64)
    y = np.trunc(wy * _HALF_QUANTIZED_WORLD_SIZE).astype(np.int64)
    return (x << np.int64(32)) | (y & _LOWER_32)


def decode_world_x(encoded):
    e = np.asarray(encoded, dtype=np.int64)
    return (e.astype(np.uint64) >> np.uint64(32)).astype(np.float64) / _HALF_QUANTIZED_WORLD_SIZE - 1.0


def decode_world_y(encoded):
    e = np.asarray(encoded, dtype=np.int64)
    return (e & _LOWER_32).astype(np.float64) / _HALF_QUANTIZED_WORLD_SIZE - 1.0


# ---------------------------------------------------------------------------
# TMS tile ids (TileCoord.java)
# ---------------------------------------------------------------------------

def tms_xy_to_position(z, x, y):
    """TileCoord.tmsXYToPosition:172-175 — x asc, y desc within zoom."""
    z = np.asarray(z, dtype=np.int64)
    dim = np.int64(1) << z
    return np.asarray(x, dtype=np.int64) * dim + (dim - 1 - np.asarray(y, dtype=np.int64))


def tms_position_to_xy(z, pos):
    """TileCoord.tmsPositionToXY:163-170; returns (x, y)."""
    z = np.asarray(z, dtype=np.int64)
    pos = np.asarray(pos, dtype=np.int64)
    dim = np.int64(1) << z
    x = np.where(z == 0, 0, pos // np.maximum(dim, 1))
    y = np.where(z == 0, 0, dim - 1 - (pos % np.maximum(dim, 1)))
    return x.astype(np.int64), y.astype(np.int64)


def tile_encode(x, y, z):
    """TMS-ordered global tile id: TileCoord.encode:86-88."""
    z = np.asarray(z, dtype=np.int64)
    return ZOOM_START_INDEX[z] + tms_xy_to_position(z, x, y)


def tile_decode(encoded):
    """TileCoord.decode:63-67; returns (x, y, z)."""
    e = np.asarray(encoded, dtype=np.int64)
    z = (np.searchsorted(ZOOM_START_INDEX, e, side="right") - 1).astype(np.int64)
    x, y = tms_position_to_xy(z, e - ZOOM_START_INDEX[z])
    return x, y, z


def tile_around_lnglat(lng, lat, zoom):
    """TileCoord.aroundLngLat:77-82 — (x, y) tile containing a lon/lat at zoom."""
    zoom = np.asarray(zoom, dtype=np.int64)
    factor = (np.int64(1) << zoom).astype(np.float64)
    x = np.floor(get_world_x(lng) * factor).astype(np.int64)
    y = np.floor(get_world_y(lat) * factor).astype(np.int64)
    return x, y


def tile_of_world(world_x, world_y, zoom):
    """Tile containing a world-mercator coordinate at zoom (same floor semantics)."""
    zoom = np.asarray(zoom, dtype=np.int64)
    factor = (np.int64(1) << zoom).astype(np.float64)
    x = np.floor(np.asarray(world_x, dtype=np.float64) * factor).astype(np.int64)
    y = np.floor(np.asarray(world_y, dtype=np.float64) * factor).astype(np.int64)
    return x, y


def tile_bounds_world(x, y, z):
    """Tile envelope in world coords: (minx, miny, maxx, maxy). TileCoord.bounds:181-189."""
    z = np.asarray(z, dtype=np.int64)
    w = (np.int64(1) << z).astype(np.float64)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    return x / w, y / w, (x + 1) / w, (y + 1) / w


# ---------------------------------------------------------------------------
# Hilbert curve (util/Hilbert.java:53-127, public-domain algorithm)
# ---------------------------------------------------------------------------

_U = np.uint32


def _deinterleave(tx):
    tx = tx & _U(0x55555555)
    tx = (tx | (tx >> _U(1))) & _U(0x33333333)
    tx = (tx | (tx >> _U(2))) & _U(0x0F0F0F0F)
    tx = (tx | (tx >> _U(4))) & _U(0x00FF00FF)
    tx = (tx | (tx >> _U(8))) & _U(0x0000FFFF)
    return tx


def _interleave(tx):
    tx = (tx | (tx << _U(8))) & _U(0x00FF00FF)
    tx = (tx | (tx << _U(4))) & _U(0x0F0F0F0F)
    tx = (tx | (tx << _U(2))) & _U(0x33333333)
    tx = (tx | (tx << _U(1))) & _U(0x55555555)
    return tx


def _prefix_scan(tx):
    tx = (tx >> _U(8)) ^ tx
    tx = (tx >> _U(4)) ^ tx
    tx = (tx >> _U(2)) ^ tx
    tx = (tx >> _U(1)) ^ tx
    return tx


def hilbert_xy_to_index(level: int, x, y):
    """util/Hilbert.java:76-127 — hilbert position of (x,y) at level, returns int64 >= 0."""
    if level == 0:
        return np.zeros_like(np.asarray(x, dtype=np.int64))
    x = (np.asarray(x, dtype=np.int64).astype(_U)) << _U(16 - level)
    y = (np.asarray(y, dtype=np.int64).astype(_U)) << _U(16 - level)
    M = _U(0xFFFF)

    a1 = x ^ y
    b1 = M ^ a1
    c1 = M ^ (x | y)
    d1 = x & (y ^ M)

    hA = a1 | (b1 >> _U(1))
    hB = (a1 >> _U(1)) ^ a1
    hC = ((c1 >> _U(1)) ^ (b1 & (d1 >> _U(1)))) ^ c1
    hD = ((a1 & (c1 >> _U(1))) ^ (d1 >> _U(1))) ^ d1

    a2, b2, c2, d2 = hA, hB, hC, hD
    hA = (a2 & (a2 >> _U(2))) ^ (b2 & (b2 >> _U(2)))
    hB = (a2 & (b2 >> _U(2))) ^ (b2 & ((a2 ^ b2) >> _U(2)))
    hC = c2 ^ ((a2 & (c2 >> _U(2))) ^ (b2 & (d2 >> _U(2))))
    hD = d2 ^ ((b2 & (c2 >> _U(2))) ^ ((a2 ^ b2) & (d2 >> _U(2))))

    a3, b3, c3, d3 = hA, hB, hC, hD
    hA = (a3 & (a3 >> _U(4))) ^ (b3 & (b3 >> _U(4)))
    hB = (a3 & (b3 >> _U(4))) ^ (b3 & ((a3 ^ b3) >> _U(4)))
    hC = c3 ^ ((a3 & (c3 >> _U(4))) ^ (b3 & (d3 >> _U(4))))
    hD = d3 ^ ((b3 & (c3 >> _U(4))) ^ ((a3 ^ b3) & (d3 >> _U(4))))

    a4, b4, c4, d4 = hA, hB, hC, hD
    hC = c4 ^ ((a4 & (c4 >> _U(8))) ^ (b4 & (d4 >> _U(8))))
    hD = d4 ^ ((b4 & (c4 >> _U(8))) ^ ((a4 ^ b4) & (d4 >> _U(8))))

    a = hC ^ (hC >> _U(1))
    b = hD ^ (hD >> _U(1))

    i0 = x ^ y
    i1 = b | (M ^ (i0 | a))

    combined = ((_interleave(i1).astype(np.uint64) << np.uint64(1)) |
                _interleave(i0).astype(np.uint64)) & np.uint64(0xFFFFFFFF)
    shift = np.uint64(32 - 2 * level)
    return (combined >> shift).astype(np.int64)


def hilbert_position_to_xy(level: int, pos):
    """util/Hilbert.java:53-70 — (x, y) of hilbert position at level."""
    pos = np.asarray(pos, dtype=np.int64)
    if level == 0:
        zero = np.zeros_like(pos)
        return zero, zero
    ipos = ((pos.astype(np.uint64) << np.uint64(32 - 2 * level)) & np.uint64(0xFFFFFFFF)).astype(_U)
    M = _U(0xFFFF)
    i0 = _deinterleave(ipos)
    i1 = _deinterleave(ipos >> _U(1))
    t0 = (i0 | i1) ^ M
    t1 = i0 & i1
    prefix_t0 = _prefix_scan(t0)
    prefix_t1 = _prefix_scan(t1)
    a = ((i0 ^ M) & prefix_t1) | (i0 & prefix_t0)
    rx = ((a ^ i1) & M) >> _U(16 - level)
    ry = ((a ^ i0 ^ i1) & M) >> _U(16 - level)
    return rx.astype(np.int64), ry.astype(np.int64)


def hilbert_encode(x, y, z):
    """Global hilbert tile id: TileCoord.hilbertEncoded:158-161."""
    z_arr = np.asarray(z, dtype=np.int64)
    if z_arr.ndim == 0:
        return ZOOM_START_INDEX[int(z_arr)] + hilbert_xy_to_index(int(z_arr), x, y)
    out = np.zeros(z_arr.shape, dtype=np.int64)
    for level in np.unique(z_arr):
        m = z_arr == level
        out[m] = ZOOM_START_INDEX[level] + hilbert_xy_to_index(int(level), np.asarray(x)[m], np.asarray(y)[m])
    return out


def hilbert_decode(encoded):
    """TileCoord.hilbertDecode:70-74; returns (x, y, z)."""
    e = np.asarray(encoded, dtype=np.int64)
    z = (np.searchsorted(ZOOM_START_INDEX, e, side="right") - 1).astype(np.int64)
    x = np.zeros_like(e)
    y = np.zeros_like(e)
    for level in np.unique(z):
        m = z == level
        x[m], y[m] = hilbert_position_to_xy(int(level), e[m] - ZOOM_START_INDEX[level])
    return x, y, z


# ---------------------------------------------------------------------------
# 64-bit sort key (collection/FeatureGroup.java:168-196)
# ---------------------------------------------------------------------------

def encode_sort_key(tile, layer, sort_key, has_group):
    """[tile:33][layer:8][sortKey:22][hasGroup:1] — FeatureGroup.encodeKey:176-180."""
    tile = np.asarray(tile, dtype=np.int64)
    layer = np.asarray(layer, dtype=np.int64) & np.int64(0xFF)
    sk = (np.asarray(sort_key, dtype=np.int64) - np.int64(SORT_KEY_MIN)) & np.int64(_SORT_KEY_MASK)
    hg = np.asarray(has_group).astype(np.int64) & np.int64(1)
    return (tile << np.int64(64 - TILE_ID_BITS)) | (layer << np.int64(SORT_KEY_BITS + 1)) | (sk << np.int64(1)) | hg


def extract_tile_from_key(key):
    return (np.asarray(key, dtype=np.int64).astype(np.uint64) >> np.uint64(64 - TILE_ID_BITS)).astype(np.int64)


def extract_layer_from_key(key):
    return (np.asarray(key, dtype=np.int64).astype(np.uint64) >> np.uint64(SORT_KEY_BITS + 1)).astype(np.int64) & np.int64(0xFF)


def extract_sort_key_from_key(key):
    k = np.asarray(key, dtype=np.int64)
    return ((k >> np.int64(1)) & np.int64(_SORT_KEY_MASK)) + np.int64(SORT_KEY_MIN)


def extract_has_group_from_key(key):
    return (np.asarray(key, dtype=np.int64) & np.int64(1)) == 1


# ---------------------------------------------------------------------------
# label grid id (GeoUtils.java:401-427)
# ---------------------------------------------------------------------------

def label_grid_id(tiles_at_zoom, label_grid_tile_size, x, y):
    """GeoUtils.labelGridId:422-427 over scaled-to-zoom coordinates."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    wrapped = np.mod(x, float(tiles_at_zoom))  # numpy mod is already non-negative for positive divisor
    gx = np.floor(wrapped / label_grid_tile_size).astype(np.int64)
    gy = np.floor(y / label_grid_tile_size).astype(np.int64)
    return (gx << np.int64(32)) | (gy & _LOWER_32)


# ---------------------------------------------------------------------------
# zigzag codec (VectorTile.java:202-210)
# ---------------------------------------------------------------------------

def zigzag_encode(n):
    n = np.asarray(n, dtype=np.int32)
    return ((n << np.int32(1)) ^ (n >> np.int32(31))).astype(np.int32)


def zigzag_decode(n):
    n = np.asarray(n, dtype=np.int32)
    return ((n.astype(np.uint32) >> np.uint32(1)).astype(np.int32)) ^ (-(n & np.int32(1)))


# ---------------------------------------------------------------------------
# distances (GeoUtils.java:636-662) + misc scalar math
# ---------------------------------------------------------------------------

def meters_between(lon1, lat1, lon2, lat2):
    """Haversine distance in meters (GeoUtils.metersBetween:636)."""
    p1 = np.radians(np.asarray(lat1, dtype=np.float64))
    p2 = np.radians(np.asarray(lat2, dtype=np.float64))
    dp = p2 - p1
    dl = np.radians(np.asarray(lon2, dtype=np.float64) - np.asarray(lon1, dtype=np.float64))
    a = np.sin(dp / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
    return 2 * EARTH_RADIUS_METERS * np.arcsin(np.sqrt(a))


def meters_per_pixel_at_equator(zoom):
    return WORLD_CIRCUMFERENCE_METERS / np.power(2.0, np.asarray(zoom, dtype=np.float64) + 8.0)


def min_zoom_for_pixel_size(world_geometry_size, min_pixel_size, max_zoom=14):
    """GeoUtils.minZoomForPixelSize:606 — lowest zoom where size >= min pixels."""
    size = np.asarray(world_geometry_size, dtype=np.float64)
    z = np.ceil(np.log2(min_pixel_size / (size * 256.0)))
    return np.clip(z, 0, max_zoom).astype(np.int64)
